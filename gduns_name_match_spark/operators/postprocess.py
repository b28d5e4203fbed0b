"""Post-processing operators (reference entry point 3).

* ``collapse_multi_parent`` — spnv_match_file2.py:55-123: rows sharing a
  group marker (TEMP1) collapse to ONE row with GDUN=-45000, names
  string-aggregated across the group, DUNS_COUNT summed, identity columns
  taken from the first row.
* ``explode_duns_details`` — duns_table.py:29-75: rows with duns_count>1
  explode LIST_OF_DUNS into one detail row per DUNS.
* ``distinct_final`` — spnv_match_file.py:33-64: SELECT DISTINCT promotion
  of unresolved-flag rows into the final table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gduns_name_match_spark.operators.resolve import GDUN_MULTI_PARENT


def collapse_multi_parent(
    df: DataFrame,
    group_col: str,
    name_cols: tuple[str, ...] = ("gdun_name", "parent_name"),
    sum_col: str = "duns_count",
    first_cols: tuple[str, ...] = ("mention_id", "raw_name"),
) -> DataFrame:
    """Collapse multi-parent groups to one -45000 row each; singleton groups
    pass through unchanged (the reference only rewrites TEMP2='Y' groups)."""
    sizes = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    with_n = df.join(sizes, group_col)
    single = with_n.filter(F.col("_n") == 1).drop("_n")

    aggs = [F.first(c, ignorenulls=True).alias(c) for c in first_cols]
    aggs += [
        F.concat_ws(",", F.sort_array(F.collect_list(c))).alias(c) for c in name_cols
    ]
    aggs += [F.sum(sum_col).alias(sum_col)]
    collapsed = (
        with_n.filter(F.col("_n") > 1)
        .groupBy(group_col)
        .agg(*aggs)
        .withColumn("gdun", F.lit(GDUN_MULTI_PARENT).cast("long"))
        .withColumn("match_status", F.lit("multi_parent_collapsed"))
    )
    single = single.withColumn("match_status", F.lit("single_parent")).withColumn(
        "gdun", F.col("gdun") if "gdun" in df.columns else F.lit(None).cast("long")
    )
    return collapsed.unionByName(single, allowMissingColumns=True)


def explode_duns_details(df: DataFrame) -> DataFrame:
    """One row per DUNS from the capped list, only for multi-DUNS rows
    (duns_table.py:29 filter duns_count>1; :36-53 split/clean/cast)."""
    multi = df.filter(F.size("list_of_duns") > 1)
    return multi.select(
        "mention_id",
        F.explode("list_of_duns").alias("fj_duns"),
    ).withColumn("fj_duns", F.col("fj_duns").cast("long"))


def distinct_final(df: DataFrame, status_col: str = "match_status") -> DataFrame:
    """SELECT DISTINCT promotion of pending rows (spnv_match_file.py:33-64)."""
    return df.distinct()
