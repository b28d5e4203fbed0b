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

    # 'first row' is frame order in the reference (spnv_match_file2.py:58-71);
    # here the identity columns come from the group's MINIMUM row under
    # (first_cols) ordering — a deterministic row pick under any partitioning,
    # same treatment as collapse_spnv_groups' sorted-struct order (an
    # unordered F.first() was partition-order-dependent, VERDICT r04 #3)
    _idrow = F.min(F.struct(*[F.col(c).alias(c) for c in first_cols]))
    aggs = [_idrow.getField(c).alias(c) for c in first_cols]
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


# spnv_match_FILE insert column order (spnv_match_file2.py:133-146)
SPNV_MATCH_FILE_COLUMNS = [
    "PERM_ID", "SEC_PARTY_CMN_NM", "SEC_PARTY_COMPRESS_CMN_NM",
    "SEC_PARTY_ADDR_CITY_NM", "SEC_PARTY_ADDR_STATE_CD", "FLININGS_COUNT",
    "WK_DUNS", "WK_GDUN_NAME", "WK_GDUN", "COMPRESSES_SEC_PARTY_NAME",
    "COMPRESSES_SEC_PARTY_CITY", "COMPRESSES_SEC_PARTY_STATE", "FJ_GDUN",
    "FJ_GDUN_NAME", "MATCH_IND", "FJ_DUN_NAME", "FJ_DUNS", "DUNS_COUNT",
    "FDIC_PARENT", "SOURCE", "DETAIL_INFO", "COMMENTS",
    "CREDIT_UNION_PARENT", "LIST_OF_DUNS", "TEMP1",
]


def collapse_spnv_groups(view: DataFrame) -> DataFrame:
    """The reference's multi-parent collapse (spnv_match_file2.py:55-131),
    set-at-a-time: SPNV_MATCH_RAW rows WHERE TEMP2='Y', grouped by TEMP1,
    collapse to ONE spnv_match_FILE row each with

    * FJ_GDUN = -45000, FJ_DUNS = -1, MATCH_IND/TEMP1 = NULL;
    * FJ_GDUN_NAME = 'multiple fdic parents gduns: ' + ',<name>' per row
      (:69-76), FJ_DUN_NAME the same over FJ_DUN_NAME (:81-88), COMMENTS the
      same over the FJ_GDUN ids (:104-110);
    * DUNS_COUNT = sum of the group's DUNS_COUNTs (:90-95);
    * FDIC_PARENT / SOURCE = ',<v>' concatenations (:96-103);
    * LIST_OF_DUNS = plain concatenation of the already-comma-led strings
      (:111-116); identity columns from the group's first row (:58-71).

    'First row' is frame order in the reference; here the deterministic
    minimum of (FJ_GDUN, FJ_GDUN_NAME) orders both the identity pick and
    every concatenation, so the operator is stable under any partitioning
    (and a DuckDB twin can replicate it with ORDER BY)."""
    y = view.filter(F.col("TEMP2") == "Y")
    ordk = F.struct(
        F.col("FJ_GDUN").alias("g"), F.col("FJ_GDUN_NAME").alias("n")
    )
    row = F.struct(
        ordk.alias("_k"),
        *[
            F.col(c).alias(c)
            for c in view.columns
            if c not in ("TEMP1", "TEMP2")
        ],
    )
    agg = y.groupBy("TEMP1").agg(
        F.sort_array(F.collect_list(row)).alias("_rows"),
        F.sum("DUNS_COUNT").alias("_duns_sum"),
    )
    first = F.get("_rows", 0)

    def cat(col, prefix=""):
        # ','-led concatenation in group order: xe=xe+','+str(v)
        return F.concat(
            F.lit(prefix),
            F.array_join(
                F.transform(
                    "_rows", lambda r: F.concat(F.lit(","), r[col].cast("string"))
                ),
                "",
            ),
        )

    ns = lambda: F.lit(None).cast("string")  # noqa: E731
    return agg.select(
        first["PERM_ID"].alias("PERM_ID"),
        first["SEC_PARTY_CMN_NM"].alias("SEC_PARTY_CMN_NM"),
        first["SEC_PARTY_COMPRESS_CMN_NM"].alias("SEC_PARTY_COMPRESS_CMN_NM"),
        first["SEC_PARTY_ADDR_CITY_NM"].alias("SEC_PARTY_ADDR_CITY_NM"),
        first["SEC_PARTY_ADDR_STATE_CD"].alias("SEC_PARTY_ADDR_STATE_CD"),
        first["FLININGS_COUNT"].alias("FLININGS_COUNT"),
        first["WK_DUNS"].alias("WK_DUNS"),
        first["WK_GDUN_NAME"].alias("WK_GDUN_NAME"),
        first["WK_GDUN"].alias("WK_GDUN"),
        first["COMPRESSES_SEC_PARTY_NAME"].alias("COMPRESSES_SEC_PARTY_NAME"),
        first["COMPRESSES_SEC_PARTY_CITY"].alias("COMPRESSES_SEC_PARTY_CITY"),
        first["COMPRESSES_SEC_PARTY_STATE"].alias("COMPRESSES_SEC_PARTY_STATE"),
        F.lit(GDUN_MULTI_PARENT).cast("long").alias("FJ_GDUN"),
        cat("FJ_GDUN_NAME", "multiple fdic parents gduns: ").alias("FJ_GDUN_NAME"),
        ns().alias("MATCH_IND"),
        cat("FJ_DUN_NAME", "multiple fdic parents duns: ").alias("FJ_DUN_NAME"),
        F.lit(-1).cast("long").alias("FJ_DUNS"),
        F.col("_duns_sum").cast("long").alias("DUNS_COUNT"),
        cat("FINAL_FDIC_PARENT").alias("FDIC_PARENT"),
        cat("SOURCE").alias("SOURCE"),
        first["DETAIL_INFO"].alias("DETAIL_INFO"),
        cat("FJ_GDUN", "multiple fdic parents gduns: ").alias("COMMENTS"),
        first["CREDIT_UNION_PARENT"].alias("CREDIT_UNION_PARENT"),
        # the reference concatenates its ','-led per-row strings back to back
        # (:111-116); the engine's LIST_OF_DUNS strings carry no leading
        # comma, so a ',' join reproduces the same one-flat-list shape
        F.array_join(
            F.filter(
                F.transform("_rows", lambda r: r["LIST_OF_DUNS"].cast("string")),
                lambda s: s != "",
            ),
            ",",
        ).alias("LIST_OF_DUNS"),
        F.lit(None).cast("long").alias("TEMP1"),
    )


def explode_duns_details(df: DataFrame) -> DataFrame:
    """One row per DUNS from the capped list, only for multi-DUNS rows
    (duns_table.py:29 filter duns_count>1; :36-53 split/clean/cast)."""
    multi = df.filter(F.size("list_of_duns") > 1)
    return multi.select(
        "mention_id",
        F.explode("list_of_duns").alias("fj_duns"),
    ).withColumn("fj_duns", F.col("fj_duns").cast("long"))


def explode_spnv_duns(view: DataFrame) -> DataFrame:
    """duns_table.py:29-75 wired onto the REAL SPNV_MATCH_RAW view (VERDICT
    r05 task 6): DUNS_COUNT>1 rows split their comma-joined LIST_OF_DUNS
    and explode into one (PERM_ID, FJ_DUNS) detail row per DUNS. The
    reference persists the list LEADING-comma (dunli=dunli+','+str(i),
    automation_final2.py:457-466) and its consumer drops the empty first
    fragment (duns_table.py:44 split(',')[1:]); the engine's concat_ws view
    intentionally omits the leading comma — the empty-fragment filter below
    handles BOTH formats, so this explode consumes either, while a
    reference-style [1:] slice over the engine view would drop the first
    DUNS (ADVICE r06)."""
    multi = view.filter(F.col("DUNS_COUNT") > 1)
    parts = F.filter(
        F.split(F.col("LIST_OF_DUNS"), ","), lambda x: x != ""
    )
    return multi.select(
        "PERM_ID", F.explode(parts).alias("FJ_DUNS")
    ).withColumn("FJ_DUNS", F.col("FJ_DUNS").cast("long"))


def distinct_final(df: DataFrame, status_col: str = "match_status") -> DataFrame:
    """SELECT DISTINCT promotion of pending rows (spnv_match_file.py:33-64)."""
    return df.distinct()
