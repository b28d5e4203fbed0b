"""Match resolution: threshold, argmin window, group fetch, GDUN decision.

Re-expresses the reference's per-row decision cascade as set-at-a-time
DataFrame ops:

* threshold accept  — dist <= 0.2 (automation_final2.py:435 et al., V4)
* top-1 per probe   — row_number window (replaces kneighbors ind[0][0], W1)
* group fetch       — equi-join on best matched name (replaces
                      ``dnb[dnb.NAME == dnb_name]``, J1)
* uniqueness test   — countDistinct(gl_ult_dun) == 1 (A1)
* city/state tie-break — among the matched-name group, argmin city cosine
  then state equality (replaces the per-group TF-IDF re-fit V5,
  automation_final2.py:437-441,687-691). Divergence (documented): the
  reference re-fits a fresh vectorizer on the group's cities; we rank by
  cosine with the registry-wide city IDF — same argmin on any non-degenerate
  group, without a per-row model fit.
* HQ tie-break — when name/city/state rungs all fail and the probe carries a
  headquarters city (the MAINOFF=1 branch city of its matched FDIC record,
  automation_final2.py:995-996), probe the group's cities with the HQ city;
  a unique GL_ULT_DUN at hq_dist <= 0.2 resolves ('Data from DNB using
  Headquaters', automation_final2.py:560-600).
* sentinels — 'multiple_gduns' (-67000 with capped LIST_OF_DUNS,
  automation_final2.py:457-466,516-517), 'manual' (-1,
  automation_final2.py:658-675).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

THRESHOLD = 0.2  # cosine distance acceptor, automation_final2.py:435
GDUN_MANUAL = -1
GDUN_MULTIPLE = -67000
GDUN_LIQUIDATED = -21000
GDUN_MULTI_PARENT = -45000
LIST_OF_DUNS_CAP = 100  # automation_final2.py:457-466


def best_match_per_probe(
    scored: DataFrame,
    probe_id: str = "mention_id",
    dist_col: str = "cos_dist",
    name_col: str = "r_norm",
    threshold: float = THRESHOLD,
) -> DataFrame:
    """Accept pairs under the threshold; keep the single best registry *name*
    per probe (deterministic (dist asc, name asc) tie-break — struct min
    compares fields left to right, the window's orderBy exactly).

    One hash aggregate instead of a row_number window: no per-partition sort
    of the scored pair stream, and the partial (map-side) aggregate shrinks
    every partition to one row per probe before anything moves — on a stream
    already hash-partitioned by probe it is sort-free and shuffle-free.
    Returns (probe_id, name_col, dist_col)."""
    best = F.min(F.struct(F.col(dist_col), F.col(name_col))).alias("_best")
    return (
        scored.filter(F.col(dist_col) <= threshold)
        .groupBy(probe_id)
        .agg(best)
        .select(
            probe_id,
            F.col(f"_best.{name_col}").alias(name_col),
            F.col(f"_best.{dist_col}").alias(dist_col),
        )
    )


def _with_group_refit_dists(
    joined: DataFrame,
    probe_id: str,
    probe_city: str | None,
    probe_hq: str | None,
) -> DataFrame:
    """city_dist / hq_dist via a PER-GROUP TF-IDF re-fit (the reference's
    exact V5 semantics, automation_final2.py:437-441,687-691 and the HQ
    probe :560-600): within each probe's matched-name group, fit a fresh
    smooth-IDF on the group's own city column (duplicates included) and
    score the probe/HQ city against each group city under those weights.

    One applyInPandas keyed by the probe id — each group is the probe's
    registry rows (bounded by the matched name's fan-out), and the fit is a
    few short strings, so the kernel is trivially cheap; the shuffle it
    introduces is the same hashpartitioning(probe_id) the decision agg right
    after needs anyway."""
    from pyspark.sql import types as T

    from gduns_name_match_spark.functions.similarity import (
        cosine_dist_local,
        fit_idf_local,
    )

    out_schema = T.StructType(
        joined.schema.fields
        + [
            T.StructField("city_dist", T.DoubleType()),
            T.StructField("hq_dist", T.DoubleType()),
        ]
    )
    cols = [f.name for f in out_schema.fields]

    def kernel(pdf):
        if pdf.empty:
            for c in ("city_dist", "hq_dist"):
                pdf[c] = []
            return pdf[cols]
        cities = pdf["g_city"].fillna("").tolist()
        idf = fit_idf_local(cities)
        if probe_city is not None:
            p = pdf[probe_city].iloc[0] or ""
            pdf["city_dist"] = [cosine_dist_local(p, c, idf) for c in cities]
        else:
            pdf["city_dist"] = 1.0
        hq = (pdf[probe_hq].iloc[0] or "") if probe_hq is not None else ""
        if hq:
            pdf["hq_dist"] = [cosine_dist_local(hq, c, idf) for c in cities]
        else:
            pdf["hq_dist"] = 1.0
        return pdf[cols]

    return joined.groupBy(probe_id).applyInPandas(kernel, out_schema)


def resolve_gdun(
    best: DataFrame,
    registry: DataFrame,
    city_cosine_udf=None,
    probe_id: str = "mention_id",
    probe_city: str | None = "m_city",
    probe_state: str | None = "m_state",
    probe_hq: str | None = None,
    group_refit: bool = False,
) -> DataFrame:
    """Decision cascade from best-name match to a GDUN or a sentinel status.

    ``registry`` must carry (norm_name, norm_city, st, duns_num, gl_ult_dun).
    Output: one row per probe with (gdun, match_status, list_of_duns,
    n_gduns, best_name, best_dist, ...).

    ``group_refit=True`` scores the city/HQ rungs with a per-group TF-IDF
    re-fit (reference-exact V5); the default scores them with the caller's
    ``city_cosine_udf`` (registry-wide IDF — cheaper, one fitted model).
    """
    # GL_ULT_NAM is optional registry metadata — when present it feeds the
    # 'Multiple GDUNS found,{names}' FJ_GDUN_NAME composition in the SPNV
    # compat view (reference automation_final2.py:486-526)
    has_gnam = "gl_ult_nam" in registry.columns
    grp = registry.select(
        F.col("norm_name").alias("best_name"),
        F.col("norm_city").alias("g_city"),
        F.col("st").alias("g_state"),
        F.col("duns_num").alias("g_duns"),
        F.col("gl_ult_dun").alias("g_gdun"),
        (F.col("gl_ult_nam") if has_gnam else F.lit(None)).cast("string").alias(
            "g_gnam"
        ),
    )
    joined = best.join(grp, "best_name")  # group fetch (J1)

    if group_refit and (probe_city is not None or probe_hq is not None):
        joined = _with_group_refit_dists(joined, probe_id, probe_city, probe_hq)
    else:
        has_city = probe_city is not None and city_cosine_udf is not None
        if has_city:
            joined = joined.withColumn(
                "city_dist", city_cosine_udf(F.col(probe_city), F.col("g_city"))
            )
        else:
            joined = joined.withColumn("city_dist", F.lit(1.0))

        # HQ rung: '' means "no HQ known" (non-null so it can be a join key)
        has_hq = probe_hq is not None and city_cosine_udf is not None
        if has_hq:
            joined = joined.withColumn(
                "hq_dist",
                F.when(F.col(probe_hq) == "", F.lit(1.0)).otherwise(
                    city_cosine_udf(F.col(probe_hq), F.col("g_city"))
                ),
            )
        else:
            joined = joined.withColumn("hq_dist", F.lit(1.0))

    # the state rung is the same expression on either distance path
    joined = joined.withColumn(
        "state_eq",
        (F.col(probe_state) == F.col("g_state")).cast("int")
        if probe_state is not None
        else F.lit(0),
    )

    # ONE hash-aggregatable pass: every "how many distinct gduns pass rung X"
    # is size(collect_set(...)) over a set the audit columns need anyway —
    # count_distinct here would compile to an Expand (6x the agg's input rows,
    # one copy per distinct grouping) plus SortAggregate chains. Set state is
    # bounded: a group is one matched name's registry rows (<= max_block) and
    # collect_set dedupes in the partial (map-side) aggregate.
    agg = (
        joined.groupBy(probe_id)
        .agg(
            # unique per probe (the fan-out copies one best row across the
            # group), so min == the value; min keeps the agg hash-friendly
            # and deterministic where first() is pick-any
            F.min("best_name").alias("best_name"),
            F.min("best_dist").alias("best_dist"),
            F.sort_array(F.collect_set("g_gdun")).alias("_gduns"),
            F.min("city_dist").alias("min_city_dist"),
            # gdun among rows at the minimal city distance (if accepted)
            F.sort_array(
                F.collect_set(
                    F.when(F.col("city_dist") <= THRESHOLD, F.col("g_gdun"))
                )
            ).alias("_gduns_city_ok"),
            F.min_by("g_gdun", F.struct("city_dist", "g_gdun")).alias(
                "gdun_by_city"
            ),
            F.sort_array(
                F.collect_set(F.when(F.col("state_eq") == 1, F.col("g_gdun")))
            ).alias("_gduns_state"),
            F.min("hq_dist").alias("min_hq_dist"),
            F.sort_array(
                F.collect_set(
                    F.when(F.col("hq_dist") <= THRESHOLD, F.col("g_gdun"))
                )
            ).alias("_gduns_hq_ok"),
            F.min_by("g_gdun", F.struct("hq_dist", "g_gdun")).alias("gdun_by_hq"),
            # audit-column feeds for the SPNV compat view (reference
            # automation_final2.py:457-526): DUNS_COUNT, FJ_DUNS on a unique
            # DUNS, the capped id/name lists behind 'Multiple GDUNS found,{x}'
            F.sort_array(F.collect_set("g_duns")).alias("_duns"),
            F.slice(
                F.sort_array(F.collect_set("g_gnam")), 1, LIST_OF_DUNS_CAP
            ).alias("list_of_gdun_names"),
        )
        .withColumns(
            {
                "n_gduns": F.size("_gduns").cast("long"),
                "n_gduns_city_ok": F.size("_gduns_city_ok").cast("long"),
                "n_gduns_state": F.size("_gduns_state").cast("long"),
                # sorted-asc sets make head == min; F.get (not element_at):
                # ANSI mode turns element_at on an empty set into a hard
                # INVALID_ARRAY_INDEX error, F.get yields the NULL min() gave
                "gdun_by_state": F.get("_gduns_state", 0),
                "n_gduns_hq_ok": F.size("_gduns_hq_ok").cast("long"),
                "any_gdun": F.get("_gduns", 0),
                "list_of_duns": F.slice("_duns", 1, LIST_OF_DUNS_CAP),
                "n_duns": F.size("_duns").cast("long"),
                "min_duns": F.get("_duns", 0),
                "list_of_gduns": F.slice("_gduns", 1, LIST_OF_DUNS_CAP),
            }
        )
        .drop("_gduns", "_gduns_city_ok", "_gduns_state", "_gduns_hq_ok", "_duns")
    )

    # cascade: unique gdun → gdun; else city tie-break; else state; else -67000
    decided = agg.withColumn(
        "gdun",
        F.when(F.col("n_gduns") == 1, F.col("any_gdun"))
        .when(
            (F.col("min_city_dist") <= THRESHOLD) & (F.col("n_gduns_city_ok") == 1),
            F.col("gdun_by_city"),
        )
        .when(F.col("n_gduns_state") == 1, F.col("gdun_by_state"))
        .when(
            (F.col("min_hq_dist") <= THRESHOLD) & (F.col("n_gduns_hq_ok") == 1),
            F.col("gdun_by_hq"),
        )
        .otherwise(F.lit(GDUN_MULTIPLE)),
    ).withColumn(
        "match_status",
        F.when(F.col("n_gduns") == 1, F.lit("matched_name"))
        .when(
            (F.col("min_city_dist") <= THRESHOLD) & (F.col("n_gduns_city_ok") == 1),
            F.lit("matched_city_tiebreak"),
        )
        .when(F.col("n_gduns_state") == 1, F.lit("matched_state_tiebreak"))
        .when(
            (F.col("min_hq_dist") <= THRESHOLD) & (F.col("n_gduns_hq_ok") == 1),
            F.lit("matched_hq_tiebreak"),
        )
        .otherwise(F.lit("multiple_gduns")),
    )
    return decided.drop(
        "n_gduns_city_ok", "gdun_by_city", "n_gduns_state", "gdun_by_state",
        "any_gdun", "min_hq_dist", "n_gduns_hq_ok", "gdun_by_hq",
    )


# Non-null defaults of the reference's Manual routing (gdun_name='Manual',
# gdun_final=-1, automation_final2.py:658-675); the remaining decision
# columns (best_name, best_dist, min_city_dist, min_duns) are genuinely
# unknown for an unmatched probe and stay NULL.
def _manual_defaults() -> dict:
    return {
        "n_gduns": F.lit(0).cast("long"),
        "n_duns": F.lit(0).cast("long"),
        "list_of_duns": F.array().cast("array<long>"),
        "list_of_gduns": F.array().cast("array<long>"),
        "list_of_gdun_names": F.array().cast("array<string>"),
        "gdun": F.lit(GDUN_MANUAL).cast("long"),
        "match_status": F.lit("manual"),
    }


def fill_manual_defaults(joined: DataFrame) -> DataFrame:
    """Null-fill the decision columns of a ``probes LEFT JOIN decided`` frame
    to the Manual routing. This replaced round 2's anti-join + union
    fallback operator: the left join the caller already needs does the set
    difference for free, so completing the decision space costs zero extra
    stages."""
    return joined.withColumns(
        {c: F.coalesce(F.col(c), d) for c, d in _manual_defaults().items()}
    )
