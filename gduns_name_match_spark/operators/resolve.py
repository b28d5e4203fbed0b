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

from pyspark.sql import DataFrame, Window
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
    per probe (deterministic tie-break on the name string)."""
    w = Window.partitionBy(probe_id).orderBy(F.col(dist_col).asc(), F.col(name_col).asc())
    return (
        scored.filter(F.col(dist_col) <= threshold)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .drop("rank")
    )


def resolve_gdun(
    best: DataFrame,
    registry: DataFrame,
    city_cosine_udf=None,
    probe_id: str = "mention_id",
    probe_city: str | None = "m_city",
    probe_state: str | None = "m_state",
    probe_hq: str | None = None,
) -> DataFrame:
    """Decision cascade from best-name match to a GDUN or a sentinel status.

    ``registry`` must carry (norm_name, norm_city, st, duns_num, gl_ult_dun).
    Output: one row per probe with (gdun, match_status, list_of_duns,
    n_gduns, best_name, best_dist, ...).
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

    has_city = probe_city is not None and city_cosine_udf is not None
    if has_city:
        joined = joined.withColumn(
            "city_dist", city_cosine_udf(F.col(probe_city), F.col("g_city"))
        )
    else:
        joined = joined.withColumn("city_dist", F.lit(1.0))

    state_eq = (
        (F.col(probe_state) == F.col("g_state")).cast("int")
        if probe_state is not None
        else F.lit(0)
    )
    joined = joined.withColumn("state_eq", state_eq)

    # HQ rung: '' means "no HQ known" (kept non-null so it can be a join key)
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

    agg = joined.groupBy(probe_id).agg(
        F.first("best_name").alias("best_name"),
        F.first("best_dist").alias("best_dist"),
        F.count_distinct("g_gdun").alias("n_gduns"),
        F.min("city_dist").alias("min_city_dist"),
        # gdun among rows at the minimal city distance (if accepted)
        F.count_distinct(
            F.when(F.col("city_dist") <= THRESHOLD, F.col("g_gdun"))
        ).alias("n_gduns_city_ok"),
        F.min_by("g_gdun", F.struct("city_dist", "g_gdun")).alias("gdun_by_city"),
        F.count_distinct(F.when(F.col("state_eq") == 1, F.col("g_gdun"))).alias(
            "n_gduns_state"
        ),
        # min (ignores nulls) — deterministic even if a future caller reads
        # gdun_by_state when n_gduns_state > 1 (first() would be pick-any)
        F.min(F.when(F.col("state_eq") == 1, F.col("g_gdun"))).alias(
            "gdun_by_state"
        ),
        F.min("hq_dist").alias("min_hq_dist"),
        F.count_distinct(
            F.when(F.col("hq_dist") <= THRESHOLD, F.col("g_gdun"))
        ).alias("n_gduns_hq_ok"),
        F.min_by("g_gdun", F.struct("hq_dist", "g_gdun")).alias("gdun_by_hq"),
        F.first("g_gdun").alias("any_gdun"),
        F.slice(F.sort_array(F.collect_set("g_duns")), 1, LIST_OF_DUNS_CAP).alias(
            "list_of_duns"
        ),
        # audit-column feeds for the SPNV compat view (reference
        # automation_final2.py:457-526): DUNS_COUNT, FJ_DUNS on a unique DUNS,
        # and the capped gdun id/name lists behind 'Multiple GDUNS found,{x}'
        F.count_distinct("g_duns").alias("n_duns"),
        F.min("g_duns").alias("min_duns"),
        F.slice(F.sort_array(F.collect_set("g_gdun")), 1, LIST_OF_DUNS_CAP).alias(
            "list_of_gduns"
        ),
        F.slice(F.sort_array(F.collect_set("g_gnam")), 1, LIST_OF_DUNS_CAP).alias(
            "list_of_gdun_names"
        ),
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


def with_manual_fallback(
    probes: DataFrame, decided: DataFrame, probe_id: str = "mention_id"
) -> DataFrame:
    """Probes with no accepted match get the reference's Manual routing
    (gdun_name='Manual', gdun_final=-1, automation_final2.py:658-675)."""
    missing = probes.join(decided.select(probe_id), probe_id, "left_anti").select(
        probe_id,
        F.lit(None).cast("string").alias("best_name"),
        F.lit(None).cast("double").alias("best_dist"),
        F.lit(0).cast("long").alias("n_gduns"),
        F.lit(None).cast("double").alias("min_city_dist"),
        F.array().cast("array<long>").alias("list_of_duns"),
        F.lit(0).cast("long").alias("n_duns"),
        F.lit(None).cast("long").alias("min_duns"),
        F.array().cast("array<long>").alias("list_of_gduns"),
        F.array().cast("array<string>").alias("list_of_gdun_names"),
        F.lit(GDUN_MANUAL).cast("long").alias("gdun"),
        F.lit("manual").alias("match_status"),
    )
    return decided.unionByName(missing)
