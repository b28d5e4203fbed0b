"""Blocking-recall property (SURVEY.md §5.4): every name pair the cosine<=0.2
acceptor would accept must share at least one blocking key — otherwise the
fixed-blocking-key F1 target is unsound. Plus salting/cap behavior and the
-45000 post-processing collapse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gduns_name_match_spark.functions.similarity import (
    _IDF_REGISTRY,
    _cosine_dist,
    build_idf,
)
from gduns_name_match_spark.operators.blocking import (
    block_keys_col,
    candidate_pairs,
    with_block_keys,
)
from gduns_name_match_spark.operators.postprocess import (
    collapse_multi_parent,
    explode_duns_details,
)
from gduns_name_match_spark.sources import fixtures as fx


def test_blocking_recall_covers_true_matches(spark):
    """Any TRUE-match pair (same entity group) the cosine<=0.2 acceptor
    accepts must be co-blocked — the soundness condition for evaluating F1 at
    the fixed blocking key.

    (The stronger 'covers ALL acceptable pairs' property is intentionally NOT
    required: e.g. 'vertexequipmentfinance' vs 'apexequipmentfinance' sit
    within 0.2 on shared-suffix n-grams but are different entities — blocking
    separating them is precision the global-kNN reference lacks.)"""
    f = fx.generate(n_docs=250, seed=13, typos=True)
    truth = fx.truth_df(spark, f)
    names_df = truth.select(
        __import__(
            "gduns_name_match_spark.functions.normalize",
            fromlist=["normalize_name_col"],
        ).normalize_name_col(F.col("raw_name")).alias("norm"),
        "true_gdun",
    ).distinct()
    rows = names_df.select(
        "norm", "true_gdun", block_keys_col(F.col("norm")).alias("keys")
    ).collect()
    names = [(r["norm"], r["true_gdun"], set(r["keys"])) for r in rows if r["norm"]]
    idf = build_idf(names_df.withColumnRenamed("norm", "norm_name"), "norm_name")
    _IDF_REGISTRY["recall-test"] = idf

    missed = []
    for i in range(len(names)):
        ni, gi, ki = names[i]
        for j in range(i + 1, len(names)):
            nj, gj, kj = names[j]
            if gi != gj or ki & kj:
                continue
            if _cosine_dist(ni, nj, "recall-test") <= 0.2:
                missed.append((ni, nj))
    assert not missed, f"{len(missed)} true-match pairs not co-blocked: {missed[:5]}"


def test_regime_overlap_no_recall_cliff_at_length_threshold(spark):
    """Near-duplicates whose lengths straddle LONG_NAME_THRESHOLD must still
    co-block: a hard short/long cutover once gave a 47-char name and its
    49-char edit disjoint key sets (ADVICE r02). The overlap band emits BOTH
    key sets around the boundary."""
    from gduns_name_match_spark.operators.blocking import (
        LONG_NAME_THRESHOLD,
        REGIME_OVERLAP_HI,
        REGIME_OVERLAP_LO,
    )

    base = "summitridgecommunitybankingandtrustco"  # grows below
    cases = []
    # pairs straddling every regime boundary: (len a, len b) around LO,
    # LONG_NAME_THRESHOLD, and HI
    for pivot in (REGIME_OVERLAP_LO, LONG_NAME_THRESHOLD, REGIME_OVERLAP_HI):
        a = (base * 4)[: pivot - 1]
        b = a + "xy"          # 2-char suffix insertion crosses the boundary
        cases.append((a, b))
        c = (base * 4)[: pivot + 3]
        d = c[:10] + c[12:]   # 2-char deletion crosses back
        cases.append((c, d))
    df = spark.createDataFrame([(a, b) for a, b in cases], ["a", "b"])
    rows = df.select(
        "a", "b",
        F.arrays_overlap(
            block_keys_col(F.col("a")), block_keys_col(F.col("b"))
        ).alias("co_blocked"),
    ).collect()
    not_cob = [(r["a"], r["b"]) for r in rows if not r["co_blocked"]]
    assert not not_cob, f"recall cliff at regime boundary: {not_cob}"


def test_degenerate_long_string_keys_distinct(spark):
    """A >=48-char single-repeated-char string has gmin == gmax; duplicate
    keys would emit the same pair multiple times through ownership."""
    df = spark.createDataFrame([("a" * 80,)], ["norm"])
    keys = df.select(block_keys_col(F.col("norm")).alias("k")).collect()[0]["k"]
    assert len(keys) == len(set(keys)), keys


def test_hot_key_salting_and_cap(spark):
    probe = spark.createDataFrame(
        [(f"p{i}", "aaaa") for i in range(50)], ["pid", "m_norm"]
    )
    reg_hot = spark.createDataFrame(
        [(f"r{i}", "aaaa") for i in range(30)], ["rid", "r_norm"]
    )
    pk = with_block_keys(probe, "m_norm")
    rk = with_block_keys(reg_hot, "r_norm")
    pairs, stats = candidate_pairs(
        pk, rk, probe_id="pid", registry_id="rid",
        hot_key_threshold=10, max_block=10_000, n_salt=4,
    )
    # every probe must still see every registry row despite salting
    assert pairs.count() == 50 * 30
    hot = stats.filter(F.col("is_hot")).count()
    assert hot > 0
    # cap: with a tiny max_block the key is dropped and counted, not silent
    pairs2, stats2 = candidate_pairs(
        pk, rk, probe_id="pid", registry_id="rid",
        hot_key_threshold=10, max_block=5, n_salt=4,
    )
    assert pairs2.count() == 0
    assert stats2.filter(F.col("is_dropped")).count() > 0


def test_candidate_pairs_persist_knob_parity(spark):
    """persist_keyed=False (recompute the keyed sides in the join pass) must
    produce the identical pair set — the knob is a measured cache-vs-recompute
    trade (BENCH.md round 5: persist wins by 6.4s at 16c/400k), never a
    semantic change. Includes a hot salted key so the salting path is covered
    in both modes, and checks release() stays quiet when nothing was cached."""
    probe = spark.createDataFrame(
        [(f"p{i}", n) for i, n in enumerate(
            ["aaaa"] * 20 + ["first national bank", "acme corp", "zeta savings"]
        )],
        ["pid", "m_norm"],
    )
    reg = spark.createDataFrame(
        [(f"r{i}", n) for i, n in enumerate(
            ["aaaa"] * 15 + ["first national bancorp", "acme corporation"]
        )],
        ["rid", "r_norm"],
    )
    results = {}
    for mode in (True, False):
        res = candidate_pairs(
            with_block_keys(probe, "m_norm"),
            with_block_keys(reg, "r_norm"),
            probe_id="pid",
            registry_id="rid",
            hot_key_threshold=10,
            n_salt=4,
            persist_keyed=mode,
        )
        results[mode] = {
            tuple(r) for r in res.pairs.select("pid", "rid").collect()
        }
        res.release()
    assert results[True] == results[False]
    assert len(results[True]) >= 20 * 15  # the hot key's full cross product


def test_collapse_multi_parent(spark):
    df = spark.createDataFrame(
        [
            ("g1", "m1", "acme", "parent a", "bank a", 3, 100),
            ("g1", "m1", "acme", "parent b", "bank b", 2, 100),
            ("g2", "m2", "zenith", "parent c", "bank c", 5, 200),
        ],
        ["temp1", "mention_id", "raw_name", "gdun_name", "parent_name",
         "duns_count", "gdun"],
    )
    out = collapse_multi_parent(df, "temp1")
    rows = {r["temp1"]: r for r in out.collect()}
    g1 = rows["g1"]
    assert g1["gdun"] == -45000
    assert g1["duns_count"] == 5
    assert g1["gdun_name"] == "parent a,parent b"
    assert g1["match_status"] == "multi_parent_collapsed"
    g2 = rows["g2"]
    assert g2["gdun"] == 200 and g2["match_status"] == "single_parent"


def test_explode_duns_details(spark):
    df = spark.createDataFrame(
        [("m1", [1, 2, 3]), ("m2", [9]), ("m3", [])],
        ["mention_id", "list_of_duns"],
    )
    out = explode_duns_details(df).collect()
    assert sorted((r["mention_id"], r["fj_duns"]) for r in out) == [
        ("m1", 1), ("m1", 2), ("m1", 3)
    ]


def test_ownership_emits_each_pair_exactly_once(spark):
    """min-shared-key ownership must yield the same pair SET as a brute
    dedup, with no duplicates — including when names share several keys and
    keys are hot-salted."""
    from pyspark.sql import functions as F

    from gduns_name_match_spark.operators.blocking import (
        candidate_pairs,
        with_block_keys,
    )

    # names engineered to share prefix+soundex+metaphone keys simultaneously
    reg_names = [f"summitbank{i:03d}" for i in range(40)] + ["summitbank", "sumitbank"]
    probe_names = ["summitbank", "summitbanc", "sumitbank", "other"]
    reg = spark.createDataFrame([(n,) for n in reg_names], "r_norm string")
    probes = spark.createDataFrame([(n,) for n in probe_names], "m_norm string")
    pairs, _ = candidate_pairs(
        with_block_keys(probes, "m_norm"),
        with_block_keys(reg, "r_norm"),
        probe_id="m_norm",
        registry_id="r_norm",
        hot_key_threshold=5,   # force salting on the shared keys
        n_salt=4,
    )
    rows = pairs.select("m_norm", "r_norm").collect()
    assert len(rows) == len({(r["m_norm"], r["r_norm"]) for r in rows}), "dup pairs"
    # same set as the brute exploded-join + distinct
    brute = (
        with_block_keys(probes, "m_norm").select("m_norm", "block_key")
        .join(
            with_block_keys(reg, "r_norm").select("r_norm", "block_key"),
            "block_key",
        )
        .select("m_norm", "r_norm")
        .distinct()
        .collect()
    )
    assert {(r["m_norm"], r["r_norm"]) for r in rows} == {
        (r["m_norm"], r["r_norm"]) for r in brute
    }
