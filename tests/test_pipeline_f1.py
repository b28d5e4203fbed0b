"""End-to-end golden-cluster gate: pairwise F1 >= 0.99 on labeled mention
pairs at the fixed blocking key (BASELINE.json metric), plus sentinel-path and
span-invariant checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gduns_name_match_spark.operators.blocking import with_block_keys
from gduns_name_match_spark.plans.pipeline import (
    extract_name_mentions,
    match_documents,
    reconstruct_spans,
)
from gduns_name_match_spark.sources import fixtures as fx


@pytest.fixture(scope="module")
def fixture():
    # n_cu_reprobe appends the path-B lone-parent CU re-probe entities
    # (round 6) AFTER the main rng stream — the 300 base docs are
    # bit-identical to prior rounds' corpus
    return fx.generate(n_docs=300, seed=42, n_cu_reprobe=4)


@pytest.fixture(scope="module")
def result(spark, fixture):
    docs = fx.documents_df(spark, fixture)
    reg = fx.registry_df(spark, fixture)
    res = match_documents(spark, docs, reg)
    res.decisions.persist().count()
    return res


def test_span_invariant(spark, fixture):
    docs = fx.documents_df(spark, fixture)
    chk = reconstruct_spans(docs)
    assert chk.filter(~F.col("spans_equal")).count() == 0


def test_mentions_extracted(spark, fixture, result):
    assert result.mentions.count() == len(fixture.mention_truth)


def test_pairwise_f1(spark, fixture, result):
    truth = fx.truth_df(spark, fixture)
    pred = result.decisions.select("mention_id", "gdun", "match_status")
    m = (
        truth.filter(~F.col("ambiguous"))
        .join(pred, "mention_id")
        .select("mention_id", "true_gdun", "gdun")
        .withColumn("norm", F.lit(None))
    )
    # fixed blocking key: only co-blocked mention pairs are labeled/evaluated
    mentions = extract_name_mentions(fx.documents_df(spark, fixture)).withColumn(
        "m_norm",
        __import__(
            "gduns_name_match_spark.functions.normalize", fromlist=["normalize_name_col"]
        ).normalize_name_col(F.col("raw_name")),
    )
    keyed = with_block_keys(mentions.select("mention_id", "m_norm"), "m_norm")
    a = keyed.select(F.col("mention_id").alias("ma"), F.col("block_key"))
    b = keyed.select(F.col("mention_id").alias("mb"), F.col("block_key"))
    co_blocked = (
        a.join(b, "block_key").filter(F.col("ma") < F.col("mb")).select("ma", "mb").distinct()
    )
    ta = m.select(
        F.col("mention_id").alias("ma"),
        F.col("true_gdun").alias("ga"),
        F.col("gdun").alias("pa"),
    )
    tb = m.select(
        F.col("mention_id").alias("mb"),
        F.col("true_gdun").alias("gb"),
        F.col("gdun").alias("pb"),
    )
    pairs = co_blocked.join(ta, "ma").join(tb, "mb")
    stats = pairs.select(
        F.sum(
            ((F.col("ga") == F.col("gb")) & (F.col("pa") == F.col("pb")) & (F.col("pa") > 0)).cast("int")
        ).alias("tp"),
        F.sum(
            ((F.col("ga") != F.col("gb")) & (F.col("pa") == F.col("pb")) & (F.col("pa") > 0)).cast("int")
        ).alias("fp"),
        F.sum(
            ((F.col("ga") == F.col("gb"))
             & ((F.col("pa") != F.col("pb")) | (F.col("pa") <= 0))).cast("int")
        ).alias("fn"),
    ).collect()[0]
    tp, fp, fn = stats["tp"] or 0, stats["fp"] or 0, stats["fn"] or 0
    f1 = 2 * tp / (2 * tp + fp + fn) if tp else 0.0
    print(f"pairwise F1 = {f1:.4f}  (tp={tp} fp={fp} fn={fn})")
    assert f1 >= 0.99, f"F1 {f1:.4f} < 0.99 (tp={tp} fp={fp} fn={fn})"


def test_ambiguous_get_multiple_sentinel(spark, fixture, result):
    truth = fx.truth_df(spark, fixture)
    # ambiguous-twin names only (cascade-branch entities carry an
    # expected_status and resolve to other sentinels in plans/cascade.py)
    amb = (
        truth.filter(F.col("ambiguous") & F.col("expected_status").isNull())
        .join(result.decisions, "mention_id")
    )
    n = amb.count()
    if n == 0:
        pytest.skip("no ambiguous mentions sampled")
    bad = amb.filter(~F.col("match_status").isin("multiple_gduns")).count()
    assert bad == 0, f"{bad}/{n} ambiguous mentions not routed to multiple_gduns"
    # sentinel value and capped duns list present
    row = amb.filter(F.col("match_status") == "multiple_gduns").first()
    assert row["gdun"] == -67000
    assert 0 < len(row["list_of_duns"]) <= 100


def test_no_silent_key_drops(result):
    dropped = result.key_stats.filter(F.col("is_dropped")).count()
    assert dropped == 0  # fixture scale must not trip the cap


@pytest.fixture(scope="module")
def cascade_tagged(spark, fixture):
    """Full cascade over the SAME corpus the F1 gate scores, joined to the
    tagged truth — the chain-regression counters (VERDICT r05 task 7)."""
    from gduns_name_match_spark.plans.cascade import run_cascade

    truth = fx.truth_df(spark, fixture)
    dec = run_cascade(
        spark,
        truth.select("mention_id", "raw_name", "city", "state"),
        fx.registries(spark, fixture),
    )
    joined = truth.select(
        "mention_id", "true_gdun", "expected_status",
        F.col("city").alias("t_city"),
    ).join(dec, "mention_id").persist()
    joined.count()
    return joined


def test_stage_accuracy_chain_tags(cascade_tagged):
    """VERDICT r05 task 7: per-tag STAGE accuracy counters so a title-chain
    regression moves a number even though ambiguous rows are excluded from
    the pairwise F1. Geo chain children must resolve fdic_active to their own
    gdun; geo-less ones end title_manual (:1203-1219); multi-parent mentions
    emit exactly their TEMP2='Y' per-parent title_change pair."""
    geo = cascade_tagged.filter(F.col("expected_status") == "chain_child_geo")
    n_geo = geo.count()
    if n_geo:
        ok = geo.filter(
            (F.col("stage") == "fdic_active")
            & (F.col("gdun") == F.col("true_gdun"))
        ).count()
        assert ok == n_geo, f"chain_child_geo stage accuracy {ok}/{n_geo}"
    man = cascade_tagged.filter(
        F.col("expected_status") == "chain_child_manual"
    )
    n_man = man.count()
    if n_man:
        ok = man.filter(
            (F.col("stage") == "title_manual") & (F.col("gdun") == -1)
        ).count()
        assert ok == n_man, f"chain_child_manual stage accuracy {ok}/{n_man}"
    mp = cascade_tagged.filter(F.col("expected_status") == "multi_parent")
    n_mp_mentions = mp.select("mention_id").distinct().count()
    if n_mp_mentions:
        ok_rows = mp.filter(
            (F.col("stage") == "title_change") & (F.col("temp2") == "Y")
        ).count()
        assert ok_rows == 2 * n_mp_mentions, (
            f"multi_parent TEMP2 rows {ok_rows} != 2x{n_mp_mentions}"
        )
    # path-B lone-parent re-probe truths (round 6; the fixture appendix
    # guarantees exactly 4): stage AND gdun must both hold, so a routing or
    # rank regression in title_cu/title_dnb moves this counter
    for tag in ("title_cu", "title_dnb"):
        sub = cascade_tagged.filter(F.col("expected_status") == tag)
        n = sub.count()
        assert n == 2, f"{tag}: fixture should carry 2 mentions, got {n}"
        ok = sub.filter(
            (F.col("stage") == tag) & (F.col("gdun") == F.col("true_gdun"))
        ).count()
        assert ok == n, f"{tag} stage accuracy {ok}/{n}"
    if not (n_geo or n_man or n_mp_mentions):
        pytest.skip("corpus sampled no chain-tagged mentions")
