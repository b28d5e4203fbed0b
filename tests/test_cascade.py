"""Decision-cascade branch parity (FIXTURES.md §4 cascade_cases): routing,
liquidation sentinels, title-change parent resolution, CU M&A chains, and
overall accuracy on the synthetic corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gduns_name_match_spark.plans.cascade import run_cascade
from gduns_name_match_spark.sources import fixtures as fx


@pytest.fixture(scope="module")
def cascade_result(spark):
    f = fx.generate(n_docs=400, seed=5)
    mentions = fx.truth_df(spark, f).select("mention_id", "raw_name")
    dec = run_cascade(spark, mentions, fx.registries(spark, f)).persist()
    truth = fx.truth_df(spark, f).select(
        "mention_id", "true_gdun", "ambiguous", "expected_status"
    )
    joined = truth.join(dec, "mention_id").persist()
    joined.count()
    return joined


def test_liquidated_branch(cascade_result):
    lq = cascade_result.filter(F.col("expected_status") == "liquidated")
    n = lq.count()
    assert n > 0, "fixture produced no liquidated mentions"
    wrong = lq.filter(
        (F.col("gdun") != -21000) | (F.col("match_status") != "liquidated")
    )
    assert wrong.count() == 0, wrong.select(
        "raw_name", "stage", "gdun", "match_status"
    ).collect()


def test_title_change_branch(cascade_result):
    tc = cascade_result.filter(F.col("expected_status") == "title_change")
    n = tc.count()
    assert n > 0
    wrong = tc.filter(
        (F.col("gdun") != F.col("true_gdun")) | (F.col("stage") != "title_change")
    )
    assert wrong.count() == 0, wrong.select(
        "raw_name", "stage", "gdun", "true_gdun", "match_status"
    ).collect()


def test_cu_mna_branch(cascade_result):
    mna = cascade_result.filter(F.col("expected_status") == "cu_mna")
    n = mna.count()
    assert n > 0
    wrong = mna.filter(
        (F.col("gdun") != F.col("true_gdun")) | (F.col("stage") != "cu_mna")
    )
    assert wrong.count() == 0, wrong.select(
        "raw_name", "stage", "gdun", "true_gdun", "match_status"
    ).collect()


def test_normal_mentions_accuracy(cascade_result):
    normal = cascade_result.filter(~F.col("ambiguous"))
    n = normal.count()
    ok = normal.filter(F.col("gdun") == F.col("true_gdun")).count()
    assert ok / n >= 0.99, f"cascade accuracy {ok}/{n}"


def test_ambiguous_twins_get_multiple(cascade_result):
    amb = cascade_result.filter(
        F.col("ambiguous") & F.col("expected_status").isNull()
    )
    if amb.count() == 0:
        pytest.skip("no ambiguous twins sampled")
    bad = amb.filter(F.col("match_status") != "multiple_gduns")
    assert bad.count() == 0, bad.select(
        "raw_name", "stage", "gdun", "match_status"
    ).collect()


def test_routing(cascade_result):
    routes = {
        r["route"]
        for r in cascade_result.select("route").distinct().collect()
    }
    assert routes <= {"corporate", "credit_union", "bank"}
    # corporate-suffixed mentions that don't mention bank/cu go to DNB direct
    corp = cascade_result.filter(F.col("route") == "corporate")
    if corp.count():
        assert (
            corp.filter(~F.col("stage").isin("dnb_corporate", "manual")).count() == 0
        )
