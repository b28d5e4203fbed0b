"""SPNV_MATCH_RAW compat-view schema parity + ongoing-mna transitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gduns_name_match_spark.sources import fixtures as fx


@pytest.fixture(scope="module")
def small_cascade(spark):
    from gduns_name_match_spark.plans.cascade import run_cascade

    f = fx.generate(n_docs=40, seed=11)
    mentions = fx.truth_df(spark, f).select("mention_id", "raw_name")
    return run_cascade(spark, mentions, fx.registries(spark, f)).persist()


def test_spnv_view_schema(small_cascade):
    from gduns_name_match_spark.operators.compat import (
        SPNV_MATCH_RAW_COLUMNS,
        to_spnv_match_raw,
    )

    view = to_spnv_match_raw(small_cascade)
    assert view.columns == SPNV_MATCH_RAW_COLUMNS  # exact names AND order
    assert len(view.columns) == 42


def test_spnv_view_source_codes(small_cascade):
    from gduns_name_match_spark.operators.compat import to_spnv_match_raw

    view = to_spnv_match_raw(small_cascade).persist()
    codes = {r["SOURCE"] for r in view.select("SOURCE").distinct().collect()}
    assert codes <= {
        "DNB", "FDIC", "LQ", "TC",
        "CREDITUNION_ACTIVE", "CREDITUNION_MNA", "CREDITUNION_CLOSED",
    }
    # one row per mention, PERM_ID preserved
    assert view.count() == small_cascade.count()


def test_mna_transitions(spark):
    from gduns_name_match_spark.plans.events import mna_transitions

    f = fx.generate(n_docs=40, seed=11)
    bank = fx.fdic_events_df(spark, f).select(
        F.col("fdic_id").cast("long").alias("event_id"), "name", "parent_name"
    )
    cu = fx.cu_mna_df(spark, f).select(
        F.col("old_ncua_id").cast("long").alias("event_id"), "name", "parent_name"
    )
    out = mna_transitions(spark, bank.unionByName(cu), fx.registry_df(spark, f))
    rows = {r["event_id"]: r for r in out.collect()}
    assert len(rows) == bank.count() + cu.count()
    # CU M&A (old_ncua_id 70_000-70_002): the retired old name is NOT in
    # DNB → old side manual (-1); the active parent resolves → 'changed'
    cu_rows = [rows[k] for k in rows if 70_000 <= k < 80_000]
    assert cu_rows
    for r in cu_rows:
        assert r["old_gdun"] == -1
        assert r["new_gdun"] > 0
        assert r["transition_ind"] == "changed"
    # bank merger chain events (fdic_id 3_000+): both sides real DNB groups
    chain = [rows[k] for k in rows if k < 70_000 and rows[k]["old_gdun"] > 0]
    assert chain, "no resolvable bank chain events"
    assert all(r["new_gdun"] > 0 for r in chain)
