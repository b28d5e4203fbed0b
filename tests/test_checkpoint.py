"""Resume semantics: stage checkpoints are atomic, lineage rows exist per
partition, and a restart after a partial run produces identical results
without recomputing committed stages."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from gduns_name_match_spark.plans.checkpoint import StageCheckpointer, checkpointed_match
from gduns_name_match_spark.sources import fixtures as fx


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="gduns_ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stage_commit_and_resume(spark, tmp_root):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100).withColumn("v", F.col("id") * 2)

    ck = StageCheckpointer(spark, tmp_root, "r1")
    a = ck.stage("s1", build, key_col="id")
    assert a.count() == 100 and calls["n"] == 1
    # second run (fresh checkpointer, same root): no recompute
    ck2 = StageCheckpointer(spark, tmp_root, "r1")
    b = ck2.stage("s1", build, key_col="id")
    assert b.count() == 100 and calls["n"] == 1
    assert ck2.metrics["s1"]["resumed"] is True
    # lineage rows cover all rows
    lin = ck2.lineage("s1")
    assert lin.agg(F.sum("rows")).collect()[0][0] == 100
    assert {"partition_id", "rows", "key_min", "key_max"} <= set(lin.columns)


def test_crash_before_manifest_recomputes(spark, tmp_root):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10)

    ck = StageCheckpointer(spark, tmp_root, "r1")
    ck.stage("s1", build)
    # simulate a crash that wrote data but died before the manifest publish
    manifest = Path(tmp_root) / "r1" / "s1" / "manifest.json"
    manifest.unlink()
    ck2 = StageCheckpointer(spark, tmp_root, "r1")
    ck2.stage("s1", build)
    assert calls["n"] == 2  # uncommitted stage re-ran
    assert ck2.metrics["s1"]["resumed"] is False


def test_checkpointed_match_resume_identical(spark, tmp_root):
    f = fx.generate(n_docs=80, seed=11)
    docs, reg = fx.documents_df(spark, f), fx.registry_df(spark, f)

    _, _, d1, ck1 = checkpointed_match(spark, docs, reg, tmp_root, "match1")
    first = sorted(
        (r["mention_id"], r["gdun"], r["match_status"])
        for r in d1.select("mention_id", "gdun", "match_status").collect()
    )
    assert all(not m["resumed"] for m in ck1.summary().values())

    # restart: all stages resumed from committed parquet, identical output
    _, _, d2, ck2 = checkpointed_match(spark, docs, reg, tmp_root, "match1")
    second = sorted(
        (r["mention_id"], r["gdun"], r["match_status"])
        for r in d2.select("mention_id", "gdun", "match_status").collect()
    )
    assert first == second
    assert all(m["resumed"] for m in ck2.summary().values())
