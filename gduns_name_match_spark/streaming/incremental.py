"""Streaming / incremental-batch surface.

The reference is batch-only (SURVEY.md §2.11): its temporal machinery is the
max(effdate) watermark pull (fdic_events.py:32-34) and NEW_EVENT_IND flags.
Two Spark-native equivalents live here:

* ``incremental_match_batch`` — the production path at 10^12 docs: each run
  matches only documents newer than the committed watermark and appends to
  the decisions sink (idempotent by mention_id anti-join), mirroring the
  reference's temp2-is-null resume semantics (spnv_match_file.py:34).
* ``streaming_event_counts`` — genuine Structured Streaming: file-source
  stream over a documents/events directory with a watermark + windowed
  aggregation, Trigger.AvailableNow so tests drain it deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _sink_exists(spark: SparkSession, path: str) -> bool:
    """Scheme-aware existence check through the JVM Hadoop FileSystem —
    resolves hdfs://, s3a://, file: and bare local paths identically to the
    reader that will consume the sink. Errors (bad credentials, unreachable
    namenode) propagate: only a definite 'not there yet' may skip the
    idempotency anti-join."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    return bool(fs.exists(jpath))


def incremental_match_batch(
    spark: SparkSession,
    new_documents: DataFrame,
    registry: DataFrame,
    decisions_sink_path: str,
    **match_kwargs,
) -> DataFrame:
    """Match only not-yet-decided mentions and append to the sink.

    Resume semantics: mention_ids already present in the sink are anti-joined
    away, so re-running after a partial failure never duplicates rows — the
    DataFrame version of the reference's flag-column checkpointing."""
    from gduns_name_match_spark.plans.pipeline import match_documents

    res = match_documents(spark, new_documents, registry, **match_kwargs)
    decisions = res.decisions
    # explicit existence check, NOT a bare except: a corrupt/unreadable sink
    # must raise, or the anti-join silently skips and rows duplicate.
    # Hadoop FileSystem (not os.path.exists): the sink may be hdfs://, s3a://
    # or a file: URI — a local-only check would return False there, skip the
    # anti-join, and silently re-append duplicate decisions on every rerun.
    if _sink_exists(spark, decisions_sink_path):
        existing = spark.read.parquet(decisions_sink_path).select("mention_id")
        decisions = decisions.join(existing, "mention_id", "left_anti")
    decisions.write.mode("append").parquet(decisions_sink_path)
    # the write materialized everything — drop the pipeline's persisted
    # frames, or a long-running caller (the streaming wrapper runs this per
    # micro-batch) accumulates cached registry/pair frames forever
    res.release()
    return spark.read.parquet(decisions_sink_path)


DOCUMENT_STREAM_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def streaming_match_documents(
    spark: SparkSession,
    docs_dir: str,
    registry: DataFrame,
    checkpoint_dir: str,
    decisions_sink_path: str,
    **match_kwargs,
):
    """Streaming ER: a file-source stream of interleaved documents where
    every micro-batch runs the FULL match pipeline (blocking → scoring →
    resolve) and appends idempotently to the decisions sink — the live
    ingest shape of the flagship job.

    foreachBatch, not an in-stream operator chain: the pipeline is a
    multi-job DAG (per-key stats, a measured broadcast decision, an eager
    cache materialization) that cannot execute inside one streaming stage.
    The streaming checkpoint tracks consumed source files (at-least-once on
    failure); the sink-side mention_id anti-join inside
    ``incremental_match_batch`` absorbs replays, so the composition is
    effectively-once — the same two-layer contract the reference's
    temp2-is-null resume gives its batch reruns (spnv_match_file.py:34).
    The registry joins in as an ordinary static frame (stream-static join
    happens per batch inside the pipeline)."""

    def _match_batch(batch_df: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        if not batch_df.isEmpty():
            incremental_match_batch(
                spark, batch_df, registry, decisions_sink_path, **match_kwargs
            )

    stream = spark.readStream.schema(DOCUMENT_STREAM_SCHEMA).parquet(docs_dir)
    return (
        stream.writeStream.foreachBatch(_match_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup_documents(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    watermark: str = "2 hours",
):
    """Streaming exact dedup: emit each doc_id at most once within the
    watermark horizon (dropDuplicatesWithinWatermark — state-store-backed,
    watermark-evicted, so state is bounded at any stream length; plain
    dropDuplicates would keep every key forever). The streaming twin of
    operators/training.q_dedup_exact for a live ingest pipeline.
    """
    stream = (
        spark.readStream.schema("doc_id string, ts timestamp, text string")
        .parquet(docs_dir)
    )
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["doc_id"]
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_running_user_totals(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_dir: str,
):
    """Custom stateful streaming operator via applyInPandasWithState: a
    running per-user (event count, value sum) carried in the state store
    across micro-batches AND across restarts (the checkpoint holds the
    state) — the shape any bespoke streaming accumulator takes when the
    built-in windowed aggregations can't express it.
    """
    import pandas as pd  # noqa: F401 (worker-side import)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [total]}
        )

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .parquet(events_dir)
    )
    totals = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n_events long, sum_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # file sinks are append-only; update-mode rows land as a CHANGELOG via
    # foreachBatch (latest row per user = current running total)
    def _append_batch(batch_df, batch_id):  # noqa: ARG001
        batch_df.write.mode("append").parquet(out_dir)

    return (
        totals.writeStream.outputMode("update")
        .foreachBatch(_append_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_event_counts(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Windowed event counts as a real Structured Streaming job.

    File source → withWatermark → window agg → parquet sink, drained with
    Trigger.AvailableNow (deterministic in tests; the same query runs
    continuously against a live directory/Kafka source on a cluster).
    Returns the StreamingQuery; caller awaits termination.
    """
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .parquet(events_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
