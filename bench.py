#!/usr/bin/env python
"""Benchmark harness (driver contract): one JSON line on stdout.

  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[k] parallelism (default 32)
  SPARK_GRAFT_BENCH_DOCS  fixture corpus size for the ER scoring bench
                          (default 20000 mentions-ish)

  python bench.py             # per-round driver mode: one JSON line
  python bench.py --scaling   # north-rule evidence: same job at local[8]
                              # and local[32]; appends results to BENCH.md

Headline metric: candidate-pairs-scored/sec through the full blocking →
salted join → Arrow-batched scoring path (BASELINE.json north_rule), plus
per-query wall times for representative operators on the testdata tables.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
FIXTURE_DIR = Path(f"/tmp/gduns_bench_fixture_{BENCH_DOCS}")


def prepare_fixture(spark) -> None:
    """Materialize the deterministic ER bench corpus as parquet once, so the
    timed job measures the pipeline, not driver-side data generation."""
    from gduns_name_match_spark.sources import fixtures as fx

    if (FIXTURE_DIR / "_SUCCESS_MARKER").exists():
        return
    f = fx.generate(
        n_docs=BENCH_DOCS, seed=42, n_groups=max(200, BENCH_DOCS // 5), typos=True
    )
    fx.documents_df(spark, f, partitions=max(CPUS, 8)).write.mode("overwrite").parquet(
        str(FIXTURE_DIR / "documents")
    )
    fx.registry_df(spark, f).write.mode("overwrite").parquet(
        str(FIXTURE_DIR / "registry")
    )
    (FIXTURE_DIR / "_SUCCESS_MARKER").touch()


def run_er_scoring(spark) -> tuple[int, float, float]:
    """(pairs_scored, seconds, pairs/sec) through block→pair→score→resolve."""
    from pyspark.sql import functions as F

    from gduns_name_match_spark.plans.pipeline import match_documents

    docs = spark.read.parquet(str(FIXTURE_DIR / "documents"))
    reg = spark.read.parquet(str(FIXTURE_DIR / "registry"))
    t0 = time.perf_counter()
    res = match_documents(spark, docs, reg)
    n_pairs = res.pairs_scored.count()
    n_decided = res.decisions.filter(F.col("gdun") > 0).count()
    dt = time.perf_counter() - t0
    assert n_decided > 0
    return n_pairs, dt, n_pairs / dt


def run_queries(spark) -> dict[str, float]:
    """Representative operators timed on the driver's testdata tables."""
    import __spark_entry__ as em

    names = [
        "broadcast_join_agg",
        "window_top1",
        "group_collapse",
        "capped_distinct_list",
        "dedup_exact",
        "minhash_lsh_pairs",
        "simhash",
        "embedding_topk",
        "embedding_lsh_topk",
        "text_quality",
        "er_neardup_decisions",
    ]
    qs = em.queries()
    out: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).count()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def bench_once(cpus: int, with_queries: bool) -> dict:
    from gduns_name_match_spark.session import get_spark

    spark = get_spark(app_name=f"gduns-bench-{cpus}", cores=cpus)
    try:
        prepare_fixture(spark)
        # warm the JVM/Python workers so the timed run measures steady state
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        n_pairs, dt, pps = run_er_scoring(spark)
        result = {
            "cpus": cpus,
            "pairs_scored": n_pairs,
            "er_seconds": round(dt, 3),
            "pairs_per_sec": round(pps, 1),
        }
        if with_queries:
            result["queries"] = run_queries(spark)
        return result
    finally:
        spark.stop()


def main() -> None:
    scaling = "--scaling" in sys.argv
    if scaling:
        low = bench_once(8, with_queries=False)
        high = bench_once(32, with_queries=True)
        eff = high["pairs_per_sec"] / (4.0 * low["pairs_per_sec"])
        payload = {
            "metric": "candidate_pairs_scored_per_sec",
            "value": high["pairs_per_sec"],
            "unit": "sec",
            "queries": high["queries"],
            "sf": SF_DIR,
            "pairs_scored": high["pairs_scored"],
            "er_seconds": high["er_seconds"],
            "local8_pairs_per_sec": low["pairs_per_sec"],
            "local32_pairs_per_sec": high["pairs_per_sec"],
            "scaling_efficiency_8_to_32": round(eff, 3),
        }
        with open("BENCH.md", "a") as fh:
            fh.write(
                f"\n| {time.strftime('%Y-%m-%d %H:%M:%S')} | {BENCH_DOCS} docs | "
                f"local[8]: {low['pairs_per_sec']:.0f} p/s | "
                f"local[32]: {high['pairs_per_sec']:.0f} p/s | "
                f"efficiency {eff:.3f} |\n"
            )
    else:
        res = bench_once(CPUS, with_queries=True)
        payload = {
            "metric": "candidate_pairs_scored_per_sec",
            "value": res["pairs_per_sec"],
            "unit": "sec",
            "queries": res["queries"],
            "sf": SF_DIR,
            "pairs_scored": res["pairs_scored"],
            "er_seconds": res["er_seconds"],
            "cpus": res["cpus"],
        }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
