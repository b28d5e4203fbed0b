#!/usr/bin/env python
"""Round-7 optimization harness (guide §1.4): per-query noop-sink isolation.

NOT the driver bench — bench.py is frozen. This times individual declared
queries with the noop sink (computes every column, no sink cost), labels jobs,
and can dump .explain("formatted") to plans/r07/.

  python bench_extra.py --sf DIR --queries a,b,c [--reps N] [--explain TAG]

TAG names the plan file suffix: plans/r07/<query>_<TAG>.txt
"""
from __future__ import annotations

import argparse
import io
import json
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--count", action="store_true",
                    help="time .count() like the frozen bench instead of noop")
    args = ap.parse_args()

    import __spark_entry__ as em
    from gduns_name_match_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", cores=args.cpus)
    qs = em.queries()
    # warm JVM + python workers
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, list[float]] = {}
    for name in args.queries.split(","):
        fn = qs[name]
        if args.explain:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            p = Path(__file__).parent / "plans" / "r07" / f"{name}_{args.explain}.txt"
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(buf.getvalue())
        walls = []
        n = None
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.count:
                n = df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
                n = None
            walls.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = walls
        print(f"## {name}: {walls} rows={n}", file=sys.stderr, flush=True)
    print(json.dumps({"sf": args.sf, "walls": out}))
    spark.stop()


if __name__ == "__main__":
    main()
