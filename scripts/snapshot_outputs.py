#!/usr/bin/env python
"""Full-output regression snapshots for declared queries (round-7 protocol).

Collects each query's complete output, canonicalizes rows to strings (floats
via repr, so ULP drift is visible), sorts, and writes one text file per
(query, sf) under the given snapshot dir. `diff -r` between two snapshot dirs
then proves bit-identical results — or shows exactly which values drifted.

Usage: python scripts/snapshot_outputs.py OUTDIR QUERY[,QUERY..] SF[,SF..]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    outdir = Path(sys.argv[1])
    queries = sys.argv[2].split(",")
    sfs = sys.argv[3].split(",")
    outdir.mkdir(parents=True, exist_ok=True)

    import __spark_entry__ as em
    from gduns_name_match_spark.session import get_spark

    spark = get_spark(app_name="snapshot", cores=32)
    qs = em.queries()
    for sf in sfs:
        tag = sf.rstrip("/").rsplit("/", 1)[-1]
        for name in queries:
            df = qs[name](spark, sf)
            rows = df.collect()
            lines = sorted(
                "\x1f".join(repr(v) for v in row) for row in rows
            )
            p = outdir / f"{name}__{tag}.txt"
            p.write_text("\n".join(lines) + "\n")
            print(f"{p}  rows={len(rows)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
