"""A/B: does persisting the chain-candidate frame (cp) speed the cascade?

VERDICT r05 task 5 / 'what's wrong' #2: single_b / loop_rows / cp feed ~10
consumers and re-execute per consumer inside the one decision job. Measures
run_cascade wall on the deterministic fixture corpus with persist_chain
on/off, alternating reps (host-mode fairness), fresh cache each rep.

Usage: python scripts/ab_chain_persist.py [n_docs] [reps]
"""
from __future__ import annotations

import sys
import time

from gduns_name_match_spark.session import get_spark
from gduns_name_match_spark.plans.cascade import run_cascade
from gduns_name_match_spark.sources import fixtures as fx


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ab-chain-persist")
    f = fx.generate(n_docs=n_docs, seed=5)
    mentions = fx.truth_df(spark, f).select(
        "mention_id", "raw_name", "city", "state"
    ).localCheckpoint()
    regs = fx.registries(spark, f)
    walls: dict[bool, list[float]] = {True: [], False: []}
    # unrecorded warm-up (parquet footers, UDF workers)
    run_cascade(spark, mentions, regs, persist_chain=True).count()
    spark.catalog.clearCache()
    for rep in range(reps):
        for knob in (False, True) if rep % 2 == 0 else (True, False):
            t0 = time.perf_counter()
            out = run_cascade(spark, mentions, regs, persist_chain=knob)
            n = out.count()
            walls[knob].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            print(f"rep={rep} persist_chain={knob} rows={n} "
                  f"wall={walls[knob][-1]:.2f}s", flush=True)
    for knob in (False, True):
        w = sorted(walls[knob])
        print(f"persist_chain={knob}: min={w[0]:.2f} med={w[len(w)//2]:.2f} "
              f"all={[round(x, 2) for x in w]}")


if __name__ == "__main__":
    main()
