#!/usr/bin/env python
"""Generate a LOCAL sf1.0-shaped measurement corpus under /tmp.

The driver's round-end bench escalated to a driver-generated sf1.0
(BENCH_r06.json: 50k-doc documents table by row-count extrapolation) that is
not present under /root/testdata. This script builds a distribution-matched
mimic — same 30-word vocabulary, same uniform(10,100) token lengths, same
~5% planted near-dup rate with the 'dup' marker token — so sf1.0-scale
behavior (shingle-df growth, block-size growth) is measurable locally.

MEASUREMENT ONLY: never read by bench.py or any declared query; lives in
/tmp; /root/testdata stays untouched (read-only per TESTDATA.md).

Usage: python scripts/make_sf_mimic.py [n_docs] [outdir]
"""
import sys
from pathlib import Path

import numpy as np
import pandas as pd

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
OUT = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(f"/tmp/sfmimic_{N}")

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "en", "zh", "es", "fr", "de"]

rng = np.random.default_rng(4242)
OUT.mkdir(parents=True, exist_ok=True)

texts = []
for i in range(N):
    if i > 0 and rng.random() < 0.05:
        # near-dup of a random earlier doc: one token flipped to 'dup'
        base = texts[rng.integers(0, i)].split(" ")
        j = rng.integers(0, len(base))
        base = list(base)
        base[j] = "dup"
        texts.append(" ".join(base))
    else:
        n_tok = rng.integers(10, 101)
        texts.append(" ".join(rng.choice(VOCAB, size=n_tok)))

docs = pd.DataFrame(
    {
        "doc_id": np.arange(N, dtype=np.int64),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, len(LANGS), N)],
        "source": [f"src{i}" for i in rng.integers(0, 20, N)],
    }
)
docs["n_chars"] = docs.text.str.len().astype("int64")
docs.to_parquet(OUT / "documents.parquet", index=False)

n_vec = max(2_000, N * 2000 // 5000)
centers = rng.normal(size=(10, 64))
lab = rng.integers(0, 10, n_vec)
emb = centers[lab] + 0.3 * rng.normal(size=(n_vec, 64))
pd.DataFrame(
    {
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": [r.astype(np.float32) for r in emb],
        "label": lab.astype(np.int32),
    }
).to_parquet(OUT / "embeddings.parquet", index=False)

# relational tables: symlink the sf0.1 versions (their queries are sub-second
# at any sf; only documents/embeddings drive the expensive entries)
for t in (
    "customer", "lineitem", "nation", "orders", "part", "region",
    "supplier", "events",
):
    dst = OUT / f"{t}.parquet"
    if not dst.exists():
        dst.symlink_to(f"/root/testdata/sf0.1/{t}.parquet")
print(f"wrote {N} docs + {n_vec} vectors to {OUT}")
