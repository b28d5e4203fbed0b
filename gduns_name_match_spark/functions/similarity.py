"""Pairwise string-similarity kernels: Arrow-batched pandas UDFs.

Replicates the reference's vectorization + distance semantics
(char n-gram tokenizer automation_final2.py:373-384, TfidfVectorizer fit
automation_final2.py:387-395, cosine 1-NN probe automation_final2.py:396-397)
without any global fitted model: the IDF table is computed with a DataFrame
aggregation over the registry and broadcast; the cosine is evaluated per
candidate pair inside a pandas UDF. Per BASELINE.json north_star the pair
score additionally carries Jaro-Winkler and token-set-ratio diagnostics.

Reference quirks (verified against its source; see tests/test_scoring.py):

* The tokenizer strips ``[,-./]|\\sBD`` before n-gramming — a no-op on
  already-compressed names (no punctuation/spaces survive preprocess_text),
  replicated anyway.
* The "weighted special tokens" map {'creditunion','federalcreditunion',
  'bank'}→1 (automation_final2.py:373,391-395) is dead code twice over: the
  weights equal the default 1, and 11+-char tokens can never appear among
  1/2/3-grams. Not replicated.
* sklearn defaults the reference relies on: smooth_idf=True, sublinear_tf
  =False, norm=None ⇒ idf(t) = ln((1+n)/(1+df(t))) + 1, tf = raw count,
  cosine on the unnormalized tf·idf vectors. Out-of-vocabulary query n-grams
  are dropped (sklearn ``transform`` ignores unseen terms).
"""

from __future__ import annotations

import math
import re
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NGRAM_SIZES = (1, 2, 3)
_STRIP_RE = re.compile(r"[,-./]|\sBD")


def char_ngrams(s: str, sizes: tuple[int, ...] = NGRAM_SIZES) -> list[str]:
    """Character n-grams after the reference's strip step (automation_final2.py:374)."""
    s = _STRIP_RE.sub("", s or "")
    out: list[str] = []
    for n in sizes:
        out.extend(s[i : i + n] for i in range(len(s) - n + 1))
    return out


_NGRAMS_SCHEMA = T.ArrayType(T.StringType())


@F.pandas_udf(_NGRAMS_SCHEMA)
def ngrams_udf(names: pd.Series) -> pd.Series:
    """array<string> of char 1/2/3-grams per name (Arrow-batched)."""
    return names.map(lambda s: char_ngrams(s if isinstance(s, str) else ""))


def build_idf(registry_names: DataFrame, name_col: str = "norm_name") -> dict[str, float]:
    """Smooth-IDF table over one registry's name column.

    df(t) counts rows (documents) containing t at least once — matching
    sklearn's document frequency on the same column, duplicates included.
    Executed as explode(array_distinct(...)) → groupBy count: one narrow
    shuffle whose key space is bounded by the char-trigram vocabulary
    (≲ 40^3 entries), so the resulting map broadcasts at any data scale.
    """
    n_docs = registry_names.count()
    rows = (
        registry_names.select(
            F.explode(F.array_distinct(ngrams_udf(F.col(name_col)))).alias("ngram")
        )
        .groupBy("ngram")
        .agg(F.count("*").alias("df"))
        .collect()
    )
    return {
        r["ngram"]: math.log((1.0 + n_docs) / (1.0 + r["df"])) + 1.0 for r in rows
    }


@lru_cache(maxsize=262144)
def _tfidf_vector(name: str, idf_key: str) -> tuple[dict[str, float], float]:
    """(sparse tf·idf vector, L2 norm) for one compressed name; per-executor cache."""
    idf = _IDF_REGISTRY[idf_key]
    vec: dict[str, float] = {}
    for g in char_ngrams(name):
        w = idf.get(g)
        if w is not None:
            vec[g] = vec.get(g, 0.0) + w
    norm = math.sqrt(sum(v * v for v in vec.values()))
    return vec, norm


# Per-executor-process registry of IDF dicts, keyed by a driver-issued token,
# so the lru_cache key stays a small hashable instead of the dict itself.
# IMPORTANT: only mutate via _register_idf — a closure shipped by cloudpickle
# gets a *copy* of referenced global data, so writes from inside a UDF body
# would land in the copy, not here.
_IDF_REGISTRY: dict[str, dict[str, float]] = {}
_TOKEN_COUNTER = iter(range(1, 1 << 31))


def _register_idf(idf_key: str, idf: dict[str, float]) -> None:
    """Runs on the executor in the real module namespace (by-reference pickle)."""
    _IDF_REGISTRY[idf_key] = idf


def _new_token(tag: str) -> str:
    return f"{tag}-{next(_TOKEN_COUNTER)}"


def _cosine_dist(a: str, b: str, idf_key: str) -> float:
    va, na = _tfidf_vector(a, idf_key)
    vb, nb = _tfidf_vector(b, idf_key)
    if na == 0.0 or nb == 0.0:
        return 1.0
    if len(vb) < len(va):
        va, vb = vb, va
    dot = sum(w * vb.get(g, 0.0) for g, w in va.items())
    return 1.0 - dot / (na * nb)


_JW_CAP = 64  # O(len^2) scan; names are short, document-length inputs capped


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1) -> float:
    """Standard Jaro-Winkler similarity in [0, 1] (diagnostic column; inputs
    longer than _JW_CAP chars are prefix-capped — the cosine acceptor, not JW,
    decides matches)."""
    if a == b:
        return 1.0
    a, b = a[:_JW_CAP], b[:_JW_CAP]
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[k]:
                k += 1
            if a[i] != b[k]:
                transpositions += 1
            k += 1
    transpositions //= 2
    jaro = (
        matches / la + matches / lb + (matches - transpositions) / matches
    ) / 3.0
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca == cb:
            prefix += 1
        else:
            break
    return jaro + prefix * prefix_weight * (1.0 - jaro)


def token_set_ratio(a: str, b: str) -> float:
    """Token-set similarity in [0, 1].

    Inputs here are compressed names (preprocess_text removes all spaces), so
    word-level token sets are degenerate; the token unit is the char trigram
    set — Jaccard over 3-gram sets, which is both O(n) and meaningful on
    squashed strings. (Diagnostic only: the acceptor is cosine <= 0.2.)"""
    ta = {a[i : i + 3] for i in range(max(len(a) - 2, 0))} or ({a} if a else set())
    tb = {b[i : i + 3] for i in range(max(len(b) - 2, 0))} or ({b} if b else set())
    if not ta and not tb:
        return 1.0
    union = len(ta | tb)
    return len(ta & tb) / union if union else 0.0


PAIR_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("cos_dist", T.DoubleType()),
        T.StructField("jw_sim", T.DoubleType()),
        T.StructField("token_set", T.DoubleType()),
    ]
)


def make_pair_scorer(spark: SparkSession, idf: dict[str, float]):
    """Build the batched pair-scoring pandas UDF with this registry's IDF.

    Returns a UDF (left_name, right_name) → struct(cos_dist, jw_sim,
    token_set). The IDF map ships to executors as a Spark broadcast once per
    registry; vectors are memoized per unique string per executor, so a hot
    registry name is vectorized once, not once per candidate pair.
    """
    bc = spark.sparkContext.broadcast(idf)
    token = _new_token("pair")

    @F.pandas_udf(PAIR_SCORE_SCHEMA)
    def score_pairs(left: pd.Series, right: pd.Series) -> pd.DataFrame:
        key = token
        _register_idf(key, bc.value)
        n = len(left)
        cos = np.empty(n)
        jw = np.zeros(n)
        tsr = np.zeros(n)
        lvals = left.fillna("").to_numpy()
        rvals = right.fillna("").to_numpy()
        for i in range(n):
            a, b = lvals[i], rvals[i]
            c = _cosine_dist(a, b, key)
            cos[i] = c
            # JW/token-set are diagnostics on plausible pairs; computing them
            # for clearly-rejected candidates (cos > 0.5) would triple the
            # kernel cost for rows the 0.2 acceptor discards anyway
            if c <= 0.5:
                jw[i] = jaro_winkler(a, b)
                tsr[i] = token_set_ratio(a, b)
        return pd.DataFrame({"cos_dist": cos, "jw_sim": jw, "token_set": tsr})

    return score_pairs


def make_cosine_udf(spark: SparkSession, idf: dict[str, float]):
    """Cosine-distance-only variant (cheaper; used for city/state tie-breaks,
    replicating the reference's per-group secondary probes
    automation_final2.py:437-441,687-691)."""
    bc = spark.sparkContext.broadcast(idf)
    token = _new_token("cos")

    @F.pandas_udf(T.DoubleType())
    def cosine_dist(left: pd.Series, right: pd.Series) -> pd.Series:
        key = token
        _register_idf(key, bc.value)
        lvals = left.fillna("").to_numpy()
        rvals = right.fillna("").to_numpy()
        return pd.Series([_cosine_dist(a, b, key) for a, b in zip(lvals, rvals)])

    return cosine_dist
