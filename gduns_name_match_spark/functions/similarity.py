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
import zlib
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


def char_ngrams_col(name_col) -> Column:
    """``char_ngrams`` as a pure Catalyst expression — identical output
    (same strip, same 1/2/3-gram inventory, same order), zero Python.

    One overlapping-window regexp_extract_all lookahead per n (codegen'd;
    the round-2 measurement: HOF/lambda chains run interpreted, a zero-width
    lookahead extraction does not). Used on the IDF hot path so building a
    registry IDF costs no Python-worker round trip; ngrams_udf stays for
    consumers that want the kernel-identical Python path.

    Java-vs-Python regex flags make the parity real on RAW text too, not
    just normalized alnum strings: (?U) gives Java's \\s the Unicode
    semantics Python's has (NBSP etc.), (?s) lets '.' cross newlines like
    Python slicing does — without them a 'foo\\nbar' value would lose every
    gram spanning the newline only on the Catalyst side, silently skewing
    IDF weights against the Python-built vectors."""
    stripped = F.regexp_replace(
        F.coalesce(name_col, F.lit("")), r"(?U)[,-./]|\sBD", ""
    )
    per_n = [
        F.regexp_extract_all(stripped, F.lit(f"(?s)(?=({'.' * n}))"), 1)
        for n in NGRAM_SIZES
    ]
    return F.concat(*per_n)


def build_idf(registry_names: DataFrame, name_col: str = "norm_name") -> dict[str, float]:
    """Smooth-IDF table over one registry's name column.

    df(t) counts rows (documents) containing t at least once — matching
    sklearn's document frequency on the same column, duplicates included.
    Executed as explode(array_distinct(...)) → groupBy count: one narrow
    shuffle whose key space is bounded by the char-trigram vocabulary
    (≲ 40^3 entries), so the resulting map broadcasts at any data scale.
    ONE pass: a per-row marker token rides the same explode, so n_docs comes
    out of the same aggregation instead of a second scan of the registry.
    """
    marker = "\x00DOC\x00"  # \x00 cannot appear in an n-gram of a real name
    grams = F.coalesce(
        F.array_distinct(char_ngrams_col(F.col(name_col))),
        F.array().cast("array<string>"),
    )
    rows = (
        registry_names.select(
            F.explode(F.concat(F.array(F.lit(marker)), grams)).alias("ngram")
        )
        .groupBy("ngram")
        .agg(F.count("*").alias("df"))
        .collect()
    )
    counts = {r["ngram"]: r["df"] for r in rows}
    n_docs = counts.pop(marker, 0)
    return {
        g: math.log((1.0 + n_docs) / (1.0 + df)) + 1.0 for g, df in counts.items()
    }


def build_idf_by_tag(
    tagged_names: DataFrame, tag_col: str = "tag", name_col: str = "norm_name"
) -> dict[str, dict[str, float]]:
    """Per-registry smooth-IDF tables in ONE aggregation pass.

    The reference fits one TfidfVectorizer per registry TABLE — duplicates
    included (create_KNN(dnb['NAME']) etc., automation_final2.py:400-407) —
    so df(t) here counts rows per (tag, gram) over the non-distinct name
    column. Same single-shuffle shape as build_idf, keyed by (tag, ngram);
    the per-tag marker row carries n_docs. Output: {tag: {gram: idf}}."""
    marker = "\x00DOC\x00"
    grams = F.coalesce(
        F.array_distinct(char_ngrams_col(F.col(name_col))),
        F.array().cast("array<string>"),
    )
    rows = (
        tagged_names.select(
            F.col(tag_col).alias("_tag"),
            F.explode(F.concat(F.array(F.lit(marker)), grams)).alias("ngram"),
        )
        .groupBy("_tag", "ngram")
        .agg(F.count("*").alias("df"))
        .collect()
    )
    counts: dict[str, dict[str, int]] = {}
    for r in rows:
        counts.setdefault(r["_tag"], {})[r["ngram"]] = r["df"]
    out: dict[str, dict[str, float]] = {}
    for tag, cmap in counts.items():
        n_docs = cmap.pop(marker, 0)
        out[tag] = {
            g: math.log((1.0 + n_docs) / (1.0 + df)) + 1.0
            for g, df in cmap.items()
        }
    return out


def fit_idf_local(docs: list[str]) -> dict[str, float]:
    """Smooth IDF over a small in-memory document list — the per-group re-fit
    of the reference's city tie-break (TfidfVectorizer().fit(matc.CITY),
    automation_final2.py:437-441): same formula as build_idf, computed
    without a Spark job. df counts rows, duplicates included, exactly like a
    fit on the group's city column."""
    n = len(docs)
    df_counts: dict[str, int] = {}
    for d in docs:
        for g in set(char_ngrams(d or "")):
            df_counts[g] = df_counts.get(g, 0) + 1
    return {
        g: math.log((1.0 + n) / (1.0 + df)) + 1.0 for g, df in df_counts.items()
    }


def cosine_dist_local(a: str, b: str, idf: dict[str, float]) -> float:
    """Cosine distance under a given IDF table, pure Python — for per-group
    re-fit batches (a handful of short city strings), where building numpy
    vectors would cost more than the dot product saves. Same semantics as
    the batched kernel: tf·idf accumulation, OOV grams dropped, empty
    vectors at distance 1."""

    def vec(s: str) -> dict[str, float]:
        acc: dict[str, float] = {}
        for g in char_ngrams(s or ""):
            w = idf.get(g)
            if w is not None:
                acc[g] = acc.get(g, 0.0) + w
        return acc

    va, vb = vec(a), vec(b)
    if not va or not vb:
        return 1.0
    dot = sum(w * vb[g] for g, w in va.items() if g in vb)
    na = math.sqrt(sum(w * w for w in va.values()))
    nb = math.sqrt(sum(w * w for w in vb.values()))
    if dot == 0.0 or na == 0.0 or nb == 0.0:
        return 1.0
    return 1.0 - dot / (na * nb)


def _gram_hash(g: str) -> int:
    """Stable 64-bit-ish id for an n-gram: crc32 composed with length+first
    char, collision-free in practice for the <=40^3 char-trigram vocabulary
    (and a collision would only merge two grams deterministically on both
    sides of every pair). Round 7: no longer the kernel's gram identity (the
    vocabulary POSITION is — see _tfidf_vector); kept for reference/tests."""
    return (len(g) << 40) | (ord(g[0]) << 32) | zlib.crc32(g.encode())


# Vectorized gram matching (round 7): every 1/2/3-gram is mapped to one
# int64 code — a length-prefixed base-0x110000 positional encoding of its
# code points (injective for ALL unicode strings up to 3 chars; max value
# ~2.8e18 < 2^63) — and matched against the registry vocabulary with one
# searchsorted instead of ~n dict lookups + _gram_hash calls per name. The
# per-gram Python loop was the round-6 profile's single hottest path for
# prose-length strings (~1 ms/vector — prose vectors are not memoized, so
# the near-dup flagship rebuilt one per candidate pair; guide §4.2: hand
# whole batches to vectorized native code).
_CODE_BASE = np.int64(0x110000)


def _gram_code(g: str) -> int:
    c = 1
    for ch in g:
        c = c * 0x110000 + ord(ch)
    return c


# idf_key -> (sorted gram codes, idf weight per entry); built lazily from
# _IDF_REGISTRY so tests that poke dicts straight into the registry
# (test_blocking.py) keep working
_VOCAB_TABLES: dict[str, tuple] = {}


def _vocab_table(idf_key: str):
    tab = _VOCAB_TABLES.get(idf_key)
    if tab is None:
        idf = _IDF_REGISTRY[idf_key]
        vc = np.fromiter(
            (_gram_code(g) for g in idf), dtype=np.int64, count=len(idf)
        )
        vw = np.fromiter(idf.values(), dtype=np.float64, count=len(idf))
        order = np.argsort(vc)
        tab = (vc[order], vw[order])
        _VOCAB_TABLES[idf_key] = tab
    return tab


@lru_cache(maxsize=262144)
def _tfidf_vector(name: str, idf_key: str):
    """(sorted gram-id array, weight array, L2 norm) for one compressed
    name; per-executor cache for name-length strings.

    numpy representation instead of dict-of-str: the cache then holds two
    flat buffers per name (GC-untracked, cache-friendly) and the pair dot
    product becomes one C-level sorted intersection — this is what lets the
    scoring stage scale past ~8 concurrent workers (Python small-object
    churn saturates memory bandwidth well before the CPUs are busy).

    Construction is fully vectorized: gram codes via a utf-32 view of the
    stripped string, one searchsorted against the vocabulary table, then —
    round 7 — the matched VOCABULARY POSITIONS are the gram identity: a
    plain np.sort of the positions + run-length bounds yields tf per gram,
    and weight = idf × tf in one multiply. The earlier gram-HASH identity
    needed a stable argsort plus add.reduceat segment sums per vector —
    ~55 µs of the measured 110 µs/vector on prose (BENCH.md round-7
    profile); positions need only an int sort (~20 µs less) and are
    collision-free by construction where crc-based hashes were only
    collision-free in practice. idf×tf vs the old per-occurrence summation
    can differ in the last ulp — cos distances are compared against
    thresholds with macroscopic margins everywhere downstream, and the
    full-output regression snapshot (round 7) checks every declared query."""
    vc, vw = _vocab_table(idf_key)
    s = _STRIP_RE.sub("", name or "")
    if not s or len(vc) == 0:
        return _EMPTY_VEC
    a = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    parts = []
    for n in NGRAM_SIZES:  # same gram inventory and order as char_ngrams
        if len(a) >= n:
            c = np.full(len(a) - n + 1, 1, dtype=np.int64)
            for j in range(n):
                c = c * _CODE_BASE + a[j : len(a) - n + 1 + j]
            parts.append(c)
    if not parts:
        return _EMPTY_VEC
    codes = np.concatenate(parts)
    pos = np.searchsorted(vc, codes)
    pos[pos == len(vc)] = 0
    valid = vc[pos] == codes
    if not valid.any():
        return _EMPTY_VEC
    matched = np.sort(pos[valid])
    bounds = np.nonzero(np.r_[True, matched[1:] != matched[:-1]])[0]
    ids = matched[bounds]
    tf = np.diff(np.r_[bounds, len(matched)])
    weights = vw[ids] * tf
    norm = float(np.sqrt(np.dot(weights, weights)))
    return ids, weights, norm


_EMPTY_VEC = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64), 0.0)

# prose-length strings produce ~700-gram vectors (≈11 KB each): caching them
# costs GBs per worker at 32-way parallelism, while company names (the hot,
# endlessly-repeated case) stay tiny — so only name-length vectors memoize
_VEC_CACHE_MAX_LEN = 256


def _vector_for(name: str, idf_key: str):
    if len(name) <= _VEC_CACHE_MAX_LEN:
        return _tfidf_vector(name, idf_key)
    return _tfidf_vector.__wrapped__(name, idf_key)


# Per-executor-process registry of IDF dicts, keyed by a driver-issued token,
# so the lru_cache key stays a small hashable instead of the dict itself.
# IMPORTANT: only mutate via _register_idf — a closure shipped by cloudpickle
# gets a *copy* of referenced global data, so writes from inside a UDF body
# would land in the copy, not here.
_IDF_REGISTRY: dict[str, dict[str, float]] = {}
_TOKEN_COUNTER = iter(range(1, 1 << 31))


_GC_TUNED = False


def _tune_worker_gc() -> None:
    """Disable cyclic GC in executor workers (once per process).

    The per-worker vector cache grows to O(distinct names) small dicts; the
    generational collector rescans that heap on every threshold crossing, and
    at 32 concurrent workers those scans saturate memory bandwidth — measured
    20x slowdown of the scoring stage at local[32] vs local[8] (reproduced
    outside Spark: 32 procs building 60k-vector caches: 43s with GC, 11s
    without). Refcounting still reclaims everything acyclic; the cache is
    intentionally immortal, so we freeze the current heap and switch the
    cyclic collector off.
    """
    global _GC_TUNED
    if _GC_TUNED:
        return
    import gc

    gc.collect()
    gc.freeze()
    gc.disable()
    _GC_TUNED = True


_IDF_REGISTRY_CAP = 16  # concurrent scorers per executor; eviction is rare


def _register_idf(idf_key: str, idf: dict[str, float]) -> None:
    """Runs on the executor in the real module namespace (by-reference pickle).

    Bounded: beyond _IDF_REGISTRY_CAP entries the oldest is evicted and the
    vector cache cleared (its entries reference the evicted vocabulary) — a
    long-lived executor serving many registries must not leak one IDF dict
    per scorer ever built."""
    _tune_worker_gc()
    if idf_key in _IDF_REGISTRY:
        return
    if len(_IDF_REGISTRY) >= _IDF_REGISTRY_CAP:
        oldest = next(iter(_IDF_REGISTRY))
        del _IDF_REGISTRY[oldest]
        _VOCAB_TABLES.pop(oldest, None)
        _tfidf_vector.cache_clear()
    _IDF_REGISTRY[idf_key] = idf


def _new_token(tag: str) -> str:
    return f"{tag}-{next(_TOKEN_COUNTER)}"


def _cosine_and_overlap(a: str, b: str, idf_key: str) -> tuple[float, float]:
    """(cosine distance, distinct-gram Jaccard) in one sorted-merge pass.

    searchsorted instead of intersect1d: both hash arrays are pre-sorted, so
    the binary-search merge avoids intersect1d's concatenate+argsort and its
    ~10 temporaries per call — allocation rate is what bounds 32-way scaling
    on a single socket."""
    ha, wa, na = _vector_for(a, idf_key)
    hb, wb, nb = _vector_for(b, idf_key)
    if na == 0.0 or nb == 0.0:
        return 1.0, 0.0
    if len(ha) > len(hb):
        ha, wa, na, hb, wb, nb = hb, wb, nb, ha, wa, na
    idx = np.searchsorted(hb, ha)
    idx[idx == len(hb)] = 0
    mask = hb[idx] == ha
    n_inter = int(mask.sum())
    if n_inter == 0:
        return 1.0, 0.0
    dot = float(np.dot(wa[mask], wb[idx[mask]]))
    union = len(ha) + len(hb) - n_inter
    return 1.0 - dot / (na * nb), n_inter / union


def _cosine_dist(a: str, b: str, idf_key: str) -> float:
    return _cosine_and_overlap(a, b, idf_key)[0]


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

    Marked non-deterministic (round 7, guide §4.4) — the kernel is in fact
    deterministic, but every consumer filters on the score column, and the
    optimizer's filter pushdown then evaluates the UDF TWICE (one
    ArrowEvalPython under the pushed filter, a second in the projection
    re-computing the column for the survivors — both visible in
    plans/r07/er_neardup_scoring_before.txt (77)/(80)). The flag forbids the
    duplication, leaving one evaluation; accepted rows no longer pay the
    kernel twice.
    """
    bc = spark.sparkContext.broadcast(idf)
    token = _new_token("pair")

    @F.pandas_udf(PAIR_SCORE_SCHEMA)
    def score_pairs(left: pd.Series, right: pd.Series) -> pd.DataFrame:
        key = token
        _register_idf(key, bc.value)
        lvals = left.fillna("").to_numpy()
        rvals = right.fillna("").to_numpy()
        cos, jw, tsr = _score_batch(lvals, rvals, key)
        return pd.DataFrame({"cos_dist": cos, "jw_sim": jw, "token_set": tsr})

    return score_pairs.asNondeterministic()


# sentinel for empty vectors inside the batched kernel: one impossible gram
# id (real ids are vocabulary positions >= 0), weight 0 — keeps reduceat
# segments non-empty and strictly increasing
_SENTINEL_H = np.array([-1], dtype=np.int64)
_SENTINEL_W = np.array([0.0], dtype=np.float64)

# per-batch memo bound: prose vectors are ~11 KB; 16k entries caps the
# transient at ~180 MB per in-flight batch, freed when the batch returns
_BATCH_MEMO_MAX = 16384


def _score_batch(
    lvals: np.ndarray, rvals: np.ndarray, key: str, compute_jw: bool = True
):
    """Vectorized batch scoring: rows are grouped by probe name, each group
    scored with ONE searchsorted over the concatenated registry vectors and
    segment-reduced dots (np.add.reduceat) — per-pair numpy call overhead and
    allocation rate drop ~5x vs pair-at-a-time, which is what the 32-way
    memory-bandwidth ceiling responds to.

    The r-side vectors additionally memoize WITHIN the batch (round 7): on
    block-locality-ordered pair streams (see _accepted_pairs
    partition_by_probe=False) one registry text recurs across many adjacent
    probe groups, and prose-length vectors are too large for the global
    cache — without the memo every recurrence pays the full ~90 µs
    construction (the round-7 profile's dominant near-dup cost). Bounded;
    name-length strings still hit the global lru first via _vector_for."""
    n = len(lvals)
    cos = np.ones(n)
    jw = np.zeros(n)
    tsr = np.zeros(n)
    memo: dict = {}
    order = np.argsort(lvals, kind="stable")
    i = 0
    while i < n:
        probe = lvals[order[i]]
        j = i
        while j < n and lvals[order[j]] == probe:
            j += 1
        idxs = order[i:j]
        i = j
        ha, wa, na = _vector_for(probe, key)
        if na == 0.0:
            continue  # cos stays 1.0 for the whole group
        hb_list, wb_list, nb_arr, lens = [], [], [], []
        for k in idxs:
            rv = rvals[k]
            vec = memo.get(rv)
            if vec is None:
                hb, wb, nb = _vector_for(rv, key)
                if nb == 0.0 or len(hb) == 0:
                    vec = (_SENTINEL_H, _SENTINEL_W, 0.0)
                else:
                    vec = (hb, wb, nb)
                if len(memo) >= _BATCH_MEMO_MAX:
                    memo.clear()
                memo[rv] = vec
            hb, wb, nb = vec
            hb_list.append(hb)
            wb_list.append(wb)
            nb_arr.append(nb)
            lens.append(len(hb))
        hb_cat = np.concatenate(hb_list)
        wb_cat = np.concatenate(wb_list)
        pos = np.searchsorted(ha, hb_cat)
        pos[pos == len(ha)] = 0
        match = ha[pos] == hb_cat
        contrib = wa[pos] * wb_cat * match
        lens_np = np.asarray(lens, dtype=np.int64)
        starts = np.zeros(len(idxs), dtype=np.int64)
        np.cumsum(lens_np[:-1], out=starts[1:])
        dots = np.add.reduceat(contrib, starts)
        inters = np.add.reduceat(match.astype(np.int64), starts)
        nb_np = np.asarray(nb_arr)
        valid = nb_np > 0.0
        g_cos = np.ones(len(idxs))
        g_cos[valid] = 1.0 - dots[valid] / (na * nb_np[valid])
        union = len(ha) + lens_np - inters
        g_jac = np.where((union > 0) & valid, inters / np.maximum(union, 1), 0.0)
        cos[idxs] = g_cos
        tsr[idxs] = g_jac
    # JW is a diagnostic on plausible pairs only — computing it for
    # clearly-rejected candidates (cos > 0.5) would multiply the kernel cost
    # for rows the 0.2 acceptor discards anyway; cosine-only consumers (city/
    # HQ tie-breaks, where most pairs in a matched group ARE close) skip the
    # O(len^2) Python loop entirely via compute_jw=False
    if compute_jw:
        for k in np.nonzero(cos <= 0.5)[0]:
            jw[k] = jaro_winkler(lvals[k], rvals[k])
    return cos, jw, tsr


def make_tagged_cosine_udf(spark: SparkSession, idfs: dict[str, dict[str, float]]):
    """Cosine distance under a PER-TAG IDF table: (left, right, tag) →
    cos_dist, each row scored with its registry's own weights (the
    reference's one-vectorizer-per-registry semantics). One broadcast of
    the whole {tag: idf} map; the batch is split by tag and each slice runs
    the same grouped searchsorted/reduceat kernel. Rows with an unknown tag
    score 1.0 (no vocabulary)."""
    bc = spark.sparkContext.broadcast(idfs)
    tokens = {tag: _new_token(f"tag{i}") for i, tag in enumerate(sorted(idfs))}

    @F.pandas_udf(T.DoubleType())
    def tagged_cosine(left: pd.Series, right: pd.Series, tag: pd.Series) -> pd.Series:
        table = bc.value
        for tg, tok in tokens.items():
            _register_idf(tok, table[tg])
        lvals = left.fillna("").to_numpy()
        rvals = right.fillna("").to_numpy()
        tvals = tag.fillna("").to_numpy()
        out = np.ones(len(lvals))
        for tg in pd.unique(tvals):
            tok = tokens.get(tg)
            if tok is None:
                continue
            m = tvals == tg
            cos, _jw, _tsr = _score_batch(lvals[m], rvals[m], tok, compute_jw=False)
            out[m] = cos
        return pd.Series(out)

    # non-deterministic flag: stop the pushed threshold filter duplicating
    # the kernel (see make_pair_scorer)
    return tagged_cosine.asNondeterministic()


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
        # same grouped searchsorted/reduceat kernel as the pair scorer —
        # the per-pair path allocates ~10 temporaries per call and stops
        # scaling past ~8 workers; compute_jw=False because this consumer
        # discards jw and tie-break groups are full of close (cos<=0.5) pairs
        cos, _jw, _tsr = _score_batch(lvals, rvals, key, compute_jw=False)
        return pd.Series(cos)

    # non-deterministic flag: stop the pushed threshold filter duplicating
    # the kernel (see make_pair_scorer)
    return cosine_dist.asNondeterministic()
