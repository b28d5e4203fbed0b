"""Training-data pipeline operators: deduplication, similarity search, text
analysis — first-class components for the 100 TB corpus use case.

All deterministic and oracle-testable: hash-dependent steps use md5 (identical
bytes→hex in Spark and DuckDB), so even MinHash/SimHash signatures compare
exactly across engines. Embedding math is done in float64 on both sides and
rounded before hashing.

Scale notes per operator are inline; the common theme: shingle/band keys are
the blocking keys of the dedup world — the same salted equi-join shape as the
ER pipeline, no pairwise O(n²) anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gduns_name_match_spark.operators.library import t

# --------------------------------------------------------------- exact dedup


def q_dedup_exact(spark, sf_dir):
    """Exact dedup via content hash: one row per distinct text with the
    canonical (min) doc_id and the duplicate count. At 100 TB this is one
    map-side hash + one shuffle on the digest."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("fingerprint")).agg(
        F.min("doc_id").alias("canonical_doc"),
        F.count("*").alias("n_copies"),
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS fingerprint, min(doc_id) AS canonical_doc,
       count(*) AS n_copies
FROM documents GROUP BY 1
"""


# ------------------------------------------------------------ shingle helper

_SHINGLES_SQL = """
  SELECT doc_id, unnest(list_distinct([
           array_to_string(list_slice(toks, i, i + 2), ' ')
           for i in range(1, len(toks) - 1)])) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
"""


def _doc_shingles(spark, sf_dir) -> DataFrame:
    """(doc_id, shingle) — distinct word-3-shingles per document.

    The token array is a separate projection indexed by element_at, NOT a
    lambda that re-splits the text per element: higher-order-function lambdas
    are interpreted, so an inner split() makes shingling O(tokens²) per row
    (measured 10s → 0.7s on the sf0.1 table for this exact rewrite)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    shingles = F.when(
        F.size("toks") >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("toks", i),
                    F.element_at("toks", i + 1),
                    F.element_at("toks", i + 2),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select("doc_id", F.explode(shingles).alias("shingle"))


# ----------------------------------------------------- n-gram Jaccard dedup

# stop-shingle cap: a shingle present in more document than this carries no
# near-dup signal (it's boilerplate) and would emit O(df²) candidate pairs —
# the operator's Jaccard is DEFINED over the df-capped shingle space, mirrored
# exactly in the DuckDB twin, so correctness and scale agree
JACCARD_MAX_DF = 1_000
# round(j, 4) >= 0.5 (the operator's acceptor, on Spark's HALF_UP rounding)
# is exactly j >= 0.49995 — every candidate-pruning bound below is derived
# from THIS tau, not from 0.5, so the rounding epsilon can never drop a pair
_JACCARD_TAU = 0.49995
# kept for API compatibility (r01-r06 exposed the salted-join knobs); the
# round-7 pigeonhole index bounds every reducer structurally — a pair key's
# fan-out is <= the df cap — so there is no hot key left to salt
JACCARD_HOT_DF = 64
JACCARD_N_SALT = 8


def doc_shingle_sets(
    shingles: DataFrame, max_df: "int | None" = JACCARD_MAX_DF
) -> DataFrame:
    """(doc_id, sids sorted array<string>, n) over the (optionally df-capped)
    shingle space — ONE shingle-generation pass, materialized
    (localCheckpoint) so the candidate and verify stages both read the
    aggregate instead of re-deriving the explode->count->join subtree (the
    round-6 plans computed it up to four times per query; guide §2.4 'remove
    shuffles outright'). ``max_df=None`` skips the stop-shingle cap entirely
    (the MinHash operator's Jaccard is defined over the UNCAPPED space).

    Input rows must be distinct per (doc_id, shingle) — the one producer
    (``_doc_shingles``) array_distincts per document, and the DuckDB twins
    are defined over ``list_distinct`` shingles."""
    sh = shingles
    cached = None
    if max_df is not None:
        # the df-capped variant reads the shingle stream twice (df counts,
        # then the capping join): persist the exploded rows for the two
        # passes — the shingle generation (split + per-window transform) is
        # the dominant cost of this aggregate, and the localCheckpoint below
        # is eager so the cache is dropped before returning
        cached = shingles.persist()
        counts = cached.groupBy("shingle").agg(F.count("*").alias("df"))
        sh = cached.join(
            counts.filter(F.col("df") <= max_df).select("shingle"), "shingle"
        )
    out = (
        sh.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("shingle")).alias("sids"))
        .withColumn("n", F.size("sids"))
        .localCheckpoint()
    )
    if cached is not None:
        cached.unpersist()
    return out


def ngram_jaccard_pairs(
    shingles: DataFrame,
    max_df: int = JACCARD_MAX_DF,
    hot_df: int = JACCARD_HOT_DF,     # noqa: ARG001 — see docstring
    n_salt: int = JACCARD_N_SALT,     # noqa: ARG001
) -> DataFrame:
    """Near-dup pairs by shingle Jaccard >= 0.5 over distinct
    (doc_id, shingle) rows. Result is IDENTICAL to the r01-r06 shingle
    self-join + count formulation (the DuckDB twin); only the plan changed.

    Round-7 scale design — the r06 plan joined the shingle table to itself
    and counted per-pair co-occurrences: on a saturating shingle vocabulary
    every df grows linearly with corpus size, so the join's output
    (sum over shingles of df²) grows QUADRATICALLY even under the df cap
    (measured 129M intersection rows at 50k docs vs 2.8M at 5k). The rewrite
    generates a candidate superset in linear volume and verifies it exactly:

    * PIGEONHOLE CANDIDATES — round(J,4) >= 0.5 forces
      n_inter >= tau/(1+tau)·(na+nb) with tau=0.49995, and the length bound
      min >= tau·max; for a pair whose larger side sits in size tier
      [2^e, 2^(e+1)) that means n_inter >= ceil(0.49995·2^e). Hashing the
      shingle space into G_e = ceil(0.4999·2^e)-1 groups therefore lands >= 2
      SHARED shingles in one group; both docs emit that within-group shingle
      pair as an equi-join key, so every qualifying pair is found. Each doc
      emits its within-group pairs for tiers e_own=floor(log2 n) through
      e_hi=floor(log2(n/tau)) (the partner may be up to n/tau shingles), at
      ~n²/(2·G_e) ≈ 2n keys per tier — LINEAR index volume. Docs with n <= 3
      (whose qualifying partners have < 8 shingles) additionally emit
      singleton keys. Key/group hashes only ever create false-positive
      candidates — collisions are harmless because of:
    * EXACT VERIFY — candidates join the per-doc sorted shingle arrays
      (doc_shingle_sets) and compute the true intersection with
      array_intersect; jaccard and the >= 0.5 acceptance are evaluated on
      exact counts, so the output set equals the naive join's bit-for-bit
      (equality property-tested incl. tau-boundary corpora,
      tests/test_training_ops.py).

    Reducer bounds without salting: the per-doc pair generation is keyed by
    (doc_id, tier, group) — fan-in <= one document; the candidate join is
    keyed by (tier, shingle-pair) whose df is <= the shingle df cap. The
    ``hot_df``/``n_salt`` parameters are retained for API compatibility but
    no longer needed — no single key can exceed the df-cap bound the salted
    design enforced probabilistically.
    """
    docs = doc_shingle_sets(shingles, max_df)
    tau = F.lit(_JACCARD_TAU)
    e_own = F.greatest(F.lit(2), F.floor(F.log2("n")).cast("int"))
    e_hi = F.floor(F.log2(F.col("n") / tau)).cast("int")
    tiered = (
        docs.filter(F.col("n") >= 2)
        .select(
            "doc_id", "n", F.explode("sids").alias("s"),
            F.sequence(F.least(e_own, e_hi), e_hi).alias("tiers"),
        )
        .select("doc_id", "n", "s", F.explode("tiers").alias("e"))
        # 2^e stays exact in a double for every realistic tier (e <= 53)
        .withColumn(
            "g",
            F.pmod(
                F.xxhash64("s"),
                F.greatest(
                    F.ceil(F.lit(0.4999) * F.pow(F.lit(2.0), F.col("e"))) - 1,
                    F.lit(1),
                ),
            ).cast("int"),
        )
    )
    partner = tiered.select(
        "doc_id", F.col("s").alias("s2"), "e", "g"
    )
    idx = (
        tiered.join(partner, ["doc_id", "e", "g"])
        .filter(F.col("s") < F.col("s2"))
        .select("doc_id", "n", "e", F.xxhash64("s", "s2").alias("key"))
    )
    len_ok = F.least("na", "nb") >= tau * F.greatest("na", "nb")
    cand_pairs = (
        idx.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), "e", "key")
        .join(
            idx.select(
                F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "e", "key"
            ),
            ["e", "key"],
        )
        .filter((F.col("doc_a") < F.col("doc_b")) & len_ok)
        .select("doc_a", "doc_b")
    )
    # singleton leg: a doc with n <= 3 can only qualify against another
    # n <= 3 doc (min >= tau·max bounds the partner below 8 shingles... and
    # n_inter >= 1 is the only usable bound there) — join tiny docs on the
    # raw shingle
    small = docs.filter(F.col("n") <= 3).select(
        "doc_id", "n", F.explode("sids").alias("s")
    )
    cand_small = (
        small.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), "s")
        .join(
            small.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "s"),
            "s",
        )
        .filter((F.col("doc_a") < F.col("doc_b")) & len_ok)
        .select("doc_a", "doc_b")
    )
    cand = cand_pairs.unionByName(cand_small).distinct()
    return (
        cand.join(
            docs.select(
                F.col("doc_id").alias("doc_a"), F.col("sids").alias("_sa"),
                F.col("n").alias("na"),
            ),
            "doc_a",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("doc_b"), F.col("sids").alias("_sb"),
                F.col("n").alias("nb"),
            ),
            "doc_b",
        )
        .withColumn("n_inter", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Near-duplicate pairs by word-3-shingle Jaccard >= 0.5 (df-capped +
    salted shingle join; see ngram_jaccard_pairs)."""
    return ngram_jaccard_pairs(_doc_shingles(spark, sf_dir))


SQL_NGRAM_JACCARD_PAIRS = f"""
WITH all_shingles AS ({_SHINGLES_SQL}),
shingles AS (
  SELECT * FROM all_shingles
  WHERE shingle IN (SELECT shingle FROM all_shingles
                    GROUP BY shingle HAVING count(*) <= {JACCARD_MAX_DF})),
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM shingles a JOIN shingles b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(n_inter / (sa.n + sb.n - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter / (sa.n + sb.n - n_inter), 4) >= 0.5
"""


# ------------------------------------------------------------- MinHash + LSH

# b bands x r rows: P(two docs collide on one band) = J^r, P(candidate) =
# 1 - (1 - J^r)^b — S-curve threshold (1/b)^(1/r) ≈ 0.35 for (8, 2).
# r = 2 is the round-2 hardening: single-row bands have P(collision) = J, so
# any low-diversity corpus (word-salad synthetics, boilerplate-heavy crawls
# with pairwise J ~ 0.3) mega-blocks toward all-pairs candidates; squaring
# J keeps those buckets sparse while J >= 0.5 pairs are still caught with
# P >= 1-(1-0.25)^8 ≈ 0.90 (the verify step then makes survivors exact).
# The 16 minhashes cost FOUR md5 calls per shingle (same as the old 4-band
# single-row scheme): each 32-hex digest is sliced into four independent
# 8-hex (32-bit) chunks — minhash j uses digest j//4, chunk j%4.
MINHASH_BANDS = 8
MINHASH_ROWS = 2
_N_MINHASH = MINHASH_BANDS * MINHASH_ROWS


def minhash_band_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) from (doc_id, shingle) rows: one groupBy on
    doc_id computing all 16 chunk-mins map-side, then a posexplode into the
    8 per-band keys (each the ':'-join of its 2 row minhashes).

    md5-based minhash keeps the signature engine-portable AND deterministic —
    the same property that makes it resumable at 100 TB (re-running a band
    never changes its buckets)."""
    hashed = sh.select(
        "doc_id",
        *[
            (
                F.md5("shingle")
                if k == 0
                else F.md5(F.concat_ws(":", "shingle", F.lit(str(k))))
            ).alias(f"h{k}")
            for k in range(_N_MINHASH // 4)
        ],
    )
    mins = hashed.groupBy("doc_id").agg(
        *[
            F.min(F.substring(f"h{j // 4}", 1 + 8 * (j % 4), 8)).alias(f"m{j}")
            for j in range(_N_MINHASH)
        ]
    )
    band_keys = F.array(
        *[
            F.concat_ws(
                ":",
                *[F.col(f"m{i * MINHASH_ROWS + r}") for r in range(MINHASH_ROWS)],
            )
            for i in range(MINHASH_BANDS)
        ]
    )
    return mins.select(
        "doc_id", F.posexplode(band_keys).alias("band", "band_key")
    )


def minhash_candidates(sh: DataFrame) -> DataFrame:
    """Distinct (doc_a, doc_b) candidate pairs: docs colliding on ANY band."""
    sig = minhash_band_signatures(sh)
    a = sig.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    b = sig.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash-LSH near-dup pairs: banded-signature candidates (see
    minhash_band_signatures) verified with true Jaccard >= 0.5.

    Round 7: the shingle table is generated ONCE into the per-doc sorted
    arrays (doc_shingle_sets, uncapped — this operator's Jaccard is defined
    over the full shingle space) and both the signatures and the verify read
    that aggregate; the verify computes exact intersections per candidate
    with array_intersect instead of the r06 candidate×shingle expand join
    (which re-derived the shingle subtree twice more and shuffled the whole
    shingle table by (doc_b, shingle)). Result set identical."""
    docs = doc_shingle_sets(_doc_shingles(spark, sf_dir), max_df=None)
    sh = docs.select("doc_id", F.explode("sids").alias("shingle"))
    cand = minhash_candidates(sh)
    # verify Jaccard ONLY on LSH candidates — the whole point of banding is
    # to avoid the all-co-shingled-pairs intersection join (the DuckDB twin
    # computes it the naive way; the result set is identical)
    return (
        cand.join(
            docs.select(
                F.col("doc_id").alias("doc_a"), F.col("sids").alias("_sa"),
                F.col("n").alias("na"),
            ),
            "doc_a",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("doc_b"), F.col("sids").alias("_sb"),
                F.col("n").alias("nb"),
            ),
            "doc_b",
        )
        .withColumn("n_inter", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 4),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_sig_sql() -> str:
    """The DuckDB twin of minhash_band_signatures: same md5 digests, same
    8-hex chunk slicing, same (band, key) layout — signatures are bytewise
    identical across engines."""
    hashes = ", ".join(
        "md5(shingle) AS h0"
        if k == 0
        else f"md5(shingle || ':{k}') AS h{k}"
        for k in range(_N_MINHASH // 4)
    )
    mins = ", ".join(
        f"min(substring(h{j // 4}, {1 + 8 * (j % 4)}, 8)) AS m{j}"
        for j in range(_N_MINHASH)
    )
    arms = " ".join(
        f"WHEN {i} THEN "
        + " || ':' || ".join(
            f"m{i * MINHASH_ROWS + r}" for r in range(MINHASH_ROWS)
        )
        for i in range(MINHASH_BANDS)
    )
    return f"""
hashed AS (SELECT doc_id, {hashes} FROM shingles),
mins AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
sig AS (
  SELECT doc_id, band, CASE band {arms} END AS band_key
  FROM mins CROSS JOIN (SELECT unnest(range({MINHASH_BANDS})) AS band))"""


SQL_MINHASH_LSH_PAIRS = f"""
WITH shingles AS ({_SHINGLES_SQL}),
{_minhash_sig_sql()},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b USING (band, band_key)
  WHERE a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM shingles a JOIN shingles b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT c.doc_a, c.doc_b,
       round(n_inter / (sa.n + sb.n - n_inter), 4) AS jaccard
FROM cand c
JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE round(n_inter / (sa.n + sb.n - n_inter), 4) >= 0.5
"""


# ------------------------------------------------------------------- SimHash

SIMHASH_BITS = 16


def q_simhash(spark, sf_dir):
    """16-bit SimHash per document from token md5s: bit i is the sign of the
    sum over tokens of (+1 if hex digit i of md5(token) >= '8' else -1).
    Pure aggregation — no UDF, one shuffle on doc_id."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    toks = toks.withColumn("h", F.md5("tok"))
    bit_sums = [
        F.sum(
            F.when(
                F.substring("h", i + 1, 1).isin(*"89abcdef"), F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    bits = F.concat(
        *[F.when(F.col(f"b{i}") >= 0, "1").otherwise("0") for i in range(SIMHASH_BITS)]
    )
    return agg.select("doc_id", bits.alias("simhash"))


def _simhash_sql() -> str:
    cases = ", ".join(
        f"sum(CASE WHEN substring(md5(tok), {i + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_BITS)
    )
    concat = " || ".join(
        f"(CASE WHEN b{i} >= 0 THEN '1' ELSE '0' END)" for i in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
sums AS (
  SELECT doc_id, {cases} FROM toks WHERE tok <> '' GROUP BY doc_id)
SELECT doc_id, {concat} AS simhash FROM sums
"""


SQL_SIMHASH = _simhash_sql()


# -------------------------------------------------------- document fingerprint


def q_doc_fingerprint(spark, sf_dir):
    """Canonical content fingerprint: md5 over the sorted distinct token set
    (robust to token order — catches shuffled near-copies)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    return toks.groupBy("doc_id").agg(
        F.md5(F.concat_ws(" ", F.sort_array(F.collect_set("tok")))).alias("fingerprint"),
        F.count_distinct("tok").alias("n_distinct_tokens"),
    )


SQL_DOC_FINGERPRINT = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
SELECT doc_id,
       md5(array_to_string(list_sort(list(DISTINCT tok)), ' ')) AS fingerprint,
       count(DISTINCT tok) AS n_distinct_tokens
FROM toks WHERE tok <> '' GROUP BY doc_id
"""


# --------------------------------------------------- embedding cosine top-k


def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-5 neighbors for probe vectors (vec_id < 20).

    Baseline ANN path: probes broadcast against the corpus, dot products via
    JVM higher-order functions in float64 (no Python). The scale path is
    q_embedding_lsh_topk; this one is the exact reference answer."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    norm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))  # noqa: E731
    e = e.withColumn("norm", norm(F.col("emb")))
    probes = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("p_emb"),
        F.col("norm").alias("p_norm"),
    )
    # broadcast the PROBES (bounded small side); the corpus stays distributed —
    # broadcasting the corpus would OOM the moment it outgrows one executor
    joined = F.broadcast(probes).join(e, F.col("vec_id") != F.col("probe_id"))
    dot = F.aggregate(
        F.zip_with("p_emb", "emb", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    scored = joined.withColumn("cos", dot / (F.col("p_norm") * F.col("norm")))
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos", 4).alias("cosine"),
            F.col("rn").cast("bigint").alias("rank"),
        )
    )


SQL_EMBEDDING_TOPK = """
WITH e AS (SELECT vec_id, cast(embedding AS DOUBLE[]) AS emb FROM embeddings),
pairs AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(p.emb, c.emb) AS cos
  FROM e p, e c
  WHERE p.vec_id < 20 AND c.vec_id <> p.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM pairs)
SELECT probe_id, neighbor_id, round(cos, 4) AS cosine, cast(rn AS bigint) AS rank
FROM ranked WHERE rn <= 5
"""


# ------------------------------------------------- LSH-bucketed ANN variant


_LSH_DIMS = (0, 8, 16, 24)


def q_embedding_lsh_topk(spark, sf_dir):
    """Scale-path ANN: sign-pattern bucket on fixed dims, neighbors searched
    only within the probe's bucket (the bucket key is an equi-join key —
    exactly the blocking-key pattern, so it shards at any corpus size)."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    bucket = F.concat(
        *[
            F.when(F.element_at("emb", d + 1) >= 0, "1").otherwise("0")
            for d in _LSH_DIMS
        ]
    )
    norm = F.sqrt(F.aggregate("emb", F.lit(0.0), lambda a, x: a + x * x))
    e = e.withColumn("bucket", bucket).withColumn("norm", norm)
    probes = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("p_emb"),
        F.col("norm").alias("p_norm"), "bucket",
    )
    joined = probes.join(e, "bucket").filter(F.col("vec_id") != F.col("probe_id"))
    dot = F.aggregate(
        F.zip_with("p_emb", "emb", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    scored = joined.withColumn("cos", dot / (F.col("p_norm") * F.col("norm")))
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos", 4).alias("cosine"),
            F.col("rn").cast("bigint").alias("rank"),
        )
    )


# ----------------------------------------------------- IVF-bucketed variant

_IVF_CELLS = 8     # centroid count (training-free: the first C vectors)
_IVF_NPROBE = 2    # cells searched per probe — the recall/cost dial


def q_embedding_ivf_topk(spark, sf_dir):
    """IVF ANN: every vector is assigned to its nearest centroid's cell (one
    broadcast cross-join against C centroids + an argmax window); a probe
    searches its _IVF_NPROBE nearest cells only. Multi-probe makes recall a
    DIAL (nprobe→C recovers exact search), unlike the sign-LSH variant whose
    recall is fixed by the chosen dims.

    Deterministic, training-free centroids (the first C vectors) keep the
    operator oracle-testable; ``embedding_ivf_kmeans_topk`` is the trained
    variant — the plan shape (broadcast centroids → cell equi-join) is
    identical."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    cent = e.filter(F.col("vec_id") < _IVF_CELLS).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
    )
    return _ivf_topk_from_centroids(e, cent)


def _ivf_topk_from_centroids(e, cent, n_probe=_IVF_NPROBE, k=3):
    """Shared IVF search body: assign every vector to its best cell against
    the (broadcast) centroid frame, search each probe's ``n_probe`` nearest
    cells, exact-rescore the candidates, return top-``k`` per probe."""
    cos_c = F.aggregate(
        F.zip_with("emb", "cemb", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    ) / (
        F.sqrt(F.aggregate("emb", F.lit(0.0), lambda a, x: a + x * x))
        * F.sqrt(F.aggregate("cemb", F.lit(0.0), lambda a, x: a + x * x))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cid").asc()
    )
    assign = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("ccos", cos_c)
        .withColumn("rnk", F.row_number().over(w_assign))
    )
    cells = assign.filter(F.col("rnk") == 1).select("vec_id", F.col("cid").alias("cell"))
    probe_cells = assign.filter(
        (F.col("vec_id") < 20) & (F.col("rnk") <= n_probe)
    ).select(F.col("vec_id").alias("probe_id"), F.col("cid").alias("cell"))
    cand = probe_cells.join(cells, "cell").filter(
        F.col("vec_id") != F.col("probe_id")
    ).select("probe_id", F.col("vec_id").alias("neighbor_id"))
    p = e.select(F.col("vec_id").alias("probe_id"), F.col("emb").alias("p_emb"))
    n = e.select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("n_emb"))
    dot = F.aggregate(
        F.zip_with("p_emb", "n_emb", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    norm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))  # noqa: E731
    scored = (
        cand.join(F.broadcast(p), "probe_id")
        .join(n, "neighbor_id")
        .withColumn("cos", dot / (norm(F.col("p_emb")) * norm(F.col("n_emb"))))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "probe_id",
            "neighbor_id",
            F.round("cos", 4).alias("cosine"),
            F.col("rn").cast("bigint").alias("rank"),
        )
    )


_IVF_TRAIN_SAMPLE = 4096  # driver-side k-means sample cap (rows x dim doubles)


def kmeans_centroids_spherical(vectors, c: int, iters: int = 10):
    """Deterministic spherical k-means (Lloyd's) on a bounded sample.

    Vectors are L2-normalized so assignment-by-dot == assignment-by-cosine;
    each iteration recomputes a cell centroid as the renormalized mean of its
    members (an empty cell keeps its previous centroid). Init is the first
    ``c`` sample vectors — no RNG, so the trained operator is reproducible
    run-to-run. The sample is capped (_IVF_TRAIN_SAMPLE): IVF training on a
    sample is the standard recipe — centroid quality converges long before
    the sample approaches the corpus, so the driver never holds more than
    sample x dim doubles regardless of corpus size."""
    import numpy as np

    X = np.asarray(vectors, dtype=np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.where(norms == 0.0, 1.0, norms)
    C = X[:c].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        new_c = C.copy()
        for j in range(c):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0.0:
                    new_c[j] = m / n
        if np.allclose(new_c, C):
            break
        C = new_c
    return C


def q_embedding_ivf_kmeans_topk(spark, sf_dir):
    """IVF ANN with TRAINED centroids: spherical k-means on a deterministic
    bounded sample replaces the training-free 'first C vectors' of
    ``embedding_ivf_topk``. Trained centroids tile the data's actual density
    — cells get comparable populations, so the same nprobe buys strictly
    better recall (demonstrated on a planted-cluster fixture in
    tests/test_operators_oracle.py). Search plan is byte-identical to the
    oracle variant (broadcast centroids → cell equi-join → exact rescore);
    rows-only driver entry — Lloyd's iterations have no SQL twin."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    sample = [
        r["emb"] for r in e.orderBy("vec_id").limit(_IVF_TRAIN_SAMPLE).collect()
    ]
    C = kmeans_centroids_spherical(sample, _IVF_CELLS)
    cent = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(C)],
        "cid long, cemb array<double>",
    )
    return _ivf_topk_from_centroids(e, cent)


SQL_EMBEDDING_IVF_TOPK = f"""
WITH e AS (SELECT vec_id, cast(embedding AS DOUBLE[]) AS emb FROM embeddings),
cent AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < {_IVF_CELLS}),
assign AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY list_cosine_similarity(emb, cemb) DESC,
                                     cid ASC) AS rnk
  FROM e, cent),
cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rnk = 1),
probe_cells AS (
  SELECT vec_id AS probe_id, cid AS cell FROM assign
  WHERE vec_id < 20 AND rnk <= {_IVF_NPROBE}),
cand AS (
  SELECT pc.probe_id, c.vec_id AS neighbor_id
  FROM probe_cells pc JOIN cells c USING (cell)
  WHERE c.vec_id <> pc.probe_id),
scored AS (
  SELECT cand.probe_id, cand.neighbor_id,
         list_cosine_similarity(p.emb, n.emb) AS cos
  FROM cand
  JOIN e p ON p.vec_id = cand.probe_id
  JOIN e n ON n.vec_id = cand.neighbor_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM scored)
SELECT probe_id, neighbor_id, round(cos, 4) AS cosine, cast(rn AS bigint) AS rank
FROM ranked WHERE rn <= 3
"""


def _lsh_bucket_sql() -> str:
    parts = " || ".join(
        f"(CASE WHEN emb[{d + 1}] >= 0 THEN '1' ELSE '0' END)" for d in _LSH_DIMS
    )
    return parts


SQL_EMBEDDING_LSH_TOPK = f"""
WITH e AS (
  SELECT vec_id, cast(embedding AS DOUBLE[]) AS emb,
         {_lsh_bucket_sql()} AS bucket
  FROM embeddings),
pairs AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(p.emb, c.emb) AS cos
  FROM e p JOIN e c USING (bucket)
  WHERE p.vec_id < 20 AND c.vec_id <> p.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM pairs)
SELECT probe_id, neighbor_id, round(cos, 4) AS cosine, cast(rn AS bigint) AS rank
FROM ranked WHERE rn <= 3
"""


# ---------------------------------------------- embedding-cosine near-dup

_EMB_DUP_THRESHOLD = 0.99


def q_embedding_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate PAIRS (the dedup flavor of ANN):
    candidates from the sign-LSH bucket equi-join — the blocking pattern, so
    it shards at any corpus size — verified at cosine >= 0.99. The DuckDB
    twin mirrors the same bucket definition, so recall is identical by
    construction."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    bucket = F.concat(
        *[
            F.when(F.element_at("emb", d + 1) >= 0, "1").otherwise("0")
            for d in _LSH_DIMS
        ]
    )
    norm = F.sqrt(F.aggregate("emb", F.lit(0.0), lambda a, x: a + x * x))
    e = e.withColumn("bucket", bucket).withColumn("norm", norm)
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a"),
        F.col("norm").alias("norm_a"), "bucket",
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b"),
        F.col("norm").alias("norm_b"), "bucket",
    )
    dot = F.aggregate(
        F.zip_with("emb_a", "emb_b", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", dot / (F.col("norm_a") * F.col("norm_b")))
        .filter(F.col("cos") >= _EMB_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cosine"))
    )


SQL_EMBEDDING_NEARDUP_PAIRS = f"""
WITH e AS (
  SELECT vec_id, cast(embedding AS DOUBLE[]) AS emb,
         {_lsh_bucket_sql()} AS bucket
  FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.emb, b.emb), 4) AS cosine
FROM e a JOIN e b USING (bucket)
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.emb, b.emb) >= {_EMB_DUP_THRESHOLD}
"""


# ------------------------------------------------------------- text analysis

_STOPWORDS = ("the", "a", "of", "and", "to")


def q_text_quality(spark, sf_dir):
    """Quality scoring: length, token count, stopword ratio, mean token len —
    the standard pre-training corpus filters, all JVM expressions."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    # try_divide, not `/`: ANSI mode (Spark 4 default) turns the zero-token
    # document — which every real crawl contains — into a job-killing
    # DIVIDE_BY_ZERO; NULL ratios for empty docs match the DuckDB twin
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(F.try_divide(n_stop, F.size(toks)), 4).alias("stopword_ratio"),
        F.round(
            F.try_divide(
                F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)),
                F.size(toks).cast("double"),
            ),
            4,
        ).alias("mean_token_len"),
    )


SQL_TEXT_QUALITY = f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id, length(text) AS n_chars, len(toks) AS n_tokens,
       round(len(list_filter(toks, x -> x IN
             {tuple(_STOPWORDS)})) / len(toks), 4) AS stopword_ratio,
       round(list_sum(list_transform(toks, x -> length(x)))
             / cast(len(toks) AS double), 4) AS mean_token_len
FROM base
"""


def q_langid_heuristic(spark, sf_dir):
    """N-gram language-ID heuristic: English-function-word density vote,
    compared against the table's lang label (accuracy on synthetic word-salad
    text is incidental — the operator shape is what ships)."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    # try_divide: an empty doc votes 'other' (NULL density fails the >=
    # test) instead of killing the job under ANSI division semantics
    density = F.try_divide(
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))),
        F.size(toks),
    )
    pred = F.when(density >= 0.05, "en").otherwise("other")
    return (
        d.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


SQL_LANGID_HEURISTIC = f"""
WITH base AS (
  SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents)
SELECT lang,
       CASE WHEN len(list_filter(toks, x -> x IN {tuple(_STOPWORDS)}))
                 / cast(len(toks) AS double) >= 0.05
            THEN 'en' ELSE 'other' END AS pred_lang,
       count(*) AS n
FROM base GROUP BY 1, 2
"""


def q_token_count_bpeish(spark, sf_dir):
    """Token counting: whitespace tokens plus a BPE-ish subword estimate
    (ceil(chars/4) per token, the common len/4 heuristic)."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    subwords = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.ceil(F.length(x) / 4.0).cast("int")
    )
    return d.select(
        "doc_id",
        F.size(toks).alias("ws_tokens"),
        subwords.cast("bigint").alias("bpe_tokens"),
    )


SQL_TOKEN_COUNT_BPEISH = """
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id, len(toks) AS ws_tokens,
       cast(list_sum(list_transform(toks, x -> cast(ceil(length(x) / 4.0) AS int)))
            AS bigint) AS bpe_tokens
FROM base
"""


# ------------------------------------------------- corpus sampling/curation


_SAMPLE_PER_LANG = 50  # stratified quota per language stratum


def q_corpus_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling: the md5 of the doc id orders each
    language stratum pseudo-randomly but REPRODUCIBLY (identical across
    engines, runs, and partitionings — no RNG, no seed plumbing), and a
    per-stratum quota takes the first K. Rate sampling is the same key with
    a hex-threshold filter instead of the quota. At 100 TB the argmin-K per
    stratum is a map-side partial top-K, never a global sort."""
    d = t(spark, sf_dir, "documents")
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    w = Window.partitionBy("lang").orderBy("sample_key", "doc_id")
    return (
        d.select("doc_id", "lang", key.alias("sample_key"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SAMPLE_PER_LANG)
        .select("doc_id", "lang", "sample_key")
    )


SQL_CORPUS_SAMPLE_STRATIFIED = f"""
WITH keyed AS (
  SELECT doc_id, lang, substring(md5(cast(doc_id AS VARCHAR)), 1, 8) AS sample_key
  FROM documents),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY sample_key, doc_id) AS rn
  FROM keyed)
SELECT doc_id, lang, sample_key FROM ranked WHERE rn <= {_SAMPLE_PER_LANG}
"""


def q_corpus_curation(spark, sf_dir):
    """The composed curation pass a pre-training corpus actually runs:
    quality scoring -> language gate -> exact dedup (canonical doc per
    fingerprint) -> token accounting, as ONE DataFrame plan. Each component
    is individually oracled (text_quality / langid_heuristic / dedup_exact /
    token_count_bpeish); this entry proves they compose. Gates filter on the
    UNROUNDED ratio (rounding only for display) so the Spark and DuckDB
    sides threshold the same IEEE doubles."""
    d = t(spark, sf_dir, "documents")
    toks_e = F.filter(F.split("text", " "), lambda x: x != "")
    base = d.select(
        "doc_id", "text", toks_e.alias("toks"), F.md5("text").alias("fp")
    )
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(F.col("toks"), lambda x: F.array_contains(stop_arr, x)))
    scored = base.withColumns(
        {
            "n_chars": F.length("text"),
            "n_tokens": F.size("toks"),
            # try_divide: a zero-token doc gets a NULL ratio (then fails the
            # n_tokens gate in both engines) instead of an ANSI
            # DIVIDE_BY_ZERO abort — confirmed live on a whitespace-only doc
            "stop_ratio": F.try_divide(n_stop, F.size("toks").cast("double")),
            "bpe_tokens": F.aggregate(
                "toks",
                F.lit(0),
                lambda a, x: a + F.ceil(F.length(x) / 4.0).cast("int"),
            ).cast("bigint"),
        }
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        scored.withColumn("dup_rank", F.row_number().over(w))
        .filter(
            (F.col("dup_rank") == 1)
            & (F.col("n_tokens") >= 3)
            & (F.col("stop_ratio") >= 0.05)  # the langid 'en' density gate
            & (F.col("stop_ratio") < 0.9)
        )
        .select(
            "doc_id",
            "n_chars",
            "n_tokens",
            "bpe_tokens",
            F.round("stop_ratio", 4).alias("stopword_ratio"),
        )
    )


SQL_CORPUS_CURATION = f"""
WITH base AS (
  SELECT doc_id, text, md5(text) AS fp,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
scored AS (
  SELECT doc_id, fp, length(text) AS n_chars, len(toks) AS n_tokens,
         len(list_filter(toks, x -> x IN {tuple(_STOPWORDS)}))
           / cast(len(toks) AS double) AS stop_ratio,
         cast(list_sum(list_transform(toks,
              x -> cast(ceil(length(x) / 4.0) AS int))) AS bigint) AS bpe_tokens,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rank
  FROM base)
SELECT doc_id, n_chars, n_tokens, bpe_tokens,
       round(stop_ratio, 4) AS stopword_ratio
FROM scored
WHERE dup_rank = 1 AND n_tokens >= 3 AND stop_ratio >= 0.05 AND stop_ratio < 0.9
"""


TRAINING_QUERIES = {
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "corpus_sample_stratified": (
        q_corpus_sample_stratified,
        SQL_CORPUS_SAMPLE_STRATIFIED,
    ),
    "corpus_curation": (q_corpus_curation, SQL_CORPUS_CURATION),
    "ngram_jaccard_pairs": (q_ngram_jaccard_pairs, SQL_NGRAM_JACCARD_PAIRS),
    "minhash_lsh_pairs": (q_minhash_lsh_pairs, SQL_MINHASH_LSH_PAIRS),
    "simhash": (q_simhash, SQL_SIMHASH),
    "doc_fingerprint": (q_doc_fingerprint, SQL_DOC_FINGERPRINT),
    "embedding_topk": (q_embedding_topk, SQL_EMBEDDING_TOPK),
    "embedding_lsh_topk": (q_embedding_lsh_topk, SQL_EMBEDDING_LSH_TOPK),
    "embedding_ivf_topk": (q_embedding_ivf_topk, SQL_EMBEDDING_IVF_TOPK),
    # rows-only: Lloyd's-trained centroids have no SQL twin; the untrained
    # entry above carries the oracle for the shared search plan
    "embedding_ivf_kmeans_topk": (q_embedding_ivf_kmeans_topk, None),
    "embedding_neardup_pairs": (q_embedding_neardup_pairs, SQL_EMBEDDING_NEARDUP_PAIRS),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "langid_heuristic": (q_langid_heuristic, SQL_LANGID_HEURISTIC),
    "token_count_bpeish": (q_token_count_bpeish, SQL_TOKEN_COUNT_BPEISH),
}
