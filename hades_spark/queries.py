"""Registry of driver-checkable queries (SURVEY.md §2 operator inventory).

Each entry is ``name -> (spark, sf_dir) -> DataFrame``; ``ORACLE_SQL`` holds
the DuckDB-equivalent ANSI SQL (tables region nation customer supplier part
orders lineitem events documents embeddings are pre-registered as views).
Column names/aliases match exactly between both sides — the driver hashes
values after sorting columns by name.

KG-pipeline queries over the synthetic pages corpus have no SQL oracle
(Python-regex UDF semantics); the driver records rows-only checks for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import load_table

SPARK_QUERIES: dict = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn
    return deco


# ---------------------------------------------------------------------------
# S-family: scans / point lookups / IN-list (SURVEY §2.1)
# ---------------------------------------------------------------------------

@register("s1_scan_project_filter", """
SELECT l_orderkey, l_partkey, CAST(l_quantity AS DOUBLE) AS qty
FROM lineitem WHERE l_quantity > 45
""")
def s1(spark: SparkSession, sf: str) -> DataFrame:
    # projection + predicate reach the parquet scan (PushedFilters)
    return (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_partkey",
                F.col("l_quantity").cast("double").alias("qty"))
    )


@register("s2_point_lookup", """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_orderkey = 7
""")
def s2(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderkey") == 7)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register("s3_in_list_semi_join", """
SELECT c_custkey, c_name, c_nationkey
FROM customer WHERE c_custkey IN (1, 5, 9, 13, 21)
""")
def s3(spark: SparkSession, sf: str) -> DataFrame:
    keys = spark.createDataFrame([(1,), (5,), (9,), (13,), (21,)], "c_custkey long")
    return (
        load_table(spark, sf, "customer")
        .join(F.broadcast(keys), "c_custkey", "left_semi")
        .select("c_custkey", "c_name", "c_nationkey")
    )


# ---------------------------------------------------------------------------
# P-family: predicates (SURVEY §2.2)
# ---------------------------------------------------------------------------

@register("p4_range_predicate", """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 15
""")
def p4(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.filter((F.col("l_quantity") >= 10) & (F.col("l_quantity") < 15)) \
             .select("l_orderkey", "l_linenumber", "l_quantity")


@register("p5_prefix_predicate", """
SELECT p_partkey, p_name FROM part WHERE p_name LIKE 'al%'
""")
def p5(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "part")
        .filter(F.col("p_name").startswith("al"))
        .select("p_partkey", "p_name")
    )


@register("p6_empty_text_scan", """
SELECT CAST(count(*) AS BIGINT) AS n_empty
FROM documents WHERE trim(coalesce(text, '')) = ''
""")
def p6(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return docs.filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) == "") \
               .agg(F.count("*").cast("bigint").alias("n_empty"))


# ---------------------------------------------------------------------------
# J-family: joins (SURVEY §2.3)
# ---------------------------------------------------------------------------

@register("j1_three_way_lookup_join", """
SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, c.c_name
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_quantity > 48
""")
def j1(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(F.col("l_quantity") > 48)
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("l_orderkey", "l_linenumber", "o_orderdate", "c_name")
    )


@register("j2_decorrelated_count_join", """
SELECT c.c_custkey, c.c_name, CAST(coalesce(o.cnt, 0) AS BIGINT) AS order_count
FROM customer c LEFT JOIN (
  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
""")
def j2(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    cnt = load_table(spark, sf, "orders").groupBy("o_custkey") \
        .agg(F.count("*").alias("cnt"))
    return (
        c.join(cnt, c.c_custkey == cnt.o_custkey, "left")
        .select("c_custkey", "c_name",
                F.coalesce("cnt", F.lit(0)).cast("bigint").alias("order_count"))
    )


@register("j3_anti_join_new_only", """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def j3(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti") \
            .select("c_custkey", "c_name")


@register("j4_orphan_count", """
SELECT CAST(count(*) AS BIGINT) AS n_orphans FROM events e
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
""")
def j4(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    c = load_table(spark, sf, "customer")
    return (
        e.join(c, e.user_id == c.c_custkey, "left_anti")
        .agg(F.count("*").cast("bigint").alias("n_orphans"))
    )


@register("j5_broadcast_dim_join", """
SELECT n.n_name, r.r_name, CAST(count(*) AS BIGINT) AS n_suppliers
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
""")
def j5(spark: SparkSession, sf: str) -> DataFrame:
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.count("*").cast("bigint").alias("n_suppliers"))
    )


# ---------------------------------------------------------------------------
# A-family: aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------

@register("a1_pricing_summary", """
SELECT l_returnflag, l_linestatus,
  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
  CAST(sum(l_extendedprice) AS DOUBLE) AS sum_base_price,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""")
def a1(spark: SparkSession, sf: str) -> DataFrame:
    # TPC-H Q1-style map-side-combinable aggregation
    return (
        load_table(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.sum("l_extendedprice").cast("double").alias("sum_base_price"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


@register("a2_explode_group_count", """
SELECT word, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 10
""")
def a2(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return (
        docs.select(F.explode(F.split("text", " ", -1)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(10)
    )


@register("a3_group_count_with_default", """
SELECT coalesce(source, 'unknown') AS src, CAST(count(*) AS BIGINT) AS cnt
FROM documents GROUP BY coalesce(source, 'unknown')
""")
def a3(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return (
        docs.groupBy(F.coalesce("source", F.lit("unknown")).alias("src"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


@register("a9_distinct_dedup", """
SELECT DISTINCT user_id, event_type FROM events
""")
def a9(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "events") \
        .select("user_id", "event_type").dropDuplicates()


# ---------------------------------------------------------------------------
# W-family: windows (SURVEY §2.5)
# ---------------------------------------------------------------------------

@register("w1_adjacent_context_sum", """
SELECT l_orderkey, l_linenumber,
  CAST(sum(l_quantity) OVER (
    PARTITION BY l_orderkey
    ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice
    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS ctx_qty
FROM lineitem
""")
def w1(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    # (l_orderkey, l_linenumber) is not unique in the synthetic data — the
    # frame ordering must be fully deterministic or the context sums drift
    w = Window.partitionBy("l_orderkey") \
        .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice") \
        .rowsBetween(-1, 1)
    return (
        load_table(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber",
                F.sum("l_quantity").over(w).cast("double").alias("ctx_qty"))
    )


@register("w2_lead_chain_pairing", """
SELECT user_id, event_id, lead(event_id) OVER (
  PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id
FROM events
""")
def w2(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_table(spark, sf, "events")
        .select("user_id", "event_id",
                F.lead("event_id").over(w).alias("next_event_id"))
    )


@register("w3_best_match_rank", """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) WHERE rn = 1
""")
def w3(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey") \
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# T-family: sorts / top-k (SURVEY §2.6)
# ---------------------------------------------------------------------------

@register("t1_recency_topk", """
SELECT event_id, user_id, ts FROM events
ORDER BY ts DESC, event_id ASC LIMIT 20
""")
def t1(spark: SparkSession, sf: str) -> DataFrame:
    # Catalyst compiles orderBy+limit to TakeOrderedAndProject (no full sort)
    return (
        load_table(spark, sf, "events")
        .orderBy(F.desc("ts"), F.asc("event_id"))
        .select("event_id", "user_id", "ts")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# U-family: set ops (SURVEY §2.7)
# ---------------------------------------------------------------------------

@register("u1_union_distinct", """
SELECT user_id FROM events WHERE event_type = 'click'
UNION
SELECT user_id FROM events WHERE value > 90
""")
def u1(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return (
        e.filter(F.col("event_type") == "click").select("user_id")
        .union(e.filter(F.col("value") > 90).select("user_id"))
        .distinct()
    )


@register("u3_resume_anti_join", """
SELECT e.event_id FROM events e
WHERE e.event_type <> 'error' AND NOT EXISTS (
  SELECT 1 FROM events d WHERE d.event_type = 'error'
  AND d.event_id = e.event_id)
""")
def u3(spark: SparkSession, sf: str) -> DataFrame:
    # checkpoint-manifest resume semantics: drop already-processed ids
    e = load_table(spark, sf, "events")
    done = e.filter(F.col("event_type") == "error").select("event_id")
    return (
        e.filter(F.col("event_type") != "error")
        .join(done, "event_id", "left_anti")
        .select("event_id")
    )
