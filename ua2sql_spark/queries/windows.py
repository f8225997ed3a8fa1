"""Window-function surface: SURVEY.md §2.5 (W1–W4) and sorts §2.6.

All window orderings include a unique key tie-break so ranking output is
a total order — deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ua2sql_spark.catalog import load_table
from ua2sql_spark.registry import query


# ---------------------------------------------------------------------------
# W1: ranking functions per group.
# ---------------------------------------------------------------------------
@query(
    "q22_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q22_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# W2: lag/lead — inter-event gap per user (sessionization primitive;
# SURVEY §2.9 T9 batch path).
# ---------------------------------------------------------------------------
@query(
    "q23_window_lag_gap",
    oracle="""
    SELECT event_id, user_id, event_type,
           EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               AS gap_us,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
)
def q23_window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        gap_us.alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


# ---------------------------------------------------------------------------
# W3: framed aggregates — running sum and trailing 3-row moving average.
# Sums inside frames are row-order-sequential in both engines given the
# total order → deterministic without the decimal trick, but we round
# the moving average to absorb engine-side accumulation differences.
# ---------------------------------------------------------------------------
@query(
    "q24_window_running",
    oracle="""
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM events
    """,
)
def q24_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4).alias(
            "running_value"
        ),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


# ---------------------------------------------------------------------------
# W4: top-k per group via row_number filter — Catalyst rewrites this to a
# per-partition top-k (WindowGroupLimit) instead of a full sort.
# ---------------------------------------------------------------------------
@query(
    "q25_topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 3
    """,
)
def q25_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# O1/O2: global ORDER BY + LIMIT — Catalyst plans TakeOrderedAndProject
# (distributed top-k, no global sort), the scalable form of the
# reference's checkpoint lookup (ua2sql.py:166-168).
# ---------------------------------------------------------------------------
@query(
    "q26_order_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q26_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# O4: multi-key sort with explicit null placement (sort semantics check;
# the driver hash is order-insensitive but the null bucketing logic is
# part of the result).
# ---------------------------------------------------------------------------
@query(
    "q27_sort_nulls",
    oracle="""
    SELECT user_id, event_id, gap_bucket FROM (
        SELECT user_id, event_id,
               CAST(FLOOR((EPOCH_US(ts) - EPOCH_US(
                    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) / 60000000)
                    AS BIGINT) AS gap_bucket
        FROM events
    )
    ORDER BY gap_bucket DESC NULLS LAST, event_id
    LIMIT 100
    """,
)
def q27_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap_min = F.floor(
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)) / F.lit(60_000_000)
    ).cast("long")
    return (
        e.select("user_id", "event_id", gap_min.alias("gap_bucket"))
        .orderBy(F.desc_nulls_last("gap_bucket"), F.asc("event_id"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# W1b: NTILE — balance deciles per market segment. Unique (balance, key)
# tie-break keeps bucket boundaries deterministic; per-segment windows
# parallelize across segments (no global sort).
# ---------------------------------------------------------------------------
@query(
    "q118_ntile_deciles",
    oracle="""
    SELECT c_mktsegment, decile,
           COUNT(*) AS n_customers,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal
    FROM (
        SELECT c_mktsegment, c_acctbal,
               NTILE(10) OVER (
                   PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
               ) AS decile
        FROM customer
    )
    GROUP BY c_mktsegment, decile
    """,
)
def q118_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select("c_mktsegment", "c_acctbal", F.ntile(10).over(w).alias("decile"))
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


# ---------------------------------------------------------------------------
# A8b: ordered string aggregation — the listagg/string_agg surface.
# Sort-then-join makes the concatenation order engine-independent.
# ---------------------------------------------------------------------------
@query(
    "q119_string_agg",
    oracle="""
    SELECT c_mktsegment,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
               AS priorities_csv,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def q119_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), ","
            ).alias("priorities_csv"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
    )
