"""Relational core: scans, filters, projections, joins, set ops.

Covers SURVEY.md §2.2 (P7/P8), §2.3 (J1–J6), §2.7 (set ops). The
reference implements none of these itself — it lands tables so SQL can
run them (reference README.md:2, ua2sql.py:46-86) — so each query here
is the analytic surface over a TPC-H-ish stand-in schema.

Scale notes: all joins are declarative so Catalyst/AQE pick the physical
strategy; dimension tables get explicit ``broadcast`` hints (J4) so the
fact scan never shuffles for them; filters sit directly on the scan so
they push into the Parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ua2sql_spark.catalog import load_table
from ua2sql_spark.queries.common import davg, dsum, sql_davg, sql_dsum
from ua2sql_spark.registry import query


# ---------------------------------------------------------------------------
# Flagship: pricing summary (scan → filter → group-agg → sort); SURVEY §7
# slice 0. Exercises P7, A2, O4 in one plan; partial aggregation +
# pushed-down shipdate filter make this a single-shuffle query at any scale.
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", rebalance=True)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P7: compound predicate surface — AND/OR/NOT, IN, BETWEEN, LIKE.
# All of these push down to the Parquet scan (PushedFilters).
# ---------------------------------------------------------------------------
@query(
    "q02_filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'P')
      AND o_totalprice BETWEEN 50000 AND 200000
      AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      AND NOT (o_custkey = 0)
    """,
)
def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "P")
        & F.col("o_totalprice").between(50000, 200000)
        & (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"))
        & ~(F.col("o_custkey") == 0)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


# ---------------------------------------------------------------------------
# P8: projection with computed columns and CASE WHEN.
# ---------------------------------------------------------------------------
@query(
    "q03_projection_case",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'mid'
                ELSE 'small' END AS qty_band,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_return
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def q03_projection_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_return"),
    )


# ---------------------------------------------------------------------------
# J1: inner equi-join fact-to-fact (lineitem ⋈ orders). Both sides large →
# Catalyst picks sort-merge/shuffled-hash; AQE refines at runtime.
# ---------------------------------------------------------------------------
@query(
    "q04_join_inner",
    oracle=f"""
    SELECT o_orderpriority,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def q04_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


# ---------------------------------------------------------------------------
# J4: star join with broadcast dimension tables (customer → nation →
# region). The fact side never shuffles for the dims — the 100 TB plan.
# ---------------------------------------------------------------------------
@query(
    "q05_join_star_broadcast",
    oracle=f"""
    SELECT r_name AS region_name, n_name AS nation_name,
           COUNT(*) AS num_customers,
           {sql_dsum('c_acctbal')} AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q05_join_star_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("num_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# J2: left outer join — customers with their order counts including
# zero-order customers (the rows an inner join would drop).
# ---------------------------------------------------------------------------
@query(
    "q06_join_left_outer",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS order_count,
           {sql_dsum('COALESCE(o_totalprice, 0)')} AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def q06_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# J3a: left semi — customers that have at least one urgent open order.
# Semi joins never duplicate the left side and stream at scale.
# ---------------------------------------------------------------------------
@query(
    "q07_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')
    """,
)
def q07_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "O")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# J3b: left anti — customers who never placed an urgent order.
# ---------------------------------------------------------------------------
@query(
    "q08_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def q08_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# J5: theta (non-equi) join — parts priced above the average retail price
# of their own size class, via an inequality join against an aggregated
# broadcast side (executes as broadcast-nested-loop on the small side).
# ---------------------------------------------------------------------------
@query(
    "q09_join_theta",
    oracle=f"""
    WITH size_avg AS (
        SELECT p_size AS sz, {sql_davg('p_retailprice')} AS avg_price
        FROM part GROUP BY p_size
    )
    SELECT p_partkey, p_name, p_size, p_retailprice
    FROM part JOIN size_avg
      ON p_size = sz AND p_retailprice > avg_price * 1.03
    """,
)
def q09_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    size_avg = p.groupBy(F.col("p_size").alias("sz")).agg(davg("p_retailprice").alias("avg_price"))
    return (
        p.join(
            F.broadcast(size_avg),
            (p.p_size == size_avg.sz) & (p.p_retailprice > size_avg.avg_price * 1.03),
        )
        .select("p_partkey", "p_name", "p_size", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# J6: cross join — small × small (region × order status grid), the shape
# used for dimension scaffolding; big×big cross joins are intentionally
# not part of the surface except via similarity search's blocked variant.
# ---------------------------------------------------------------------------
@query(
    "q10_join_cross",
    oracle="""
    SELECT r_name, s.o_orderstatus AS status
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def q10_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    statuses = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status")
    ).distinct()
    return r.crossJoin(statuses).select("r_name", "status")


# ---------------------------------------------------------------------------
# Set ops (SURVEY §2.7): UNION ALL / UNION DISTINCT over the shared
# column core — mirrors the "one all-events view over three feed tables"
# use-case of the reference schema (ua2sql.py:46-86).
# ---------------------------------------------------------------------------
@query(
    "q11_setop_union",
    oracle="""
    SELECT party_key, party_name, kind FROM (
        SELECT c_custkey AS party_key, c_name AS party_name, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_suppkey AS party_key, s_name AS party_name, 'supplier' AS kind FROM supplier
    )
    """,
)
def q11_setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("party_key"),
        F.col("c_name").alias("party_name"),
        F.lit("customer").alias("kind"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_key"),
        F.col("s_name").alias("party_name"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


@query(
    "q12_setop_intersect_except",
    oracle="""
    SELECT custkey, 'both' AS bucket FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    UNION ALL
    SELECT custkey, 'open_only' AS bucket FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def q12_setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_k = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    done_k = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    both = open_k.intersect(done_k).withColumn("bucket", F.lit("both"))
    only_open = open_k.subtract(done_k).withColumn("bucket", F.lit("open_only"))
    return both.unionByName(only_open)


# ---------------------------------------------------------------------------
# J2b: FULL OUTER join — urgent-order customers vs low-priority-order
# customers; either side may be absent (nulls where a customer only
# appears in one activity class). Completes the outer-join family next
# to q06's left outer. Both inputs pre-aggregate to one row per key
# before the join, so the full-outer shuffle moves |customers| rows,
# never |orders|.
# ---------------------------------------------------------------------------
@query(
    "q116_join_full_outer",
    oracle="""
    WITH u AS (
        SELECT o_custkey, COUNT(*) AS n_urgent FROM orders
        WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
    ),
    l AS (
        SELECT o_custkey, COUNT(*) AS n_low FROM orders
        WHERE o_orderpriority = '5-LOW' GROUP BY o_custkey
    )
    SELECT COALESCE(u.o_custkey, l.o_custkey) AS custkey,
           COALESCE(n_urgent, 0) AS n_urgent,
           COALESCE(n_low, 0) AS n_low
    FROM u FULL OUTER JOIN l ON u.o_custkey = l.o_custkey
    """,
)
def q116_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    low = (
        o.filter(F.col("o_orderpriority") == "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_low"))
    )
    joined = urgent.alias("u").join(
        low.alias("l"), F.col("u.o_custkey") == F.col("l.o_custkey"), "full_outer"
    )
    return joined.select(
        F.coalesce(F.col("u.o_custkey"), F.col("l.o_custkey")).alias("custkey"),
        F.coalesce(F.col("n_urgent"), F.lit(0)).alias("n_urgent"),
        F.coalesce(F.col("n_low"), F.lit(0)).alias("n_low"),
    )


# ---------------------------------------------------------------------------
# x146: record linkage / entity resolution — the structured-data
# sibling of text near-dup: BLOCK on cheap exact keys (nation ×
# market segment — the shuffle key), compare only within blocks
# (pairs bounded by block size, never |table|²), score candidate
# pairs with an edit-distance feature, and emit matches under a
# deterministic rule. Levenshtein is exact integer DP in both engines.
# At 100 TB the blocking key IS the partitioning: each block's pair
# expansion happens inside one task, the x43 bucket discipline applied
# to entities. The a.key < b.key guard keeps each pair once.
# ---------------------------------------------------------------------------
@query(
    "x146_record_linkage",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_nationkey AS nation, a.c_mktsegment AS segment,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS name_dist,
           ROUND(ABS(a.c_acctbal - b.c_acctbal), 2) AS bal_gap,
           (levenshtein(a.c_name, b.c_name) <= 1
            AND ABS(a.c_acctbal - b.c_acctbal) < 1000.0) AS is_match
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def x146_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    # the blocked pair expansion computes ~|block|^2/2 levenshtein DPs
    # in the STREAMED side's stage — rebalance so it isn't pinned to a
    # single-row-group scan task (r14; the build side broadcasts and
    # needs no exchange)
    a = load_table(spark, sf_dir, "customer", rebalance=True).select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("bal_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("bal_b"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, ["nation", "segment"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dist <= 2)
        .select(
            "id_a",
            "id_b",
            "nation",
            "segment",
            dist.cast("bigint").alias("name_dist"),
            F.round(F.abs(F.col("bal_a") - F.col("bal_b")), 2).alias("bal_gap"),
            (
                (dist <= 1)
                & (F.abs(F.col("bal_a") - F.col("bal_b")) < 1000.0)
            ).alias("is_match"),
        )
    )
