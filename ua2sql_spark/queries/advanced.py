"""Advanced relational surface: pivot/unpivot, subqueries through the
SQL entry point, batch session windows, extended window/date/string
functions.

The subquery items run through ``spark.sql`` over registered temp views
— exercising the engine's SQL entry (SURVEY §3 entry 3): same Catalyst
path after parsing, including subquery decorrelation (§4 table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ua2sql_spark.catalog import load_table
from ua2sql_spark.queries.common import dsum, sql_dsum
from ua2sql_spark.registry import query


# ---------------------------------------------------------------------------
# A2/P8: pivot — revenue by mktsegment × orderstatus as columns.
# Explicit pivot values keep the schema static (required at scale: a
# dynamic pivot needs a driver-side distinct pass first).
# ---------------------------------------------------------------------------
@query(
    "q54_pivot",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS open_total,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS done_total,
           {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS part_total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q54_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    return (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(dsum("o_totalprice"))
        .withColumnsRenamed({"O": "open_total", "F": "done_total", "P": "part_total"})
    )


# ---------------------------------------------------------------------------
# Unpivot (stack): wide → long over the two rate columns.
# ---------------------------------------------------------------------------
@query(
    "q55_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, rate_type, rate FROM (
        SELECT l_orderkey, l_linenumber, 'discount' AS rate_type, l_discount AS rate
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax' AS rate_type, l_tax AS rate
        FROM lineitem
    ) WHERE l_orderkey % 10 = 0
    """,
)
def q55_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("stack(2, 'discount', l_discount, 'tax', l_tax) AS (rate_type, rate)"),
    )


# ---------------------------------------------------------------------------
# Correlated EXISTS subquery via the SQL entry point (decorrelates to a
# semi join — check §4: subquery decorrelation is Catalyst-built-in).
# ---------------------------------------------------------------------------
@query(
    "q56_correlated_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def q56_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM v_customer c
        WHERE EXISTS (
            SELECT 1 FROM v_orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery: orders above their customer's average.
# ---------------------------------------------------------------------------
@query(
    "q57_correlated_scalar",
    oracle="""
    WITH cust_avg AS (
        SELECT o_custkey AS k,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS STRING) AS DOUBLE) / COUNT(o_totalprice)
                   AS avg_price
        FROM orders GROUP BY o_custkey
    )
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders JOIN cust_avg ON o_custkey = k
    WHERE o_totalprice > 1.5 * avg_price
    """,
)
def q57_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    # Decimal-interior average for cross-engine determinism (common.py).
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM v_orders o1
        WHERE o_totalprice > 1.5 * (
            SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS STRING) AS DOUBLE)
                       / COUNT(o_totalprice)
            FROM v_orders o2 WHERE o2.o_custkey = o1.o_custkey
        )
        """
    )


# ---------------------------------------------------------------------------
# Uncorrelated scalar subquery: orders above the global average.
# ---------------------------------------------------------------------------
@query(
    "q58_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.8 * (
        SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS STRING) AS DOUBLE) / COUNT(o_totalprice)
        FROM orders
    )
    """,
)
def q58_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM v_orders
        WHERE o_totalprice > 1.8 * (
            SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS STRING) AS DOUBLE)
                       / COUNT(o_totalprice)
            FROM v_orders
        )
        """
    )


# ---------------------------------------------------------------------------
# T9 batch path: native session_window — same sessions as q37's manual
# lag+cumsum, expressed with Spark's built-in. Oracle derives the
# identical bounds (session end = last event + gap).
# ---------------------------------------------------------------------------
@query(
    "q59_session_window_batch",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def q59_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# W-extras: percent_rank, cume_dist, first/last/nth value over frames.
# ---------------------------------------------------------------------------
@query(
    "q60_window_analytics",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           FIRST_VALUE(o_orderkey) OVER w AS cheapest_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_cheapest
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def q60_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_cheapest"),
    )


# ---------------------------------------------------------------------------
# F-extras: date arithmetic — months_between-style, add_months, last_day.
# ---------------------------------------------------------------------------
@query(
    "q61_date_arithmetic",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS due_date,
           CAST(LAST_DAY(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
               AS days_since_epoch_start,
           CAST(DATE_TRUNC('week', o_orderdate) AS TIMESTAMP) AS order_week
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def q61_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return o.select("o_orderkey", "o_orderdate").withColumns(
        {
            # make_interval, not add_months: add_months returns DATE and
            # would silently drop any time-of-day where the oracle's
            # + INTERVAL 3 MONTH preserves it (latent divergence on
            # non-midnight timestamps)
            "due_date": F.expr("o_orderdate + make_interval(0, 3)"),
            "month_end": F.last_day("o_orderdate").cast("timestamp"),
            "days_since_epoch_start": F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ),
            "order_week": F.date_trunc("week", "o_orderdate"),
        }
    )


# ---------------------------------------------------------------------------
# F-extras: string distance + padding + case functions.
# ---------------------------------------------------------------------------
@query(
    "q62_string_advanced",
    oracle="""
    SELECT p_partkey, p_name,
           LEVENSHTEIN(p_name, 'green widget') AS dist_to_ref,
           LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
           REVERSE(p_name) AS name_rev,
           CAST(STRPOS(p_name, 'widget') AS INTEGER) AS widget_pos
    FROM part WHERE p_size <= 10
    """,
)
def q62_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return p.select(
        "p_partkey",
        "p_name",
        F.levenshtein(F.col("p_name"), F.lit("green widget")).alias("dist_to_ref"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.instr(F.col("p_name"), "widget").alias("widget_pos"),
    )


# ---------------------------------------------------------------------------
# posexplode / lockstep unnest: token positions.
# ---------------------------------------------------------------------------
@query(
    "q63_posexplode",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(1, len(string_split(text, ' ')) + 1)) AS BIGINT) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 50
    """,
)
def q63_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "word")


# ---------------------------------------------------------------------------
# q147: RECURSIVE CTE — Spark 4's WITH RECURSIVE (UnionLoop execution),
# the SQL surface for hierarchy walks the engine previously needed the
# components/pointer-doubling operators for. The hierarchy is derived
# deterministically from the data (parent(custkey) = custkey DIV 10 —
# a radix tree over the key space, depth ≈ log10 N, so the loop is
# provably bounded at any SF): every customer's depth-to-root and its
# top non-root ancestor. The DuckDB oracle runs the identical recursion
# with its own integer-division spelling. Scale note: each iteration is
# one self-join-free projection over the frontier (rows shrink 10× per
# step) — recursion depth scales with log of the key domain, not rows;
# for UNBOUNDED or data-skewed graphs the operators/components.py
# contraction remains the production path (bounded rounds, checkpointed
# lineage), with q147 as the SQL-native tier for shallow hierarchies.
# ---------------------------------------------------------------------------
@query(
    "q147_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE chain AS (
        SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
        FROM customer
        UNION ALL
        SELECT node, cur // 10, depth + 1 FROM chain WHERE cur > 0
    )
    SELECT node AS c_custkey,
           CAST(MAX(depth) AS BIGINT) AS depth_to_root,
           CAST(MAX(CASE WHEN cur > 0 AND cur < 10 THEN cur END) AS BIGINT)
               AS top_ancestor
    FROM chain
    GROUP BY node
    """,
)
def q147_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
            SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
            FROM v_customer
            UNION ALL
            SELECT node, cur DIV 10 AS cur, depth + 1 AS depth
            FROM chain WHERE cur > 0
        )
        SELECT node AS c_custkey,
               CAST(MAX(depth) AS BIGINT) AS depth_to_root,
               CAST(MAX(CASE WHEN cur > 0 AND cur < 10 THEN cur END) AS BIGINT)
                   AS top_ancestor
        FROM chain
        GROUP BY node
        """
    )


# ---------------------------------------------------------------------------
# q150: SQL PIPE syntax (Spark 4 |> operator) — the linear dataflow
# spelling of a classic filter→join→aggregate→order query. Same
# engine, same plan; the surface matters because pipeline SQL is how
# analysts increasingly write multi-stage transforms (and how query
# generators emit them). The oracle is the equivalent nested-SQL
# spelling in DuckDB.
# ---------------------------------------------------------------------------
@query(
    "q150_pipe_syntax",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F' AND l_quantity > 25
    GROUP BY l_returnflag
    """,
)
def q150_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_li_pipe")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_o_pipe")
    return spark.sql(
        """
        FROM v_li_pipe
        |> JOIN v_o_pipe ON l_orderkey = o_orderkey
        |> WHERE o_orderstatus = 'F' AND l_quantity > 25
        |> AGGREGATE COUNT(*) AS n_items,
                     CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(28,8))) AS DOUBLE) AS revenue
           GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# q151: COLLATION-aware grouping (Spark 4 COLLATE) — case-insensitive
# semantics pushed INTO the engine's comparison operators instead of
# lower() rewrites: grouping on `lang_mixed COLLATE UTF8_LCASE`
# collapses 'en'/'EN'/'En' into one group at hash/compare level (at
# 100 TB that is one shuffle key, not three, and no per-row lower()
# materialization). Mixed-case values are injected deterministically
# (x143's pattern) so the collapse provably happens; the output key is
# canonicalized with lower() only for display/oracle comparison.
# ---------------------------------------------------------------------------
@query(
    "q151_collation_group",
    oracle="""
    SELECT lower(CASE WHEN doc_id % 3 = 0 THEN upper(lang)
                      WHEN doc_id % 3 = 1 THEN concat(upper(substr(lang, 1, 1)),
                                                      substr(lang, 2))
                      ELSE lang END) AS lang_ci,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT doc_id % 7) AS BIGINT) AS n_shards
    FROM documents
    GROUP BY 1
    """,
)
def q151_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    mixed = (
        F.when(F.col("doc_id") % 3 == 0, F.upper("lang"))
        .when(F.col("doc_id") % 3 == 1, F.initcap("lang"))
        .otherwise(F.col("lang"))
    )
    ci = F.collate(mixed, "UTF8_LCASE")
    return (
        d.select(ci.alias("lang_mixed"), "doc_id")
        .groupBy("lang_mixed")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct(F.col("doc_id") % 7).cast("bigint").alias("n_shards"),
        )
        .select(
            F.lower(F.col("lang_mixed")).cast("string").alias("lang_ci"),
            "n_docs",
            "n_shards",
        )
    )


# ---------------------------------------------------------------------------
# q152: PARAMETERIZED SQL — spark.sql(..., args={...}) named-parameter
# binding (Spark 3.4+): values reach the plan as literals through the
# parser's typed parameter slot, never through string interpolation —
# the injection-safe surface every query service should use for
# user-supplied thresholds. Constant-folded like hand-written literals,
# so the plan (pushdown included) is identical to the inlined query.
# ---------------------------------------------------------------------------
_P_SEGMENT = "BUILDING"
_P_MIN_BAL = 5000.0


@query(
    "q152_parameterized_sql",
    oracle=f"""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {sql_dsum('c_acctbal')} AS total_bal
    FROM customer
    WHERE c_mktsegment = '{_P_SEGMENT}' AND c_acctbal > {_P_MIN_BAL}
    GROUP BY c_nationkey
    """,
)
def q152_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_cust_param")
    return spark.sql(
        """
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(28,8))) AS DOUBLE) AS total_bal
        FROM v_cust_param
        WHERE c_mktsegment = :segment AND c_acctbal > :min_bal
        GROUP BY c_nationkey
        """,
        args={"segment": _P_SEGMENT, "min_bal": _P_MIN_BAL},
    )


# ---------------------------------------------------------------------------
# x157: declarative data-quality constraints in ONE pass — the
# lakehouse "expectations" gate (Delta constraints / DLT expectations):
# before a corpus version ships, assert not-null, domain-range,
# uniqueness, and referential integrity, and report VIOLATION COUNTS
# per rule rather than failing on the first bad row. Scale shape:
# every row-local rule (null / range) is a conditional-sum inside ONE
# aggregate over ONE scan; uniqueness is a key-group count (one
# shuffle, partial-agg collapsed); referential integrity is a
# broadcast-able anti-join against the parent's key projection. Output
# is one row per rule — (rule, n_checked, n_violations, pass) — so the
# gate is a bounded, mergeable report at any table size.
# ---------------------------------------------------------------------------
@query(
    "x157_quality_constraints",
    oracle="""
    WITH rowchecks AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS null_qty,
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS range_qty,
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                             THEN 1 ELSE 0 END) AS BIGINT) AS range_disc,
               CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                             THEN 1 ELSE 0 END) AS BIGINT) AS bad_flag
        FROM lineitem
    ),
    dup AS (
        SELECT CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) AS n_dups,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM (
            SELECT COUNT(*) AS cnt FROM lineitem
            GROUP BY l_orderkey, l_linenumber
        )
    ),
    fk AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orphans
        FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IS NULL
    )
    SELECT rule, n_checked, n_violations, (n_violations = 0) AS pass
    FROM (
        SELECT 'not_null(l_quantity)' AS rule, n AS n_checked,
               null_qty AS n_violations FROM rowchecks
        UNION ALL
        SELECT 'range(l_quantity, 1, 50)', n, range_qty FROM rowchecks
        UNION ALL
        SELECT 'range(l_discount, 0, 0.1)', n, range_disc FROM rowchecks
        UNION ALL
        SELECT 'domain(l_returnflag in A,N,R)', n, bad_flag
        FROM rowchecks
        UNION ALL
        SELECT 'unique(l_orderkey, l_linenumber)', n_keys, n_dups FROM dup
        UNION ALL
        SELECT 'fk(l_orderkey -> orders)',
               (SELECT n FROM rowchecks), n_orphans FROM fk
    )
    """,
)
def x157_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def viol(cond) -> "F.Column":
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    rowchecks = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        viol(F.col("l_quantity").isNull()).alias("null_qty"),
        viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias(
            "range_qty"
        ),
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias(
            "range_disc"
        ),
        viol(~F.col("l_returnflag").isin("A", "N", "R")).alias("bad_flag"),
    )
    dup = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).cast("long").alias(
                "n_dups"
            ),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
        )
    )
    fk = (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
    )

    rc = rowchecks.crossJoin(F.broadcast(dup)).crossJoin(F.broadcast(fk))

    def rule(name: str, checked, violations) -> DataFrame:
        return rc.select(
            F.lit(name).alias("rule"),
            checked.alias("n_checked"),
            violations.alias("n_violations"),
            (violations == 0).alias("pass"),
        )

    return (
        rule("not_null(l_quantity)", F.col("n"), F.col("null_qty"))
        .unionByName(rule("range(l_quantity, 1, 50)", F.col("n"), F.col("range_qty")))
        .unionByName(
            rule("range(l_discount, 0, 0.1)", F.col("n"), F.col("range_disc"))
        )
        .unionByName(
            rule("domain(l_returnflag in A,N,R)", F.col("n"), F.col("bad_flag"))
        )
        .unionByName(
            rule("unique(l_orderkey, l_linenumber)", F.col("n_keys"), F.col("n_dups"))
        )
        .unionByName(
            rule("fk(l_orderkey -> orders)", F.col("n"), F.col("n_orphans"))
        )
    )


# ---------------------------------------------------------------------------
# q153: SQL SCRIPTING (Spark 4 BEGIN/DECLARE/WHILE procedural blocks,
# SQL/PSM) — the control-flow-in-SQL surface a migrating warehouse user
# reaches for: an iterative threshold search runs AS ONE SCRIPT inside
# the engine (each loop iteration is a full distributed aggregate;
# the loop itself is driver-side control flow, exactly how an
# analyst's stored procedure behaves). Finds the largest power-of-two
# price cutoff keeping >= 5% of orders. DuckDB has no SQL/PSM — the
# oracle replays the loop as a RECURSIVE CTE, pinning the scripting
# engine's arithmetic against a declarative replay.
# ---------------------------------------------------------------------------
_SCRIPT_START = 1 << 19  # 524288, far above any o_totalprice


@query(
    "q153_sql_scripting",
    oracle=f"""
    WITH RECURSIVE tot AS (SELECT COUNT(*) AS n_orders FROM orders),
    walk(cutoff, n_kept) AS (
        SELECT CAST({_SCRIPT_START} AS BIGINT),
               (SELECT COUNT(*) FROM orders WHERE o_totalprice >= {_SCRIPT_START})
        UNION ALL
        SELECT w.cutoff // 2,
               (SELECT COUNT(*) FROM orders o, tot t
                WHERE o.o_totalprice >= w.cutoff // 2
                  AND w.n_kept * 20 < t.n_orders)
        FROM walk w, tot t WHERE w.n_kept * 20 < t.n_orders
    )
    SELECT CAST(cutoff AS BIGINT) AS cutoff,
           CAST(n_kept AS BIGINT) AS n_kept,
           CAST((SELECT n_orders FROM tot) AS BIGINT) AS n_orders
    FROM walk w2, tot t2 WHERE w2.n_kept * 20 >= t2.n_orders
    """,
)
def q153_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_o_script")
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(f"""
        BEGIN
          DECLARE cutoff BIGINT = {_SCRIPT_START};
          DECLARE n_kept BIGINT = 0;
          DECLARE n_orders BIGINT = 0;
          SET n_orders = (SELECT COUNT(*) FROM v_o_script);
          SET n_kept = (SELECT COUNT(*) FROM v_o_script
                        WHERE o_totalprice >= cutoff);
          WHILE n_kept * 20 < n_orders DO
            SET cutoff = cutoff DIV 2;
            SET n_kept = (SELECT COUNT(*) FROM v_o_script
                          WHERE o_totalprice >= cutoff);
          END WHILE;
          SELECT cutoff, n_kept, n_orders;
        END
        """)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)


# ---------------------------------------------------------------------------
# q154: SQL UDFs (Spark 4 CREATE FUNCTION ... RETURN <expr>) — reusable
# business logic declared IN SQL and resolved by the catalog, the
# migration target for warehouse scalar functions. Unlike Python UDFs
# these inline into the plan at analysis time (whole-stage codegen,
# full predicate pushdown through the call — zero serialization), so
# they are the 100 TB-safe way to share expression logic. The oracle
# inlines the same expressions by hand, pinning the catalog
# resolution + inlining path against a literal replay.
# ---------------------------------------------------------------------------
@query(
    "q154_sql_udf",
    oracle=f"""
    SELECT l_returnflag,
           CASE WHEN l_extendedprice * (1 - l_discount) < 20000 THEN 'low'
                WHEN l_extendedprice * (1 - l_discount) < 45000 THEN 'mid'
                ELSE 'high' END AS band,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS net_revenue
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def q154_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_li_udf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_band(x DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN x < 20000 THEN 'low' "
        "WHEN x < 45000 THEN 'mid' ELSE 'high' END"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               price_band(net_price(l_extendedprice, l_discount)) AS band,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(net_price(l_extendedprice, l_discount)
                             AS DECIMAL(28,8))) AS DOUBLE) AS net_revenue
        FROM v_li_udf
        GROUP BY l_returnflag, band
        """
    )


# ---------------------------------------------------------------------------
# F12g: LATERAL correlated subquery — per-customer top-2 orders via a
# dependent subquery with ORDER BY + LIMIT, the SQL-surface twin of
# q25's DataFrame top-k. Distinct from the UDTF LATERAL rows (x76/
# x149): here the lateral relation is a correlated SUBQUERY that
# Catalyst must decorrelate (DecorrelateInnerQuery rewrites the
# per-row limit into a rank over the join), so the plan never executes
# one subquery per outer row — the 100 TB shape is one join + one
# bounded window, not N nested loops. Total (price DESC, orderkey)
# tiebreak keeps the row choice engine-exact.
# ---------------------------------------------------------------------------
@query(
    "q155_lateral_topk",
    oracle="""
    SELECT c.c_custkey AS custkey, t.o_orderkey AS orderkey,
           CAST(t.o_totalprice AS DOUBLE) AS totalprice
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) t
    WHERE c.c_custkey <= 200
    """,
)
def q155_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_cust_lat")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_ord_lat")
    return spark.sql(
        """
        SELECT c.c_custkey AS custkey, t.o_orderkey AS orderkey,
               CAST(t.o_totalprice AS DOUBLE) AS totalprice
        FROM v_cust_lat c
        JOIN LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM v_ord_lat o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
        WHERE c.c_custkey <= 200
        """
    )


# ---------------------------------------------------------------------------
# F12h: GROUP BY ALL + ORDER BY + LIMIT/OFFSET — the modern-SQL
# ergonomics both engines added (Spark 3.4 / DuckDB): grouping keys
# inferred from the non-aggregate select list, pagination via OFFSET.
# Deterministic: the total (priority, status) order makes the OFFSET
# window exact. Plan note: LIMIT+OFFSET plans as a single
# CollectLimit/GlobalLimit with offset — no full sort materialization
# beyond the TakeOrdered of limit+offset rows.
# ---------------------------------------------------------------------------
@query(
    "q156_group_by_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ALL
    ORDER BY o_orderpriority, o_orderstatus
    LIMIT 6 OFFSET 2
    """,
)
def q156_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_ord_gba")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM v_ord_gba
        GROUP BY ALL
        ORDER BY o_orderpriority, o_orderstatus
        LIMIT 6 OFFSET 2
        """
    )


# ---------------------------------------------------------------------------
# F12i: INTERSECT ALL / EXCEPT ALL — the multiplicity-preserving set
# ops q12's DISTINCT variants don't cover (bag semantics: a key open
# three times and filled twice survives EXCEPT ALL once). Spark plans
# these as joins over counted groups (no row-at-a-time dedup); the
# oracle replays the same bag algebra.
# ---------------------------------------------------------------------------
@query(
    "q157_setop_all_variants",
    oracle="""
    SELECT custkey, 'both_bag' AS bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ) GROUP BY custkey
    UNION ALL
    SELECT custkey, 'open_surplus' AS bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ) GROUP BY custkey
    """,
)
def q157_setop_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_k = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    done_k = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    both = (
        open_k.intersectAll(done_k)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select("custkey", F.lit("both_bag").alias("bucket"), "n")
    )
    surplus = (
        open_k.exceptAll(done_k)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select("custkey", F.lit("open_surplus").alias("bucket"), "n")
    )
    return both.unionByName(surplus)


# ---------------------------------------------------------------------------
# W3b: value-based RANGE frame — the 90-day rolling revenue per
# customer: RANGE BETWEEN 90 PRECEDING AND CURRENT ROW over an integer
# day index. A distinct execution path from every ROWS frame in the
# suite (frame membership is decided by ORDER-BY VALUE distance, so
# tied days share one frame and gaps shrink it — WindowExec's range
# bound evaluator, not the row counter). Determinism: RANGE permits
# exactly one order expression (no tiebreak column), so tied-day rows
# enter the frame as a SET and the in-frame sum MUST be order-free —
# the DECIMAL(28,8) interior makes it exact in both engines; the day
# index itself is exact integer date arithmetic from a fixed epoch.
# ---------------------------------------------------------------------------
@query(
    "q158_range_frame_rolling",
    oracle="""
    WITH o AS (
        SELECT o_custkey AS custkey, o_orderkey AS orderkey,
               datediff('day', DATE '1990-01-01',
                        CAST(o_orderdate AS DATE)) AS day_no,
               CAST(o_totalprice AS DECIMAL(28,8)) AS p
        FROM orders WHERE o_custkey <= 300
    )
    SELECT custkey, orderkey, CAST(day_no AS BIGINT) AS day_no,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window,
           CAST(CAST(SUM(p) OVER w AS VARCHAR) AS DOUBLE) AS sum_90d
    FROM o
    WINDOW w AS (PARTITION BY custkey ORDER BY day_no
                 RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
    """,
)
def q158_range_frame_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 300)
    base = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01"))
        .cast("long")
        .alias("day_no"),
        F.col("o_totalprice").cast("decimal(28,8)").alias("p"),
    )
    w = (
        Window.partitionBy("custkey")
        .orderBy("day_no")
        .rangeBetween(-90, Window.currentRow)
    )
    return base.select(
        "custkey",
        "orderkey",
        "day_no",
        F.count(F.lit(1)).over(w).cast("long").alias("n_in_window"),
        F.sum("p").over(w).cast("string").cast("double").alias("sum_90d"),
    )
