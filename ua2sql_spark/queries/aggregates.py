"""Aggregation surface: SURVEY.md §2.4 (A2–A9).

The reference's only aggregate is a running ingest row-count
(ua2sql.py:218,238-246); everything else is the analytic surface the
landed tables exist for. Catalyst performs partial (map-side) + final
aggregation automatically — the distributed analog of the reference's
hand-rolled 1000-row batch flush (ua2sql.py:238-242).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ua2sql_spark.catalog import load_table
from ua2sql_spark.queries.common import davg, dsum, sql_davg, sql_dsum
from ua2sql_spark.registry import query


# ---------------------------------------------------------------------------
# A2 full basic-aggregate set + A9 HAVING post-filter.
# ---------------------------------------------------------------------------
@query(
    "q13_groupby_having",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price,
           {sql_davg('o_totalprice')} AS avg_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    HAVING COUNT(*) > 10
    """,
)
def q13_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
            davg("o_totalprice").alias("avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .filter(F.col("n_orders") > 10)
    )


# ---------------------------------------------------------------------------
# A3: distinct + count-distinct (exact). DAU-style: distinct users per
# event_type. Exact count-distinct shuffles by (group, user); at 100 TB
# switch to q15's approx variant.
# ---------------------------------------------------------------------------
@query(
    "q14_count_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS unique_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def q14_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("unique_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# A4: approximate count-distinct (HyperLogLog++). The 100 TB path for
# DAU — no exact-distinct shuffle. Spark's HLL++ and DuckDB's approx
# sketches differ by design, so the oracle checks the *exact* bound and
# this query emits both exact and approx plus their relative error: the
# hashable contract is "approx within 5% of exact" encoded as a boolean.
# ---------------------------------------------------------------------------
@query(
    "q15_approx_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
)
def q15_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.greatest(F.col("exact_users") * F.lit(0.05), F.lit(5.0))
            ).alias("approx_ok"),
        )
    )


# ---------------------------------------------------------------------------
# A5: ROLLUP — platform×date-style revenue rollup on status×priority.
# grouping() flags disambiguate NULL-as-subtotal from NULL data.
# ---------------------------------------------------------------------------
@query(
    "q16_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q16_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    ).select(
        "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n_orders", "total_price"
    )


# ---------------------------------------------------------------------------
# A5b: CUBE over two independent dimensions.
# ---------------------------------------------------------------------------
@query(
    "q17_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q17_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.count(F.lit(1)).alias("n_lines"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n_lines")


# ---------------------------------------------------------------------------
# A6: exact continuous percentiles / median over order values.
# Both engines sort-and-interpolate with the same definition
# (linear interpolation at p*(n-1)).
# ---------------------------------------------------------------------------
@query(
    "q18_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS p50,
           ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90,
           ROUND(QUANTILE_CONT(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q18_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


# ---------------------------------------------------------------------------
# A7: max_by / min_by — the exact semantics of the reference's checkpoint
# lookup (SELECT … ORDER BY ts DESC LIMIT 1, ua2sql.py:165-176): latest
# event id per user. Tie-broken on event_id so the answer is total-order
# deterministic; the oracle states the same thing as a window query.
# ---------------------------------------------------------------------------
@query(
    "q19_max_by_checkpoint",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (
        SELECT user_id, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q19_max_by_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy("user_id").agg(
        F.max_by("event_id", key).alias("last_event_id"),
        F.max_by("event_type", key).alias("last_event_type"),
    )


# ---------------------------------------------------------------------------
# A8: collect_list / collect_set — session event sequences. Emitted as a
# sorted, joined string so the value is deterministic and hashable.
# ---------------------------------------------------------------------------
@query(
    "q20_collect_set",
    oracle="""
    SELECT user_id,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(event_type))), ',') AS event_types,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def q20_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("event_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# A2 variant: variance/stddev from exact decimal sums (deterministic
# across partitionings, unlike streaming moment aggregates).
# ---------------------------------------------------------------------------
@query(
    "q21_variance_exact",
    oracle=f"""
    SELECT event_type,
           COUNT(value) AS n,
           ROUND(({sql_dsum('value * value')} - {sql_dsum('value')} * {sql_dsum('value')} / COUNT(value))
                 / (COUNT(value) - 1), 4) AS var_value
    FROM events
    GROUP BY event_type
    """,
)
def q21_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    n = F.count("value")
    s1 = dsum("value")
    s2 = dsum(F.col("value") * F.col("value"))
    return e.groupBy("event_type").agg(
        n.alias("n"),
        F.round((s2 - s1 * s1 / n) / (n - F.lit(1)), 4).alias("var_value"),
    )


# ---------------------------------------------------------------------------
# A6b: approximate percentiles (GK sketch) under an exactness contract —
# the 100 TB quantile path. percentile_approx is mergeable (one shuffle
# of bounded sketches instead of a full sort of the column), and the
# query pins it to the exact interpolated percentile within 1%: the
# hashable contract is the boolean, same pattern as q15's HLL bound.
# ---------------------------------------------------------------------------
@query(
    "q114_approx_percentile_contract",
    oracle="""
    SELECT o_orderstatus,
           ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS p50_exact,
           ROUND(QUANTILE_CONT(o_totalprice, 0.95), 4) AS p95_exact,
           TRUE AS approx_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q114_approx_percentile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("e50"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("e95"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("a50"),
        F.percentile_approx("o_totalprice", F.lit(0.95), F.lit(10000)).alias("a95"),
    )

    def within(e, a):
        return F.abs(a - e) <= F.greatest(F.abs(e) * F.lit(0.01), F.lit(1.0))

    return agg.select(
        "o_orderstatus",
        F.round(F.col("e50"), 4).alias("p50_exact"),
        F.round(F.col("e95"), 4).alias("p95_exact"),
        (
            within(F.col("e50"), F.col("a50")) & within(F.col("e95"), F.col("a95"))
        ).alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# A4b: mergeable HLL sketches (Apache DataSketches) under a union
# contract — the 100 TB distributed-count-distinct path. Each data
# split builds its own bounded sketch; sketches UNION losslessly (the
# property that lets 1000 executors count independently and merge at
# the driver / in a rollup table), and the query pins the merged
# estimate to the exact distinct within 5%. Exactly q114's contract
# pattern: the hashable signal is the boolean.
# ---------------------------------------------------------------------------
@query(
    "q123_hll_union_contract",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custkeys,
           TRUE AS union_ok
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q123_hll_union_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders", rebalance=True)
    even = F.when(F.col("o_orderkey") % 2 == 0, F.col("o_custkey"))
    odd = F.when(F.col("o_orderkey") % 2 == 1, F.col("o_custkey"))
    agg = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg(even, F.lit(14)).alias("s_even"),
        F.hll_sketch_agg(odd, F.lit(14)).alias("s_odd"),
        F.countDistinct("o_custkey").alias("exact_custkeys"),
    )
    est = F.hll_sketch_estimate(F.hll_union("s_even", "s_odd"))
    tol = F.greatest(F.col("exact_custkeys") * F.lit(0.05), F.lit(10.0))
    return agg.select(
        "o_orderpriority",
        "exact_custkeys",
        (F.abs(est - F.col("exact_custkeys")) <= tol).alias("union_ok"),
    )


# ---------------------------------------------------------------------------
# q137: correlation / covariance / regression slope from EXACT sums —
# the distributed bivariate-statistics shape. Spark's corr()/covar_*
# stream Welford-style moments whose float accumulation is
# partitioning-dependent; at 1000 executors two runs of the same query
# can differ in the last bits. Instead: five exact decimal sums (Sx,
# Sy, Sxy, Sxx, Syy — each a one-pass partial-aggregate shuffle, all
# five share ONE exchange) and the closed forms on top. Identical
# operands → identical doubles in every engine and every partitioning;
# this is the same exact-interior policy as q21's variance.
# ---------------------------------------------------------------------------
@query(
    "q137_bivariate_stats",
    oracle=f"""
    WITH sums AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               {sql_dsum('l_quantity')} AS sx,
               {sql_dsum('l_extendedprice')} AS sy,
               {sql_dsum('l_quantity * l_extendedprice')} AS sxy,
               {sql_dsum('l_quantity * l_quantity')} AS sxx,
               {sql_dsum('l_extendedprice * l_extendedprice')} AS syy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)
               AS corr_qty_price,
           ROUND((sxy - sx * sy / n) / (n - 1), 4) AS covar_samp,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta_price_on_qty
    FROM sums
    """,
)
def q137_bivariate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", rebalance=True)
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        dsum(x * x).alias("sxx"),
        dsum(y * y).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return sums.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
        F.round((sxy - sx * sy / n) / (n - 1), 4).alias("covar_samp"),
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).alias(
            "beta_price_on_qty"
        ),
    )


# ---------------------------------------------------------------------------
# q139: theta-sketch SET-OPERATION contract — the sketch family HLL
# cannot provide: distinct-set INTERSECTION and DIFFERENCE estimates
# (DataSketches theta, Spark 4.1). The 1000-executor audience-overlap
# shape: build one sketch per segment (mergeable partials, one tiny
# final row each), intersect/difference driver-side in the plan. The
# exact overlap counts are computed alongside from one custkey-grouped
# pass and hash-checked; the sketch estimates are pinned to within
# max(5%, 50) of exact via q15-style boolean contracts (theta rsd at
# the default 4096 nominal entries is ~1.6%, so 5% is ~3 sigma).
# ---------------------------------------------------------------------------
@query(
    "q139_theta_setops_contract",
    oracle="""
    WITH flags AS (
        SELECT o_custkey,
               MAX(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS a,
               MAX(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END) AS b
        FROM orders
        WHERE year(o_orderdate) IN (1996, 1997)
        GROUP BY o_custkey
    )
    SELECT CAST(SUM(a * b) AS BIGINT) AS n_both,
           CAST(SUM(a * (1 - b)) AS BIGINT) AS n_only_a,
           CAST(SUM(b * (1 - a)) AS BIGINT) AS n_only_b,
           TRUE AS inter_ok,
           TRUE AS diff_ok
    FROM flags
    """,
)
def q139_theta_setops_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    base = o.filter(yr.isin(1996, 1997)).select(
        "o_custkey", yr.alias("y")
    )
    flags = base.groupBy("o_custkey").agg(
        F.max(F.when(F.col("y") == 1996, 1).otherwise(0)).alias("a"),
        F.max(F.when(F.col("y") == 1997, 1).otherwise(0)).alias("b"),
    )
    exact = flags.agg(
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n_both"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n_only_a"),
        F.sum(F.col("b") * (1 - F.col("a"))).cast("bigint").alias("n_only_b"),
    )
    ska = (
        base.filter(F.col("y") == 1996)
        .agg(F.theta_sketch_agg("o_custkey").alias("ska"))
    )
    skb = (
        base.filter(F.col("y") == 1997)
        .agg(F.theta_sketch_agg("o_custkey").alias("skb"))
    )
    est = ska.crossJoin(skb).select(
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("ska"), F.col("skb"))
        ).alias("est_both"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("ska"), F.col("skb"))
        ).alias("est_only_a"),
    )

    def ok(est_col: str, exact_col: str):
        tol = F.greatest(F.col(exact_col) * 0.05, F.lit(50.0))
        return F.abs(F.col(est_col) - F.col(exact_col)) <= tol

    return exact.crossJoin(est).select(
        "n_both",
        "n_only_a",
        "n_only_b",
        ok("est_both", "n_both").alias("inter_ok"),
        ok("est_only_a", "n_only_a").alias("diff_ok"),
    )


# ---------------------------------------------------------------------------
# q140: EXACT mergeable distinct-count via bitmaps — the third tier of
# the count-distinct ladder (exact shuffle-heavy COUNT(DISTINCT) →
# approximate HLL q123 → exact-AND-mergeable bitmaps). Values are
# bucketed (bitmap_bucket_number) and bit-positioned into 4KB bitmap
# chunks built per (group, bucket, shard); bitmap_or_agg merges shards
# exactly — partial aggregation works, re-aggregation works, and the
# count is EXACT, unlike any sketch. This is how a 1000-executor
# pipeline maintains per-partition distinct-count cubes it can roll up
# later without a re-scan. Oracle: plain COUNT(DISTINCT) — equality,
# not a tolerance contract.
# ---------------------------------------------------------------------------
@query(
    "q140_bitmap_exact_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q140_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # shard = physical-split stand-in (year here): bitmaps built per
    # shard then OR-merged, proving the partial/merge contract.
    per_shard = o.groupBy(
        "o_orderpriority",
        F.bitmap_bucket_number("o_custkey").alias("bucket"),
        F.year("o_orderdate").alias("shard"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("o_custkey")).alias("bm")
    )
    merged = per_shard.groupBy("o_orderpriority", "bucket").agg(
        F.bitmap_or_agg("bm").alias("bm")
    )
    return merged.groupBy("o_orderpriority").agg(
        F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_distinct")
    )


# ---------------------------------------------------------------------------
# q145: A/B experiment readout — Welch's t-statistic per metric from
# EXACT sums (the q137/q21 policy applied to experimentation): the
# assignment is a deterministic user-id hash (the operators/split.py
# discipline — rerun-stable, no RNG), and every moment derives from
# decimal-interior sums, so the verdict bit is identical across
# engines, partitionings, and reruns. IEEE sqrt/division are
# correctly-rounded on identical operands, so even t itself matches
# bit-for-bit. One shuffle (event_type × arm partial aggregate),
# closed forms on one row per metric.
# ---------------------------------------------------------------------------
@query(
    "q145_ab_welch_ttest",
    oracle=f"""
    WITH arms AS (
        SELECT event_type,
               CAST(user_id % 2 AS INTEGER) AS arm,
               CAST(COUNT(*) AS DOUBLE) AS n,
               {sql_dsum('value')} AS s,
               {sql_dsum('value * value')} AS ss
        FROM events
        GROUP BY event_type, CAST(user_id % 2 AS INTEGER)
    ),
    wide AS (
        SELECT event_type,
               MAX(CASE WHEN arm = 0 THEN n END) AS na,
               MAX(CASE WHEN arm = 0 THEN s END) AS sa,
               MAX(CASE WHEN arm = 0 THEN ss END) AS ssa,
               MAX(CASE WHEN arm = 1 THEN n END) AS nb,
               MAX(CASE WHEN arm = 1 THEN s END) AS sb,
               MAX(CASE WHEN arm = 1 THEN ss END) AS ssb
        FROM arms GROUP BY event_type
    )
    SELECT event_type,
           CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           ROUND(sa / na, 6) AS mean_a,
           ROUND(sb / nb, 6) AS mean_b,
           ROUND((sa / na - sb / nb)
                 / SQRT(((ssa - sa * sa / na) / (na - 1)) / na
                        + ((ssb - sb * sb / nb) / (nb - 1)) / nb), 6) AS t_welch,
           ABS((sa / na - sb / nb)
               / SQRT(((ssa - sa * sa / na) / (na - 1)) / na
                      + ((ssb - sb * sb / nb) / (nb - 1)) / nb)) > 1.96
               AS significant_95
    FROM wide
    """,
)
def q145_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    arms = e.groupBy(
        "event_type", (F.col("user_id") % 2).cast("int").alias("arm")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(v).alias("s"),
        dsum(v * v).alias("ss"),
    )

    def pick(col: str, arm: int):
        return F.max(F.when(F.col("arm") == arm, F.col(col)))

    wide = arms.groupBy("event_type").agg(
        pick("n", 0).alias("na"), pick("s", 0).alias("sa"), pick("ss", 0).alias("ssa"),
        pick("n", 1).alias("nb"), pick("s", 1).alias("sb"), pick("ss", 1).alias("ssb"),
    )
    na, sa, ssa = F.col("na"), F.col("sa"), F.col("ssa")
    nb, sb, ssb = F.col("nb"), F.col("sb"), F.col("ssb")
    t = (sa / na - sb / nb) / F.sqrt(
        ((ssa - sa * sa / na) / (na - 1)) / na
        + ((ssb - sb * sb / nb) / (nb - 1)) / nb
    )
    return wide.select(
        "event_type",
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        F.round(sa / na, 6).alias("mean_a"),
        F.round(sb / nb, 6).alias("mean_b"),
        F.round(t, 6).alias("t_welch"),
        (F.abs(t) > 1.96).alias("significant_95"),
    )

# ---------------------------------------------------------------------------
# q146: equi-WIDTH histogram — the fixed-bin complement to NTILE's
# equi-depth deciles (q118) and the percentile sketches (q114): bin
# boundaries are a pure function of the domain (no data-dependent
# cuts), so per-partition histograms merge by adding counts — the
# mergeable shape data-profiling passes want. The bucket expression is
# written out identically in both engines (floor((x-lo)·n/(hi-lo))+1
# with edge clamps) rather than via a width_bucket builtin, so the
# bucket id is the same IEEE arithmetic on both sides at every
# boundary. One partial-agg shuffle on (priority, bucket).
# ---------------------------------------------------------------------------
_HIST_LO, _HIST_HI, _HIST_N = 0.0, 600_000.0, 12


def _bucket_sql(x: str) -> str:
    return (
        f"CASE WHEN {x} < {_HIST_LO} THEN 0 "
        f"WHEN {x} >= {_HIST_HI} THEN {_HIST_N + 1} "
        f"ELSE CAST(FLOOR((({x} - {_HIST_LO}) * {_HIST_N}.0) / ({_HIST_HI} - {_HIST_LO})) AS BIGINT) + 1 END"
    )


@query(
    "q146_histogram_equi_width",
    oracle=f"""
    SELECT o_orderpriority,
           CAST({_bucket_sql('o_totalprice')} AS BIGINT) AS bucket,
           ROUND({_HIST_LO} + ({_bucket_sql('o_totalprice')} - 1)
                 * ({_HIST_HI} - {_HIST_LO}) / {_HIST_N}, 2) AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def q146_histogram_equi_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice")
    bucket = (
        F.when(x < _HIST_LO, F.lit(0))
        .when(x >= _HIST_HI, F.lit(_HIST_N + 1))
        .otherwise(
            F.floor(((x - _HIST_LO) * float(_HIST_N)) / (_HIST_HI - _HIST_LO)).cast(
                "bigint"
            )
            + 1
        )
    )
    return (
        o.select(
            "o_orderpriority",
            bucket.cast("bigint").alias("bucket"),
            F.round(
                _HIST_LO + (bucket - 1) * (_HIST_HI - _HIST_LO) / _HIST_N, 2
            ).alias("bucket_lo"),
        )
        .groupBy("o_orderpriority", "bucket", "bucket_lo")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# x185: Count-Min frequency-sketch contract — completes the mergeable-
# sketch suite (q123 HLL distinct, q139 theta set-ops, q114 GK
# percentiles, q140 bitmap exactness) with the FREQUENCY sketch: a
# d×w cell grid where cell (j, h_j(key)) accumulates every occurrence,
# so the whole sketch merges across 1000 executors by pure cell-wise
# addition and est(k) = min_j cell(j, h_j(k)). Two structural
# guarantees are gated per key against the exact x107-style counts:
# CMS NEVER underestimates (est ≥ true, an identity of the min-of-
# sums construction), and the overestimate stays within the ε·N
# collision bound — both as integer compares (64·err ≤ 3·N ≈ 4.7%·N,
# ~3× the observed max at sf0.01 under the pinned md5 hashes, margin
# for per-round data regeneration).
#
# Scale shape: contributions are map-only (d rows per input row via an
# in-row explode), the sketch is ONE d·w-row aggregate, estimates join
# the top-k keys against the broadcast 256-row sketch. The exact side
# is one groupBy + TakeOrdered — the same cost x107 already pays.
# ---------------------------------------------------------------------------
_CMS_D = 4
_CMS_W = 64


@query(
    "x185_cms_heavy_hitters_contract",
    oracle=f"""
    WITH contrib AS (
        SELECT o_custkey AS k, j,
               (('0x' || substring(md5(CAST(j AS VARCHAR) || '|' ||
                   CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT % {_CMS_W}) AS b
        FROM orders, (SELECT unnest([0, 1, 2, 3]) AS j)
    ),
    cells AS (SELECT j, b, COUNT(*) AS c FROM contrib GROUP BY j, b),
    n AS (SELECT COUNT(*) AS total FROM orders),
    exact AS (
        SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS true_n
        FROM orders GROUP BY 1
        ORDER BY true_n DESC, k LIMIT 10
    ),
    est AS (
        SELECT e.k, e.true_n, CAST(MIN(c.c) AS BIGINT) AS cms_est
        FROM exact e
        JOIN (SELECT DISTINCT k, j, b FROM contrib) kb ON kb.k = e.k
        JOIN cells c ON c.j = kb.j AND c.b = kb.b
        GROUP BY e.k, e.true_n
    )
    SELECT k AS custkey, true_n, cms_est,
           CAST(cms_est - true_n AS BIGINT) AS over_err,
           CAST(CASE WHEN cms_est >= true_n THEN 1 ELSE 0 END AS INT)
               AS never_under,
           CAST(CASE WHEN {_CMS_W} * (cms_est - true_n) <= 3 * n.total
                THEN 1 ELSE 0 END AS INT) AS within_bound
    FROM est, n
    ORDER BY custkey
    """,
)
def x185_cms_heavy_hitters_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def bucket(j_col, key_col):
        return F.conv(
            F.substring(
                F.md5(F.concat(j_col.cast("string"), F.lit("|"), key_col.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint") % _CMS_W

    contrib = o.select(
        F.col("o_custkey").alias("k"),
        F.explode(F.array(*[F.lit(j) for j in range(_CMS_D)])).alias("j"),
    ).select("k", "j", bucket(F.col("j"), F.col("k")).alias("b"))
    cells = contrib.groupBy("j", "b").agg(F.count(F.lit(1)).alias("c"))
    total = o.agg(F.count(F.lit(1)).alias("total"))
    exact = (
        o.groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_n"))
        .orderBy(F.desc("true_n"), "k")
        .limit(10)
    )
    key_buckets = exact.select(
        "k",
        "true_n",
        F.explode(F.array(*[F.lit(j) for j in range(_CMS_D)])).alias("j"),
    ).select("k", "true_n", "j", bucket(F.col("j"), F.col("k")).alias("b"))
    est = (
        key_buckets.join(F.broadcast(cells), ["j", "b"])
        .groupBy("k", "true_n")
        .agg(F.min("c").cast("bigint").alias("cms_est"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            F.col("k").alias("custkey"),
            "true_n",
            "cms_est",
            (F.col("cms_est") - F.col("true_n")).cast("bigint").alias("over_err"),
            F.when(F.col("cms_est") >= F.col("true_n"), 1)
            .otherwise(0)
            .cast("int")
            .alias("never_under"),
            F.when(
                F.lit(_CMS_W) * (F.col("cms_est") - F.col("true_n"))
                <= F.lit(3) * F.col("total"),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("within_bound"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# x203: Mann-Whitney U (Wilcoxon rank-sum) two-sample test — the
# rank-based nonparametric sibling of q145's Welch t (means) and
# x173's KS (distribution distance): "is sample A stochastically
# larger than sample B?", robust to outliers and any monotone
# transform. Round 11; no reference analog (ua2sql.py has no
# statistics at all) — SURVEY §2.11's experiment-analysis family.
#
# Exactness discipline: tie-averaged ranks are half-integers, so the
# statistic is carried DOUBLED (r1_x2, u1_x2, u2_x2) and every hashed
# rank quantity is an exact integer — held in a DECIMAL(38,0) interior
# and emitted as a STRING (round 12: the rank sum grows as 2n² and the
# tie term Σ(t³−t) as Σc³, both past BIGINT at counts a 100 TB table
# reaches; the tiled slope smoke caught the sibling x207 overflowing).
# No float enters until the final z-score, which follows the q145
# precedent (identical closed form in both engines on identical exact
# operands, ROUND(,6); DuckDB VARCHAR-mediates int128→double).
#
# Scale shape: ranking raw rows needs a GLOBAL sort — the classic
# single-partition window trap. Instead the input is first reduced to
# per-VALUE counts (one partial-agg shuffle), and the cumulative rank
# window runs over the distinct-value domain, which for a discrete
# metric is tiny (50 quantities here) and for a continuous one should
# be quantized first (q146's equi-width binning). The identity
# u1_x2 + u2_x2 = 2·n1·n2 is emitted as a cross-engine tripwire.
# ---------------------------------------------------------------------------
@query(
    "x203_mann_whitney_u",
    oracle="""
    WITH s AS (
        SELECT CAST(l_quantity AS BIGINT) AS v, l_linenumber = 1 AS is_a
        FROM lineitem WHERE l_linenumber IN (1, 2)
    ),
    g AS (
        SELECT v, COUNT(*) AS c, COUNT(*) FILTER (WHERE is_a) AS ca
        FROM s GROUP BY v
    ),
    r AS (
        SELECT v, c, ca,
               COALESCE(SUM(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS less
        FROM g
    ),
    tot AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS n1,
               CAST(SUM(c - ca) AS BIGINT) AS n2,
               SUM(CAST(ca AS HUGEINT) * (2 * less + c + 1)) AS r1_x2,
               SUM(CAST(c AS HUGEINT) * c * c - c) AS tie_term
        FROM r
    )
    SELECT n1, n2,
           CAST(r1_x2 AS VARCHAR) AS r1_x2,
           CAST(tie_term AS VARCHAR) AS tie_term,
           CAST(r1_x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS VARCHAR) AS u1_x2,
           CAST(2 * CAST(n1 AS HUGEINT) * n2
                - (r1_x2 - CAST(n1 AS HUGEINT) * (n1 + 1)) AS VARCHAR)
               AS u2_x2,
           ROUND((CAST(CAST(r1_x2 - CAST(n1 AS HUGEINT) * (n1 + 1)
                            AS VARCHAR) AS DOUBLE) / 2.0
                  - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
                 / SQRT((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                        * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                           - CAST(CAST(tie_term AS VARCHAR) AS DOUBLE)
                             / (CAST(n1 + n2 AS DOUBLE)
                                * (CAST(n1 + n2 AS DOUBLE) - 1.0)))), 6)
               AS z_score
    FROM tot
    """,
)
def x203_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U over lineitem quantities, line 1 vs line 2 of
    each order — doubled tie-averaged ranks keep every hashed rank
    statistic integral; the z-score follows q145's identical-closed-
    form double discipline."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_linenumber").isin(1, 2)
    )
    g = li.groupBy(F.col("l_quantity").cast("bigint").alias("v")).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.when(F.col("l_linenumber") == 1, 1).otherwise(0)).alias("ca"),
    )
    # cumulative count of strictly-smaller values: a window over the
    # DISTINCT-VALUE domain (tiny by construction), not the raw rows
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    r = g.withColumn("less", F.coalesce(F.sum("c").over(w), F.lit(0)))
    # DECIMAL(38,0) interior (round 12, the x207 overflow lesson): the
    # rank sum grows as 2n² and the tie term as Σc³ — both overflow
    # BIGINT at per-value counts a 100 TB table reaches routinely. Big
    # statistics are emitted as exact STRINGS; the z-score combines
    # them in doubles (DuckDB VARCHAR-mediates its int128→double cast).
    d19 = lambda col: F.col(col).cast("decimal(19,0)")  # noqa: E731
    cD, caD = d19("c"), d19("ca")
    tot = r.agg(
        F.sum("ca").cast("bigint").alias("n1"),
        F.sum(F.col("c") - F.col("ca")).cast("bigint").alias("n2"),
        F.sum(caD * (2 * F.col("less") + F.col("c") + 1)).alias("r1_x2"),
        F.sum(cD * cD * cD - cD).alias("tie_term"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n1D = n1.cast("decimal(19,0)")
    r1_x2, tie = F.col("r1_x2"), F.col("tie_term")
    u1_x2 = r1_x2 - n1D * (n1D + 1)
    nd = (n1 + n2).cast("double")
    z = (
        u1_x2.cast("double") / 2.0 - n1.cast("double") * n2.cast("double") / 2.0
    ) / F.sqrt(
        (n1.cast("double") * n2.cast("double") / 12.0)
        * ((nd + 1.0) - tie.cast("double") / (nd * (nd - 1.0)))
    )
    return tot.select(
        "n1",
        "n2",
        r1_x2.cast("string").alias("r1_x2"),
        tie.cast("string").alias("tie_term"),
        u1_x2.cast("decimal(38,0)").cast("string").alias("u1_x2"),
        (2 * n1D * n2.cast("decimal(19,0)") - u1_x2)
        .cast("decimal(38,0)")
        .cast("string")
        .alias("u2_x2"),
        F.round(z, 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# x207: Spearman rank correlation — the monotone-association tier
# beside Pearson's linear r (q137) and the rank TESTS (x203 U, x173
# KS): "do bigger orders get deeper discounts?" robust to any
# monotone transform. Ties are everywhere in both columns, so the
# naive 6·Σd² formula is invalid; the correct tie-handling is Pearson
# over tie-AVERAGED ranks, which this computes exactly: ranks carried
# DOUBLED (the x203 discipline) keep every moment an exact integer —
# held in a DECIMAL(38,0) interior because Σr² grows as 4n³, which
# overflows BIGINT past n ≈ 1.3e6 rows (the round-12 tiled slope smoke
# caught the original BIGINT version doing exactly that). The big
# moments are emitted as exact STRINGS; only the final rho combines
# them in doubles under the q145 identical-closed-form rule, with
# DuckDB VARCHAR-mediating its int128→double casts (the common.py
# correctness note). Σrx2 = Σry2 = n(n+1) exactly (averaging preserves
# the rank total) — emitted as a cross-engine tripwire.
#
# Scale shape: ONE row-scan reduces lineitem to per-(x, y) CELL counts
# (≤ 50 quantities × 11 discount cells), checkpointed once; both
# doubled-rank maps derive from the cells, the cumulative rank window
# runs over those tiny distinct-value domains, and every moment is a
# count-WEIGHTED fold over the cell frame — the row domain is never
# touched again (no global sort, no row-domain window, no join back
# onto rows; ADVICE r11 #4).
# ---------------------------------------------------------------------------
@query(
    "x207_spearman_rank_corr",
    oracle="""
    WITH s AS (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS y
        FROM lineitem
    ),
    cells AS (
        SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY x, y
    ),
    gx AS (
        SELECT x, SUM(c) AS vc,
               COALESCE(SUM(SUM(c)) OVER (ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS less
        FROM cells GROUP BY x
    ),
    gy AS (
        SELECT y, SUM(c) AS vc,
               COALESCE(SUM(SUM(c)) OVER (ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS less
        FROM cells GROUP BY y
    ),
    r AS (
        SELECT cells.c,
               (2 * gx.less + gx.vc + 1) AS rx2,
               (2 * gy.less + gy.vc + 1) AS ry2
        FROM cells JOIN gx USING (x) JOIN gy USING (y)
    ),
    m AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               SUM(CAST(c AS HUGEINT) * rx2) AS sx,
               SUM(CAST(c AS HUGEINT) * ry2) AS sy,
               SUM(CAST(c AS HUGEINT) * rx2 * rx2) AS sxx,
               SUM(CAST(c AS HUGEINT) * ry2 * ry2) AS syy,
               SUM(CAST(c AS HUGEINT) * rx2 * ry2) AS sxy
        FROM r
    )
    SELECT n,
           CAST(sxx AS VARCHAR) AS sxx,
           CAST(syy AS VARCHAR) AS syy,
           CAST(sxy AS VARCHAR) AS sxy,
           CAST(CASE WHEN sx = CAST(n AS HUGEINT) * (n + 1)
                      AND sy = CAST(n AS HUGEINT) * (n + 1)
                     THEN 1 ELSE 0 END AS INTEGER) AS rank_total_ok,
           ROUND((CAST(n AS DOUBLE)
                      * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                  - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                      * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
                 / SQRT((CAST(n AS DOUBLE)
                             * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                         - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                             * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
                        * (CAST(n AS DOUBLE)
                               * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                           - CAST(CAST(sy AS VARCHAR) AS DOUBLE)
                               * CAST(CAST(sy AS VARCHAR) AS DOUBLE))), 6)
               AS rho
    FROM m
    """,
)
def x207_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rho between order quantity and discount
    cell over lineitem — Pearson on doubled tie-averaged ranks, every
    hashed moment integral."""
    from pyspark.sql.window import Window

    s = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("y"),
    )
    # The ONLY pass over the row domain; checkpointed so the two rank
    # maps and the moment fold all reuse it instead of re-scanning
    # lineitem (ADVICE r11 #4).
    cells = (
        s.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )

    def rank_map(col: str):
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return (
            cells.groupBy(col)
            .agg(F.sum("c").alias("vc"))
            .withColumn("less", F.coalesce(F.sum("vc").over(w), F.lit(0)))
            .select(col, (2 * F.col("less") + F.col("vc") + 1).alias(f"r{col}2"))
        )

    r = cells.join(F.broadcast(rank_map("x")), "x").join(
        F.broadcast(rank_map("y")), "y"
    )
    # DECIMAL(38,0) interior for the quadratic moments (round 12): the
    # doubled-rank products grow as 4n³, which overflows BIGINT past
    # n ≈ 1.3e6 rows — the tiled slope smoke caught exactly that. Each
    # factor is cast decimal(19,0) first so the PRODUCT is computed in
    # decimal (precision caps at 38: exact to n ≈ 3e12 rows); the big
    # moments are emitted as STRINGS (exact at any magnitude, and
    # DuckDB's int128→double cast is not correctly rounded past 2^53 —
    # both engines VARCHAR-mediate before the rho math instead).
    d19 = lambda col: F.col(col).cast("decimal(19,0)")  # noqa: E731
    cD, rxD, ryD = d19("c"), d19("rx2"), d19("ry2")
    m = r.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(cD * rxD).alias("sx"),
        F.sum(cD * ryD).alias("sy"),
        F.sum(cD * rxD * rxD).alias("sxx"),
        F.sum(cD * ryD * ryD).alias("syy"),
        F.sum(cD * rxD * ryD).alias("sxy"),
    )
    n = F.col("n")
    nDec = n.cast("decimal(19,0)")
    nd, sxd, syd = (
        n.cast("double"),
        F.col("sx").cast("double"),
        F.col("sy").cast("double"),
    )
    rho = (nd * F.col("sxy").cast("double") - sxd * syd) / F.sqrt(
        (nd * F.col("sxx").cast("double") - sxd * sxd)
        * (nd * F.col("syy").cast("double") - syd * syd)
    )
    return m.select(
        "n",
        F.col("sxx").cast("string").alias("sxx"),
        F.col("syy").cast("string").alias("syy"),
        F.col("sxy").cast("string").alias("sxy"),
        F.when(
            (F.col("sx") == nDec * (nDec + 1)) & (F.col("sy") == nDec * (nDec + 1)),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("rank_total_ok"),
        F.round(rho, 6).alias("rho"),
    )


# ---------------------------------------------------------------------------
# x209: Kendall's tau-b (round 12) — the concordance member of the
# rank-statistics tier (x203 U tests location, x207 Spearman measures
# monotone association via ranks; tau-b measures it via PAIR
# concordance, the estimator of choice under heavy ties). The naive
# definition is an O(n²) pair scan; over a bounded value grid it
# collapses to the x207 cell trick: reduce lineitem to per-(x, y) cell
# counts (≤ 50 quantities × 11 discount cells), then count concordant/
# discordant PAIRS as a fold over CELL pairs — Σ c_i·c_j with both
# strict inequalities agreeing / opposing — an O(cells²) ≈ 3·10⁵
# product on broadcast-sized frames, independent of corpus size. Tie
# terms come from the marginals (Σ C(c_x, 2), Σ C(c_y, 2)). The pair
# sums grow as n², past BIGINT near 3e9 rows, so every big statistic
# is held in a DECIMAL(38,0)/HUGEINT interior, carried DOUBLED (the
# x203 discipline — no halving division anywhere), and emitted as an
# exact STRING; tau_b combines them in doubles under the q145
# identical-closed-form rule (sqrt is IEEE correctly-rounded, DuckDB
# VARCHAR-mediates its int128→double casts).
#
# Scale shape: ONE row-scan → cell counts (checkpointed), one
# broadcast self-join over the value grid, three tiny folds. The row
# domain is touched exactly once.
# ---------------------------------------------------------------------------
@query(
    "x209_kendall_tau",
    oracle="""
    WITH s AS (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS y
        FROM lineitem
    ),
    cells AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY x, y),
    pairs AS (
        SELECT COALESCE(SUM(CAST(a.c AS HUGEINT) * b.c) FILTER (
                   WHERE (a.x < b.x AND a.y < b.y)
                      OR (a.x > b.x AND a.y > b.y)), 0) AS nc2,
               COALESCE(SUM(CAST(a.c AS HUGEINT) * b.c) FILTER (
                   WHERE (a.x < b.x AND a.y > b.y)
                      OR (a.x > b.x AND a.y < b.y)), 0) AS nd2
        FROM cells a, cells b
    ),
    margins AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               SUM(CAST(c AS HUGEINT) * (c - 1)) AS txy2,
               (SELECT SUM(CAST(cx AS HUGEINT) * (cx - 1))
                FROM (SELECT SUM(c) AS cx FROM cells GROUP BY x)) AS tx2,
               (SELECT SUM(CAST(cy AS HUGEINT) * (cy - 1))
                FROM (SELECT SUM(c) AS cy FROM cells GROUP BY y)) AS ty2
        FROM cells
    )
    SELECT n,
           CAST(nc2 AS VARCHAR) AS concordant_x2,
           CAST(nd2 AS VARCHAR) AS discordant_x2,
           CAST(tx2 AS VARCHAR) AS ties_x_x2,
           CAST(ty2 AS VARCHAR) AS ties_y_x2,
           CAST(txy2 AS VARCHAR) AS ties_xy_x2,
           ROUND((CAST(CAST(nc2 AS VARCHAR) AS DOUBLE) / 2.0
                  - CAST(CAST(nd2 AS VARCHAR) AS DOUBLE) / 2.0)
                 / SQRT((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0
                         - CAST(CAST(tx2 AS VARCHAR) AS DOUBLE) / 2.0)
                        * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0
                           - CAST(CAST(ty2 AS VARCHAR) AS DOUBLE) / 2.0)), 6)
               AS tau_b
    FROM pairs, margins
    """,
)
def x209_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kendall tau-b between order quantity and discount
    cell over lineitem — pair concordance counted as a fold over the
    bounded value grid's cell pairs, every hashed count integral."""
    s = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("y"),
    )
    cells = (
        s.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("c").alias("ac")
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"), F.col("c").alias("bc")
    )
    # DECIMAL(38,0) interior, doubled counts, string emission — the
    # x207 overflow lesson applied from birth: Σ c_i·c_j grows as n².
    d19 = lambda col: F.col(col).cast("decimal(19,0)")  # noqa: E731
    prod = d19("ac") * d19("bc")
    conc = (F.col("ax") < F.col("bx")) & (F.col("ay") < F.col("by")) | (
        (F.col("ax") > F.col("bx")) & (F.col("ay") > F.col("by"))
    )
    disc = (F.col("ax") < F.col("bx")) & (F.col("ay") > F.col("by")) | (
        (F.col("ax") > F.col("bx")) & (F.col("ay") < F.col("by"))
    )
    zero = F.lit(0).cast("decimal(38,0)")
    # the grid self-join: broadcast-sized by construction (≤ |x|·|y|
    # cells), never the row domain
    pairs = a.crossJoin(F.broadcast(b)).agg(
        F.coalesce(F.sum(F.when(conc, prod)), zero).alias("nc2"),
        F.coalesce(F.sum(F.when(disc, prod)), zero).alias("nd2"),
    )
    mx = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("cx"))
        .agg(
            F.sum(F.col("cx").cast("decimal(19,0)") * (F.col("cx") - 1)).alias(
                "tx2"
            )
        )
    )
    my = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("cy"))
        .agg(
            F.sum(F.col("cy").cast("decimal(19,0)") * (F.col("cy") - 1)).alias(
                "ty2"
            )
        )
    )
    tot = cells.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(d19("c") * (F.col("c") - 1)).alias("txy2"),
    )
    m = (
        pairs.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(my))
    )
    nD = F.col("n").cast("double")
    n0 = nD * (nD - 1.0) / 2.0
    tau = (
        (F.col("nc2").cast("double") / 2.0 - F.col("nd2").cast("double") / 2.0)
        / F.sqrt(
            (n0 - F.col("tx2").cast("double") / 2.0)
            * (n0 - F.col("ty2").cast("double") / 2.0)
        )
    )
    return m.select(
        "n",
        F.col("nc2").cast("string").alias("concordant_x2"),
        F.col("nd2").cast("string").alias("discordant_x2"),
        F.col("tx2").cast("string").alias("ties_x_x2"),
        F.col("ty2").cast("string").alias("ties_y_x2"),
        F.col("txy2").cast("string").alias("ties_xy_x2"),
        F.round(tau, 6).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# x211: chi-squared test of independence (round 12) — the categorical-
# association member of the statistics tier (x182 kappa measures
# agreement, x163 MI measures dependence in bits, the rank tier
# handles ordinal data; chi² is the workhorse "are these two labels
# independent?" readout over a contingency table). Computed over the
# returnflag × linestatus grid of lineitem.
#
# Scale shape: ONE row-scan to contingency cells (≤ |rf|·|ls| rows,
# checkpointed), margins and the grand total fold from the cells and
# broadcast back onto them — the row domain is touched exactly once
# and every join operand is grid-sized.
#
# Determinism: observed counts and margins are exact integers; each
# cell's expected count and contribution are ONE identical closed-form
# double expression in both engines (the q145 rule); per-cell
# contributions are ROUNDed to 6dp and then summed through the exact
# decimal interior (the dsum rule — a plain SUM(double) over cells
# would be summation-order-dependent), so chi2 is bit-equal.
# ---------------------------------------------------------------------------
@query(
    "x211_chi_squared_independence",
    oracle="""
    WITH cells AS (
        SELECT l_returnflag AS rf, l_linestatus AS ls,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM lineitem GROUP BY rf, ls
    ),
    rowm AS (SELECT rf, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY rf),
    colm AS (SELECT ls, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY ls),
    tot AS (
        SELECT CAST(SUM(o) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT rf) AS BIGINT) AS nr,
               CAST(COUNT(DISTINCT ls) AS BIGINT) AS nc
        FROM cells
    ),
    scored AS (
        SELECT o,
               CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS e,
               ROUND((CAST(o AS DOUBLE)
                      - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
                        / CAST(n AS DOUBLE))
                     * (CAST(o AS DOUBLE)
                        - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
                          / CAST(n AS DOUBLE))
                     / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
                        / CAST(n AS DOUBLE)), 6) AS contrib,
               n, nr, nc
        FROM cells JOIN rowm USING (rf) JOIN colm USING (ls) CROSS JOIN tot
    )
    SELECT MAX(n) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((MAX(nr) - 1) * (MAX(nc) - 1) AS BIGINT) AS dof,
           CAST(CAST(SUM(CAST(contrib AS DECIMAL(28,8))) AS VARCHAR)
                AS DOUBLE) AS chi2,
           ROUND(MIN(e), 6) AS min_expected,
           ROUND(MAX(contrib), 6) AS max_contrib
    FROM scored
    """,
)
def x211_chi_squared_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence of returnflag × linestatus over
    lineitem — contingency cells from one scan, grid-sized margins
    broadcast back, contributions decimal-summed."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
    )
    cells = (
        li.groupBy("rf", "ls")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=False)
    )
    rowm = cells.groupBy("rf").agg(F.sum("o").alias("r"))
    colm = cells.groupBy("ls").agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.countDistinct("rf").cast("bigint").alias("nr"),
        F.countDistinct("ls").cast("bigint").alias("nc"),
    )
    j = (
        cells.join(F.broadcast(rowm), "rf")
        .join(F.broadcast(colm), "ls")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("r").cast("double") * F.col("c").cast("double") / F.col(
        "n"
    ).cast("double")
    diff = F.col("o").cast("double") - e
    contrib = F.round(diff * diff / e, 6)
    return j.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        ((F.max("nr") - 1) * (F.max("nc") - 1)).cast("bigint").alias("dof"),
        F.sum(contrib.cast("decimal(28,8)")).cast("double").alias("chi2"),
        F.round(F.min(e), 6).alias("min_expected"),
        F.round(F.max(contrib), 6).alias("max_contrib"),
    )


# ---------------------------------------------------------------------------
# x213: Mann-Kendall trend test + Theil-Sen slope (round 13) — the
# TREND member of the nonparametric tier (x203 U compares two samples,
# x207/x209 correlate two columns, x177 flags point anomalies; MK asks
# "is this series monotonically drifting?" — the ops readout a corpus
# team runs over ingest volume before blaming a pipeline change).
# Series = monthly order counts from `orders`.
#
# Statistics, all exact integers until the one closed-form division:
# S = Σ_{i<j} sgn(v_j − v_i) over the time-ordered series;
# Var(S)·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) over value-tie groups;
# significance at z=1.96 as pure integer arithmetic:
# 180000·(|S|−1)² ≥ 38416·(18·Var) ⟺ ((|S|−1)/√Var)² ≥ 1.96².
# Theil-Sen slope = MEDIAN of pairwise (Δv/Δmonth) — computed by an
# EXPLICIT rank-and-average (row_number over the slope order, average
# the ≤2 middle rows) so both engines evaluate the identical closed
# form on identical operands; engine-native percentile/median
# interpolation formulas differ in the last bits (the x155/x207
# hazard) and are avoided.
#
# Scale shape: ONE corpus-sized shuffle (the month groupBy) collapses
# the row domain to ≤ |months| rows; the pair grid, tie fold, and the
# median window are all month²-bounded (≤ ~84² here) and explicitly
# domain-bounded like x209's cell grid — never row-scaled. The global
# median window orders a month²-row frame, not data.
# ---------------------------------------------------------------------------
@query(
    "x213_mann_kendall_trend",
    oracle="""
    WITH m AS (
        SELECT EXTRACT(YEAR FROM o_orderdate) * 12
                   + EXTRACT(MONTH FROM o_orderdate) AS mi,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM orders GROUP BY 1
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_periods FROM m),
    p AS (
        SELECT CAST(SUM(CASE WHEN b.v > a.v THEN 1
                             WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_statistic
        FROM m a JOIN m b ON b.mi > a.mi
    ),
    ties AS (
        SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
                   AS tie_term
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
              FROM m GROUP BY v HAVING COUNT(*) > 1)
    ),
    slopes AS (
        SELECT (CAST(b.v AS DOUBLE) - CAST(a.v AS DOUBLE))
                   / (b.mi - a.mi) AS slope
        FROM m a JOIN m b ON b.mi > a.mi
    ),
    ranked AS (
        SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
               COUNT(*) OVER () AS ns
        FROM slopes
    ),
    med AS (
        SELECT ROUND(AVG(slope), 6) AS theil_sen_slope
        FROM ranked WHERE rn IN ((ns + 1) // 2, (ns + 2) // 2)
    )
    SELECT nn.n_periods,
           p.s_statistic,
           CAST(nn.n_periods * (nn.n_periods - 1) * (2 * nn.n_periods + 5)
                - ties.tie_term AS BIGINT) AS var_num_x18,
           CAST(CASE WHEN 180000 * (ABS(p.s_statistic) - 1)
                              * (ABS(p.s_statistic) - 1)
                          >= 38416 * (nn.n_periods * (nn.n_periods - 1)
                                      * (2 * nn.n_periods + 5)
                                      - ties.tie_term)
                     THEN 1 ELSE 0 END AS INTEGER) AS trend_significant,
           med.theil_sen_slope
    FROM nn, p, ties, med
    """,
)
def x213_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall S + tie-corrected variance + integer significance
    bit + Theil-Sen median slope over monthly order counts — one corpus
    shuffle to <=|months| rows, everything after is month²-bounded."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mi")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
        .localCheckpoint(eager=False)
    )
    nn = m.agg(F.count(F.lit(1)).cast("bigint").alias("n_periods"))
    sgn = (
        F.when(F.col("b.v") > F.col("a.v"), 1)
        .when(F.col("b.v") < F.col("a.v"), -1)
        .otherwise(0)
    )
    pairs = m.alias("a").join(
        F.broadcast(m.alias("b")), F.col("b.mi") > F.col("a.mi")
    )
    s = pairs.agg(F.sum(sgn).cast("bigint").alias("s_statistic"))
    t = F.col("t")
    ties = (
        m.groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(t > 1)
        .agg(
            F.coalesce(F.sum(t * (t - 1) * (2 * t + 5)), F.lit(0))
            .cast("bigint")
            .alias("tie_term")
        )
    )
    slopes = pairs.select(
        (
            (F.col("b.v").cast("double") - F.col("a.v").cast("double"))
            / (F.col("b.mi") - F.col("a.mi"))
        ).alias("slope")
    )
    # explicit rank-and-average median: the window orders the
    # month²-bounded slope frame, never row-scaled data
    w = Window.orderBy("slope")
    ranked = slopes.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("ns"),
    )
    med = ranked.filter(
        (F.col("rn") == F.floor((F.col("ns") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("ns") + 2) / 2))
    ).agg(F.round(F.avg("slope"), 6).alias("theil_sen_slope"))
    var_num = (
        F.col("n_periods")
        * (F.col("n_periods") - 1)
        * (2 * F.col("n_periods") + 5)
        - F.col("tie_term")
    ).cast("bigint")
    abs_s1 = F.abs(F.col("s_statistic")) - 1
    return (
        nn.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(med))
        .select(
            "n_periods",
            "s_statistic",
            var_num.alias("var_num_x18"),
            F.when(180000 * abs_s1 * abs_s1 >= 38416 * var_num, 1)
            .otherwise(0)
            .cast("int")
            .alias("trend_significant"),
            "theil_sen_slope",
        )
    )


# ---------------------------------------------------------------------------
# A6 extension: exact WEIGHTED median per group — the selection statistic
# plain percentiles (q18) cannot express when observations carry
# multiplicity (row = an order line, weight = its quantity). Lower
# weighted median: the smallest value v with 2·cumweight(≤v) ≥ total.
# The reference aggregates nothing (ua2sql.py:223-236 lands raw rows);
# this is SURVEY §2.11 north-star surface.
#
# Scale shape: pre-aggregate to DISTINCT (group, value) cells first —
# the cumulative pass then covers |distinct values| rows per group,
# never the corpus — and compute the cumulative sum as a TWO-LEVEL
# prefix sum: a plain by-group window would sort every cell of a group
# in a single task (3 tasks here; millions of cells per task at
# 100 TB). Instead each group is sliced into contiguous equi-width
# value ranges (bucket id monotone in v, so bucket order == value
# order), the cumulative sum runs inside each (group, bucket) in
# parallel, and a window over the tiny bucket-total set produces the
# per-bucket offsets that are broadcast back. Weights sum in BIGINT
# (quantities are integral) and lcw + offset is exact integer
# arithmetic, so the 2·cw ≥ tw boundary stays bit-identical to the
# single-window form in both engines — only the bucket *assignment*
# uses doubles, and monotone FP ops keep ranges contiguous, which is
# all the decomposition needs.
# ---------------------------------------------------------------------------
@query(
    "x219_weighted_median",
    oracle="""
    WITH cells AS (
        SELECT l_returnflag AS flag, l_extendedprice AS v,
               SUM(CAST(l_quantity AS BIGINT)) AS w
        FROM lineitem GROUP BY 1, 2
    ),
    c AS (
        SELECT flag, v, w,
               SUM(w) OVER (PARTITION BY flag ORDER BY v) AS cw,
               SUM(w) OVER (PARTITION BY flag) AS tw
        FROM cells
    )
    SELECT flag AS l_returnflag,
           MIN(v) AS w_median,
           CAST(MAX(tw) AS BIGINT) AS total_qty,
           CAST(COUNT(*) AS BIGINT) AS n_cells_at_or_above
    FROM c WHERE 2 * cw >= tw
    GROUP BY flag
    ORDER BY l_returnflag
    """,
)
def x219_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("l_extendedprice").alias("v"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    )
    n_buckets = 4 * spark.sparkContext.defaultParallelism
    rng = cells.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    width = (
        F.col("vmax").cast("double") - F.col("vmin").cast("double")
    ) / F.lit(float(n_buckets))
    bucketed = (
        cells.crossJoin(F.broadcast(rng))
        .withColumn(
            "b",
            F.least(
                F.lit(n_buckets - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("v").cast("double") - F.col("vmin").cast("double"))
                        / F.greatest(width, F.lit(1e-9))
                    ),
                ),
            ).cast("int"),
        )
        .drop("vmin", "vmax")
    )
    loc = bucketed.select(
        "flag",
        "v",
        "b",
        F.sum("w").over(Window.partitionBy("flag", "b").orderBy("v")).alias("lcw"),
    )
    wf = Window.partitionBy("flag")
    offs = bucketed.groupBy("flag", "b").agg(F.sum("w").alias("bw")).select(
        "flag",
        "b",
        (F.sum("bw").over(wf.orderBy("b")) - F.col("bw")).alias("off"),
        F.sum("bw").over(wf).alias("tw"),
    )
    cum = loc.join(F.broadcast(offs), ["flag", "b"]).select(
        "flag",
        "v",
        (F.col("lcw") + F.col("off")).alias("cw"),
        "tw",
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy(F.col("flag").alias("l_returnflag"))
        .agg(
            F.min("v").alias("w_median"),
            F.max("tw").alias("total_qty"),
            F.count(F.lit(1)).cast("bigint").alias("n_cells_at_or_above"),
        )
        .orderBy("l_returnflag")
    )
