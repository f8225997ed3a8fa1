"""Scalar-function surface: SURVEY.md §2.8 (F9–F11).

F9 mirrors the reference's JSONB payload islands
(``custom.custom_params`` / ``transaction.receipt``, ua2sql.py:68,85):
semi-structured JSON carried as a string column and queried in-plan via
``get_json_object`` — no Python, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ua2sql_spark.catalog import load_table
from ua2sql_spark.queries.common import davg, dsum, sql_davg, sql_dsum
from ua2sql_spark.registry import query


# ---------------------------------------------------------------------------
# F9: JSON payload querying — extract props.$.k (the JSONB-island
# pattern, ua2sql.py:68,85), cast, aggregate.
# ---------------------------------------------------------------------------
@query(
    "q28_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS max_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q28_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# F9b: schema-on-read JSON — from_json into a typed struct, then dot
# access. Same island, typed path.
# ---------------------------------------------------------------------------
@query(
    "q29_json_typed",
    oracle="""
    SELECT event_id, CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_value
    FROM events
    WHERE CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) >= 90
    """,
)
def q29_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return (
        e.select("event_id", parsed.getField("k").alias("k_value"))
        .filter(F.col("k_value") >= 90)
    )


# ---------------------------------------------------------------------------
# F10a: string functions — lower/upper/substring/replace/length/regexp.
# ---------------------------------------------------------------------------
@query(
    "q30_string_funcs",
    oracle="""
    SELECT c_custkey,
           LOWER(c_name) AS name_lower,
           UPPER(c_mktsegment) AS seg_upper,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           REPLACE(c_name, '#', '-') AS name_dashed,
           CONCAT(c_mktsegment, ':', CAST(c_custkey AS VARCHAR)) AS seg_key
    FROM customer
    WHERE c_name LIKE 'Customer%'
    """,
)
def q30_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").like("Customer%")).select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
    )


# ---------------------------------------------------------------------------
# F10b: regexp extract/contains — parse the trailing id out of names
# (the reference's split-derived column naming, ua2sql.py:227, F7).
# ---------------------------------------------------------------------------
@query(
    "q31_regexp",
    oracle="""
    SELECT p_partkey, p_type,
           REGEXP_EXTRACT(p_name, '^([a-z]+)', 1) AS name_word,
           REGEXP_EXTRACT(p_brand, '([0-9]+)$', 1) AS brand_id,
           CAST(REGEXP_MATCHES(p_type, '^(PROMO|ECONOMY)') AS INTEGER) AS is_cheap_line,
           SPLIT_PART(p_brand, '#', 2) AS brand_num
    FROM part
    """,
)
def q31_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_type",
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("name_word"),
        F.regexp_extract("p_brand", r"([0-9]+)$", 1).alias("brand_id"),
        F.when(F.col("p_type").rlike(r"^(PROMO|ECONOMY)"), 1).otherwise(0).alias("is_cheap_line"),
        F.split_part(F.col("p_brand"), F.lit("#"), F.lit(2)).alias("brand_num"),
    )


# ---------------------------------------------------------------------------
# F3/F4/F5/F10c: date/time functions — truncation, extraction, arithmetic.
# Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday → +1 aligns.
# ---------------------------------------------------------------------------
@query(
    "q32_date_funcs",
    oracle=f"""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS order_quarter,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS month_revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q32_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("month_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# F10d: math functions — round/abs/power/log/sqrt/mod. Same IEEE inputs,
# same libm-style definitions in both engines; outputs rounded where an
# engine could differ in the last ulp (ln/pow).
# ---------------------------------------------------------------------------
@query(
    "q33_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
           ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 4) AS price_ln,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate
    FROM lineitem
    WHERE l_linenumber = 1 AND l_extendedprice > 0
    """,
)
def q33_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_linenumber") == 1) & (F.col("l_extendedprice") > 0)).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


# ---------------------------------------------------------------------------
# F11: higher-order array functions on embeddings — transform/filter/
# aggregate without any UDF (the 100 TB path for vector math).
# ---------------------------------------------------------------------------
@query(
    "q34_array_funcs",
    oracle="""
    SELECT vec_id, label,
           LEN(embedding) AS dim,
           ROUND(LIST_AGGREGATE(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS sq_norm,
           LEN(LIST_FILTER(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def q34_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.filter(F.col("vec_id") < 100).select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.round(sq, 4).alias("sq_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("long").alias("n_positive"),
    )


# ---------------------------------------------------------------------------
# F9c: VariantType — Spark 4's binary semi-structured encoding. Unlike
# the stringly get_json_object path (q28, one parse per extraction),
# parse_json decodes the island ONCE into Variant and every
# variant_get is a cheap binary probe — the 100 TB answer for payloads
# probed by many expressions. The oracle reads the same values through
# DuckDB's JSON extraction; results must agree exactly.
# ---------------------------------------------------------------------------
@query(
    "q120_variant_json",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(COUNT(CASE WHEN CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) > 50
                           THEN 1 END) AS BIGINT) AS n_high
    FROM events
    GROUP BY event_type
    """,
)
def q120_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    return e.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.sum("k").alias("sum_k"),
        F.count(F.when(F.col("k") > 50, F.lit(1))).alias("n_high"),
    )
