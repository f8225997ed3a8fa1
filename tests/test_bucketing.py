"""Bucketed-table plan contracts: the pay-the-shuffle-once join.

These pin the three scan-time properties operators/bucketing.py claims:
join without Exchange, groupBy without Exchange, and bucket pruning —
each read straight from the physical plan, so a regression (a conf
default flip, a writer change that loses bucket metadata) fails here
instead of as a silent full shuffle on a cluster.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

import pytest

from ua2sql_spark.catalog import load_table
from ua2sql_spark.operators.bucketing import bucketed_join, write_bucketed
from ua2sql_spark.plans.explain import (
    formatted_plan,
    shuffle_count,
    simple_plan,
    sortmerge_join_count,
)
from tests.conftest import SF_DIR


@contextmanager
def _conf(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    try:
        for k, v in kv.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture(scope="module")
def bucketed_orders_customer(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "bkt_orders", "custkey", 8, path=str(base / "orders"),
    )
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "custkey"),
        "bkt_customer", "custkey", 8, path=str(base / "customer"),
    )
    yield "bkt_orders", "bkt_customer"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed_orders_customer):
    lt, rt = bucketed_orders_customer
    # broadcast off: at test scale Spark would broadcast the small side,
    # which also avoids the shuffle but proves nothing about bucketing —
    # the 100 TB shape is two fact tables, neither broadcastable.
    with _conf(spark, **{"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        joined = bucketed_join(spark, lt, rt, on="custkey")
        plan = simple_plan(joined)
        assert sortmerge_join_count(joined) == 1, plan
        assert shuffle_count(joined) == 0, plan
        # and the co-located join must agree with the shuffled one
        shuffled = (
            load_table(spark, SF_DIR, "orders")
            .withColumnRenamed("o_custkey", "custkey")
            .select("o_orderkey", "custkey", "o_totalprice")
            .join(
                load_table(spark, SF_DIR, "customer")
                .withColumnRenamed("c_custkey", "custkey")
                .select("custkey", "c_name", "c_acctbal"),
                on="custkey",
            )
        )
        assert joined.count() == shuffled.count()


def test_bucketed_groupby_has_no_exchange(spark, bucketed_orders_customer):
    lt, _ = bucketed_orders_customer
    import pyspark.sql.functions as F

    with _conf(spark, **{"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        agg = spark.table(lt).groupBy("custkey").agg(F.sum("o_totalprice"))
        assert shuffle_count(agg) == 0, simple_plan(agg)


def test_bucket_pruning_point_lookup(spark, bucketed_orders_customer):
    lt, _ = bucketed_orders_customer
    any_key = spark.table(lt).limit(1).collect()[0]["custkey"]
    # autoBucketedScan drops the bucketed read when no downstream join/
    # agg wants the partitioning — which also drops bucket PRUNING, the
    # property under test; force the bucketed scan for the point lookup.
    with _conf(
        spark,
        **{"spark.sql.sources.bucketing.autoBucketedScan.enabled": "false"},
    ):
        df = spark.table(lt).filter(f"custkey = {any_key}")
        plan = formatted_plan(df)
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, plan
        assert int(m.group(1)) == 1 and int(m.group(2)) == 8
        assert df.count() > 0


def test_one_file_per_bucket(spark, bucketed_orders_customer):
    """write_bucketed's repartition-on-key contract: each bucket is one
    file (no per-writing-task fanout), so sortBy order is trusted at
    read time and file counts stay O(n_buckets), not O(tasks×buckets)."""
    lt, _ = bucketed_orders_customer
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {lt}")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    import os

    files = [f for f in os.listdir(loc.removeprefix("file:")) if f.startswith("part-")]
    assert len(files) == 8, files
