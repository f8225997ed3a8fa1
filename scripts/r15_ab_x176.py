"""Interleaved A/B: x176 pinned-count edge distinct (r15).

A = the r14 edge derivation (collect_set + slice expansion + plain
``.distinct()``, whose AQE-coalesced output the triangle_stats
checkpoints capture at ~10/32 partitions) — copied verbatim from
commit c326dbf (queries/tpch_style.py); triangle_stats itself is
imported from the CURRENT production module, so this A/B isolates the
edge-partitioning change only.
B = the production registry entry (repartition(pin, u, v) replacing
the distinct's exchange).

Usage: python scripts/r15_ab_x176.py [rounds]
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7

from pyspark.sql import functions as F  # noqa: E402

from ua2sql_spark.session import get_spark  # noqa: E402
from ua2sql_spark.registry import all_queries  # noqa: E402
from ua2sql_spark.catalog import load_table  # noqa: E402
from ua2sql_spark.operators.graph import triangle_stats  # noqa: E402

spark = get_spark("r15-ab-x176")
spark.sparkContext.setLogLevel("ERROR")
specs = all_queries()


def variant_a():
    li = load_table(spark, SF_DIR, "lineitem", rebalance=True)
    parts = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("__p")
    )
    p = F.col("__p")
    edges = (
        parts.select(F.posexplode(p).alias("__i", "u"), p)
        .select(
            "u",
            F.explode(F.slice(p, F.col("__i") + F.lit(2), F.size(p))).alias("v"),
        )
        .distinct()
    )
    return triangle_stats(edges).select(
        "n_nodes", "n_edges", "n_wedges", "n_triangles",
        F.round(
            F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
        ).alias("transitivity"),
    )


def variant_b():
    return specs["x176_copurchase_triangles"].fn(spark, SF_DIR)


def run(df):
    df.write.format("noop").mode("overwrite").save()


assert sorted(map(tuple, variant_a().collect())) == sorted(
    map(tuple, variant_b().collect())
), "A/B results differ!"
print("results identical", flush=True)

run(variant_a())
run(variant_b())
ta, tb = [], []
for i in range(rounds):
    t0 = time.perf_counter(); run(variant_a()); ta.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run(variant_b()); tb.append(time.perf_counter() - t0)
    print(f"round {i}: A {ta[-1]:.3f}  B {tb[-1]:.3f}", flush=True)
print(f"A(old) median {statistics.median(ta):.4f}  B(pin) median {statistics.median(tb):.4f}")
spark.stop()
