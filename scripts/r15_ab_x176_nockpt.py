"""Interleaved A/B: x176 triangle_stats WITHOUT localCheckpoints (r15,
VERDICT r14 #3's second angle). The checkpoints exist to materialize
multi-consumer subplans once, but they also force .rdd plan-forcing
barriers (each one runs its AQE subplan as separate jobs) and pin the
captured partitioning. A single lazy plan instead exposes the whole DAG
to one AQE run, whose ReuseExchange/stage-reuse may dedup the shared
subtrees for free.

A = production x176 (checkpointed triangle_stats).
B = same edge derivation + checkpoint-free triangle_stats copy
    (graph.py @ aa0b74a minus the four localCheckpoint calls).

Usage: python scripts/r15_ab_x176_nockpt.py [rounds]
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
from ua2sql_spark.queries.tpch_style import _x176_edges  # noqa: E402

spark = get_spark("r15-ab-x176-nockpt")
spark.sparkContext.setLogLevel("ERROR")
specs = all_queries()


def triangle_stats_nockpt(edges):
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("du")))
    dv = F.broadcast(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")))
    fwd = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    de = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    nbr = de.groupBy(F.col("src").alias("node")).agg(
        F.array_sort(F.collect_list("dst")).alias("ns")
    )
    tri = (
        de.join(nbr.select(F.col("node").alias("src"), F.col("ns").alias("nsu")), "src")
        .join(
            nbr.select(F.col("node").alias("dst"), F.col("ns").alias("nsv")),
            "dst",
            "left",
        )
        .select(
            F.size(F.array_intersect("nsu", F.coalesce("nsv", F.array()))).alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("n_triangles"))
    )
    tot = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges"),
    )
    ne = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        tot.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles")
    )


def variant_a():
    return specs["x176_copurchase_triangles"].fn(spark, SF_DIR)


def variant_b():
    edges = _x176_edges(spark, SF_DIR)
    return triangle_stats_nockpt(edges).select(
        "n_nodes", "n_edges", "n_wedges", "n_triangles",
        F.round(
            F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
        ).alias("transitivity"),
    )


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
print(f"A(ckpt) median {statistics.median(ta):.4f}  B(no-ckpt) median {statistics.median(tb):.4f}")
spark.stop()
