"""Interleaved A/B: triangle_stats as committed vs de spread to
defaultParallelism by src before the neighbor grouping + intersect.

Usage: python scripts_r14_ab_x176_spread.py [-n ROUNDS]
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

args = sys.argv[1:]
n_rounds = 5
if args and args[0] == "-n":
    n_rounds = int(args[1])
    args = args[2:]

from pyspark.sql import functions as F  # noqa: E402

from ua2sql_spark.session import get_spark  # noqa: E402
from ua2sql_spark.catalog import load_table, load_tables  # noqa: E402
from ua2sql_spark.operators.graph import triangle_stats  # noqa: E402

spark = get_spark("r14-ab-x176")
spark.sparkContext.setLogLevel("ERROR")
for df in load_tables(spark, SF_DIR).values():
    df.limit(1).count()


def edges_df():
    li = load_table(spark, SF_DIR, "lineitem", rebalance=True)
    parts = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("__p")
    )
    p = F.col("__p")
    return (
        parts.select(F.posexplode(p).alias("__i", "u"), p)
        .select(
            "u",
            F.explode(F.slice(p, F.col("__i") + F.lit(2), F.size(p))).alias("v"),
        )
        .distinct()
    )


def triangle_stats_spread(edges):
    sc = spark.sparkContext
    par = sc.defaultParallelism
    edges = edges.localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=False)
    )
    du = F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("du")))
    dv = F.broadcast(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")))
    fwd = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    de = edges.join(du, "u").join(dv, "v").select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    if edges.rdd.getNumPartitions() < par:
        de = de.repartition(par, "src")
    de = de.localCheckpoint(eager=False)
    nbr = (
        de.groupBy(F.col("src").alias("node"))
        .agg(F.array_sort(F.collect_list("dst")).alias("ns"))
        .localCheckpoint(eager=False)
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


def full(variant):
    stats = variant(edges_df())
    out = stats.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
        ).alias("transitivity"),
    )
    out.write.format("noop").mode("overwrite").save()


variants = {"A": triangle_stats, "B": triangle_stats_spread}
res = {"A": [], "B": []}
full(variants["A"])
full(variants["B"])
for r in range(n_rounds):
    for arm in ("A", "B") if r % 2 == 0 else ("B", "A"):
        t0 = time.perf_counter()
        full(variants[arm])
        res[arm].append(round(time.perf_counter() - t0, 4))
        print(arm, res[arm][-1], flush=True)

print()
for arm in ("A", "B"):
    print(f"{arm}: median={statistics.median(res[arm]):.3f} runs={res[arm]}")
# result identity check
ra = sorted(map(tuple, triangle_stats(edges_df()).collect()))
rb = sorted(map(tuple, triangle_stats_spread(edges_df()).collect()))
print("identical:", ra == rb, ra[:1])
spark.stop()
