"""Phase breakdown of x176_copurchase_triangles at sf0.1 (noop sink).

Phases: edge derivation (collect_set + slice explode + distinct),
degree table, directed orientation, neighbor arrays, full query.
Usage: python scripts_r14_x176_phase.py [n_runs]
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from ua2sql_spark.session import get_spark  # noqa: E402
from ua2sql_spark.catalog import load_table, load_tables  # noqa: E402
from ua2sql_spark.operators.graph import triangle_stats  # noqa: E402
from ua2sql_spark.registry import all_queries  # noqa: E402

n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
spark = get_spark("r14-x176-phase")
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


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def de_nbr_frames():
    edges = edges_df().localCheckpoint(eager=False)
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
    de = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .localCheckpoint(eager=False)
    )
    nbr = de.groupBy(F.col("src").alias("node")).agg(
        F.array_sort(F.collect_list("dst")).alias("ns")
    )
    return de, nbr


phases = {}


def tphase(name, fn):
    runs = []
    fn()  # warm
    for _ in range(n_runs):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 4))
    phases[name] = runs
    print(f"{name}: median={statistics.median(runs)} runs={runs}", flush=True)


fn176 = all_queries()["x176_copurchase_triangles"].fn
tphase("A_edges_distinct", lambda: noop(edges_df()))
tphase("B_de_directed", lambda: noop(de_nbr_frames()[0]))
tphase("C_nbr_arrays", lambda: noop(de_nbr_frames()[1]))
tphase("D_full_x176", lambda: noop(fn176(spark, SF_DIR)))
spark.stop()
