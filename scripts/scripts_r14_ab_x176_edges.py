"""Focused interleaved A/B: x176's EDGES derivation only (old self-join
vs new collect_set + slice expansion), isolated from the triangle
counting that dominates the full query. 9 rounds, bracketing canaries.
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
from ua2sql_spark.catalog import load_table  # noqa: E402

spark = get_spark("r14-ab-x176-edges")
spark.sparkContext.setLogLevel("ERROR")


def canary() -> float:
    def cpu():
        (
            spark.range(0, 32_000_000, 1, 32)
            .select(
                (
                    (F.col("id") * F.lit(2654435761) + F.lit(1140071481932319848))
                    % F.lit(1000003)
                ).alias("h")
            )
            .agg(F.sum("h").alias("s"), F.max("h").alias("m"))
            .write.format("noop").mode("overwrite").save()
        )

    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        cpu()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 4)


def edges_old():
    li = load_table(spark, SF_DIR, "lineitem", rebalance=True)
    lp = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    return (
        lp.alias("a")
        .join(
            lp.alias("b"),
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
    )


def edges_new():
    li = load_table(spark, SF_DIR, "lineitem", rebalance=True)
    parts = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("__p")
    )
    p = F.col("__p")
    return (
        parts.select(F.posexplode(p).alias("__i", "u"), p)
        .select(
            "u",
            F.explode(F.slice(p, F.col("__i") + F.lit(2), F.size(p))).alias(
                "v"
            ),
        )
        .distinct()
    )


def run(fn, label) -> float:
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    return round(dt, 4)


load_table(spark, SF_DIR, "lineitem").limit(1).count()
print("counts old/new:", edges_old().count(), edges_new().count(), flush=True)
print("canary_start", canary(), flush=True)
run(edges_old, "warmup-A")
run(edges_new, "warmup-B")
a_runs, b_runs = [], []
for _ in range(9):
    a_runs.append(run(edges_old, "x176-edges[A]"))
    b_runs.append(run(edges_new, "x176-edges[B]"))
print("A(old) median", statistics.median(a_runs), a_runs, flush=True)
print("B(new) median", statistics.median(b_runs), b_runs, flush=True)
print("canary_end", canary(), flush=True)
spark.stop()
