"""Interleaved A/B of the working-tree uncommitted optimizations.

Variant A = old implementation (selected via UA2SQL_AB_OLD=1, read at
DataFrame-build time inside the patched functions), variant B = new.
A and B alternate inside ONE Spark session so host drift hits both;
bracketing cpu canaries record the box state.

Usage: python scripts_r14_ab.py [-n ROUNDS] name [name ...]
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
from ua2sql_spark.registry import all_queries  # noqa: E402
from ua2sql_spark.catalog import load_tables  # noqa: E402

spark = get_spark("r14-ab")
spark.sparkContext.setLogLevel("ERROR")
specs = all_queries()


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


for df in load_tables(spark, SF_DIR).values():
    df.limit(1).count()

print("canary_start", canary(), flush=True)
for name in args:
    fn = specs[name].fn

    def run_variant(old: bool) -> float:
        if old:
            os.environ["UA2SQL_AB_OLD"] = "1"
        else:
            os.environ.pop("UA2SQL_AB_OLD", None)
        spark.sparkContext.setJobDescription(f"{name}[{'A' if old else 'B'}]")
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return round(dt, 4)

    run_variant(True)  # warm-up both paths
    run_variant(False)
    a_runs, b_runs = [], []
    for _ in range(n_rounds):
        a_runs.append(run_variant(True))
        b_runs.append(run_variant(False))
    print(
        f"{name}: A(old) median={statistics.median(a_runs)} runs={a_runs}",
        flush=True,
    )
    print(
        f"{name}: B(new) median={statistics.median(b_runs)} runs={b_runs}",
        flush=True,
    )
print("canary_end", canary(), flush=True)
spark.stop()
