"""Isolated per-query timing: warm-up + N noop-sink runs + canary probes.

Usage: python scripts_r14_measure.py [-n RUNS] name [name ...]
Prints per-query run arrays, medians, and a bracketing cpu canary so
numbers can be compared across harness invocations on a drifting box.
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

args = sys.argv[1:]
n_runs = 5
if args and args[0] == "-n":
    n_runs = int(args[1])
    args = args[2:]

from pyspark.sql import functions as F  # noqa: E402

from ua2sql_spark.session import get_spark  # noqa: E402
from ua2sql_spark.registry import all_queries  # noqa: E402
from ua2sql_spark.catalog import load_tables  # noqa: E402

spark = get_spark("r14-measure")
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

    def execute():
        spark.sparkContext.setJobDescription(name)
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(None)

    execute()  # warm-up
    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        execute()
        runs.append(round(time.perf_counter() - t0, 4))
    print(f"{name}: median={statistics.median(runs)} runs={runs}", flush=True)
print("canary_end", canary(), flush=True)
spark.stop()
