"""Interleaved A/B: AQE coalesce minPartitionSize 1m (default) vs 64k.

Hypothesis: small-bytes shuffles feeding compute-heavy stages (set
intersections, array folds) are coalesced to ~bytes/1MB partitions —
under the core count — so the heavy stage under-parallelizes. A lower
floor lets parallelismFirst keep ~defaultParallelism tasks.

Usage: python scripts_r14_ab_minpart.py [-n ROUNDS] name [name ...]
Per round, each query runs once under A (default) then once under B
(64k), alternating, so host drift hits both arms equally.
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

from ua2sql_spark.session import get_spark  # noqa: E402
from ua2sql_spark.registry import all_queries  # noqa: E402
from ua2sql_spark.catalog import load_tables  # noqa: E402

KEY = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
spark = get_spark("r14-ab-minpart")
spark.sparkContext.setLogLevel("ERROR")
specs = all_queries()
for df in load_tables(spark, SF_DIR).values():
    df.limit(1).count()

results: dict[str, dict[str, list[float]]] = {
    n: {"A": [], "B": []} for n in args
}


def run_one(name: str, arm: str) -> float:
    spark.conf.set(KEY, "1m" if arm == "A" else "64k")
    fn = specs[name].fn
    spark.sparkContext.setJobDescription(f"{name}[{arm}]")
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    return round(dt, 4)


# warm both arms once (plan + codegen caches)
for name in args:
    run_one(name, "A")
    run_one(name, "B")

for r in range(n_rounds):
    for name in args:
        for arm in ("A", "B") if r % 2 == 0 else ("B", "A"):
            results[name][arm].append(run_one(name, arm))

print()
for name in args:
    a, b = results[name]["A"], results[name]["B"]
    ma, mb = statistics.median(a), statistics.median(b)
    print(f"{name}: A(1m)={ma:.3f} B(64k)={mb:.3f} delta={ma-mb:+.3f} "
          f"ratio={mb/ma:.3f}\n  A={a}\n  B={b}", flush=True)
spark.conf.set(KEY, "1m")
spark.stop()
