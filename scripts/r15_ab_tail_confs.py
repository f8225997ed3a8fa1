"""VERDICT r14 #7: one bounded experiment on the gated long tail's
per-job scheduling floor. ~35 gated rows sit at 0.3-0.9 s dominated by
fixed job/stage latency, not compute. bench.py times rows sequentially
by contract (NOT touched); this measures whether runtime confs can
shave the floor ITSELF, interleaved per conf-set on 5 representative
tail rows.

Conf sets tried (all runtime-mutable, restored between sets;
spark.locality.wait was considered and dropped — it is a core conf,
not runtime-mutable, and a no-op in local mode where every task is
PROCESS_LOCAL on the one executor):
  base     — session defaults (the shipped configuration)
  noaqe    — spark.sql.adaptive.enabled=false (attribution only: how
             much of the floor is AQE's stage-by-stage replanning;
             NOT a shippable config — AQE is the scale story)
  bigbatch — arrow maxRecordsPerBatch 10k->64k (only plausibly moves
             the two Arrow-seam rows)

Usage: python scripts/r15_ab_tail_confs.py [rounds]
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5

from ua2sql_spark.session import get_spark  # noqa: E402
from ua2sql_spark.registry import all_queries  # noqa: E402

ROWS = [
    "q150_pipe_syntax",          # SQL-surface floor row
    "x160_url_canonicalize",     # expression-heavy scan row
    "x165_event_cooccurrence",   # one-exchange agg row
    "x143_unicode_normalize",    # Arrow seam row
    "q144_gap_fill_locf",        # window row
]

CONF_SETS = {
    "base": {},
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "bigbatch": {"spark.sql.execution.arrow.maxRecordsPerBatch": "65536"},
}

spark = get_spark("r15-ab-tail")
spark.sparkContext.setLogLevel("ERROR")
specs = all_queries()


def run(name):
    specs[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()


for name in ROWS:  # warm plans once under base
    run(name)

results: dict = {k: {n: [] for n in ROWS} for k in CONF_SETS}
saved = {}
for r in range(rounds):
    for cset, confs in CONF_SETS.items():
        for k, v in confs.items():
            saved[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        try:
            for name in ROWS:
                t0 = time.perf_counter()
                run(name)
                results[cset][name].append(time.perf_counter() - t0)
        finally:
            for k in confs:
                if saved.get(k) is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, saved[k])
    print(f"round {r} done", flush=True)

print(f"{'row':28s} " + " ".join(f"{k:>9s}" for k in CONF_SETS))
for name in ROWS:
    meds = [statistics.median(results[k][name]) for k in CONF_SETS]
    print(f"{name:28s} " + " ".join(f"{m:9.3f}" for m in meds))
tot = [sum(statistics.median(results[k][n]) for n in ROWS) for k in CONF_SETS]
print(f"{'TOTAL':28s} " + " ".join(f"{t:9.3f}" for t in tot))
spark.stop()
