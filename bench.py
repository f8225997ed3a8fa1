"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-count via a
cheap aggregate action) after a warm-up pass of the catalog so JVM/IO
startup doesn't pollute per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship plus one representative per operator family
# (join, star-broadcast, agg, window, top-k, sessionization, json, dedup,
# similarity) — the queries whose plans matter most at 100 TB.
HEADLINE = [
    "q01_pricing_summary",
    "q04_join_inner",
    "q05_join_star_broadcast",
    "q13_groupby_having",
    "q22_window_rank",
    "q25_topk_per_group",
    "q28_json_extract",
    "q37_sessionize",
    "q39_retention",
    "q40_tumbling_window",
    "x41_exact_dedup",
    "x43_minhash_lsh_neardup",
    "x45_cosine_topk",
    "x49_quality_score",
]


def main() -> None:
    from ua2sql_spark.session import get_spark
    from ua2sql_spark.registry import all_queries

    spark = get_spark("ua2sql_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    names = [n for n in HEADLINE if n in specs] + [
        n for n in os.environ.get("BENCH_EXTRA", "").split(",") if n and n in specs
    ]

    # Warm-up: touch every table (file listing/footers), then run the
    # flagship end-to-end once untimed — JVM/codegen warmup costs ~12 s
    # on the first executed query and would otherwise be billed to it.
    from ua2sql_spark.catalog import load_tables

    for df in load_tables(spark, SF_DIR).values():
        df.limit(1).count()
    specs[names[0]].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = specs[name].fn(spark, SF_DIR)
        # Force full execution of the plan without driver-side collect cost.
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
