"""AQE skew-join split engagement proof (SURVEY §4 scale properties).

x122_skew_join_zipf is the deliberately Zipfian join archetype (~70% of
events on one customer key, sort-merge pinned). This test proves the
runtime skew machinery actually ENGAGES — the executed plan carries
``SortMergeJoin(skew=true)`` — rather than merely being enabled in
session confs.

Two environmental facts this test controls for, both discovered by
bytecode-level debugging of ``OptimizeSkewedJoin``:

* **Split granularity is per-mapper.** A skewed reduce partition can
  only be subdivided at map-output boundaries; the sf test files are
  single-row-group parquet, so the whole table arrives from ONE mapper
  and ``createSkewPartitionSpecs`` returns None (detection fires,
  split impossible). At 100 TB a scan has thousands of row groups, so
  the test materializes a small-row-group copy of events to reproduce
  that real layout.
* **The split must not cost an extra shuffle.** x122's downstream
  aggregate groups on non-join keys, so it needs its own exchange no
  matter what the join outputs — the split is free and engages without
  ``forceOptimizeSkewedJoin``. (A distinct-agg on the join key would
  make the join's partitioning reusable and AQE would decline.)

Thresholds are lowered to make sf0.01-sized partitions cross the same
ratios a 100 TB hot key crosses against the 256 MB default.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from ua2sql_spark.catalog import load_table
from ua2sql_spark.registry import all_queries

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "spark-warehouse", "skew_scratch")

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",   # force the SMJ path
    "spark.sql.files.maxPartitionBytes": "32KB",    # real scan parallelism
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
}


def test_skew_join_split_engages(spark):
    saved = {}
    for k in _CONFS:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    shutil.rmtree(SCRATCH, ignore_errors=True)
    try:
        # Chunked copy: 16 partitions x 16KB row groups so the join
        # shuffle has many mappers (the production file layout).
        ev = load_table(spark, "/root/testdata/sf0.01", "events")
        (ev.repartition(16).write.option("parquet.block.size", 16384)
           .mode("overwrite").parquet(os.path.join(SCRATCH, "events.parquet")))
        cu = load_table(spark, "/root/testdata/sf0.01", "customer")
        cu.write.mode("overwrite").parquet(os.path.join(SCRATCH, "customer.parquet"))

        for k, v in _CONFS.items():
            spark.conf.set(k, v)

        df = all_queries()["x122_skew_join_zipf"].fn(spark, SCRATCH)
        rows = df.collect()
        assert len(rows) > 0
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE skew split did not engage:\n{plan[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        shutil.rmtree(SCRATCH, ignore_errors=True)


def test_skew_key_distribution_is_zipfian(spark):
    """Sanity: the archetype's derived key really is skewed (~70% of
    rows on one key) — the split test above is meaningless otherwise."""
    from tests.conftest import SF_DIR

    e = load_table(spark, SF_DIR, "events")
    fact = e.select(
        F.when(F.col("user_id") % 10 < 7, F.lit(1).cast("long"))
        .otherwise(F.col("user_id") + 1)
        .alias("skew_key")
    )
    counts = {r["skew_key"]: r["cnt"] for r in
              fact.groupBy("skew_key").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    total = sum(counts.values())
    assert counts[1] / total > 0.5, f"hot key owns {counts[1]}/{total}"
