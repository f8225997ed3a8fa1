"""Incremental view maintenance from a change feed.

``streaming/rollup.py`` maintains standing aggregates from APPEND-ONLY
batches — correct for immutable event streams, wrong the moment the
base table supports updates/deletes (which ``operators/snapshot.py``'s
MERGE does). This module closes that gap with the differential rule:
every change-feed row carries a sign (+1 for insert/update_postimage,
-1 for delete/update_preimage), so the aggregate DELTA per group is a
plain signed sum and the refreshed view is ``old + delta`` — updates
and deletes maintain COUNT/SUM views exactly, without ever re-reading
the base table.

Reference provenance: the reference delegates all aggregation to
PostgreSQL (README.md:28); at 100 TB a standing view must refresh from
deltas. This is the CDF-consumer counterpart of the rollup sink.

Design (the 100 TB argument):

* The feed is churn-proportional (``snapshot.changes_since``), the
  signed delta aggregate is one |touched groups|-bounded shuffle, and
  the view rewrite touches only the HASH BUCKETS holding touched
  groups (dynamic partition overwrite over ``pmod(xxhash64(group), B)``
  bucket dirs) — refresh cost scales with churn, never view size.
* COUNT and SUM are the differentiable aggregates (signed-sum
  monoids); sums ride the decimal interior (``queries/common.py``
  policy) so the view is bit-identical to a from-scratch rebuild —
  tested as the soundness invariant. AVG derives as sum/count at read
  time. MIN/MAX are NOT differentiable under deletes (a retracted
  extremum needs the base table); refuse rather than approximate.
* Groups whose count reaches zero are dropped from the view (their
  bucket is rewritten without them), so deletes fully erase.
* Single writer, same as every maintenance op here; under epoch
  replay apply the same feed twice and the view double-counts — the
  CDF cursor's commit protocol exists precisely to prevent that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

DEC = "decimal(28,8)"
_N_BUCKETS = 64

_SIGN = {
    "insert": 1,
    "update_postimage": 1,
    "delete": -1,
    "update_preimage": -1,
}


def build_view(base: DataFrame, group_col: str, val_col: str, view_path: str) -> None:
    """Materialize the COUNT/SUM view from a base snapshot — the
    bootstrap (run once; every later refresh is differential)."""
    (
        base.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # cast back to DEC: Spark widens SUM(decimal(28,8)) to
            # (38,8), and a view written (38,8) then refreshed (28,8)
            # leaves mixed parquet decimal widths in one bucket dir
            F.sum(F.col(val_col).cast(DEC)).cast(DEC).alias("sum_value"),
        )
        .withColumn("bucket", F.pmod(F.xxhash64("grp"), F.lit(_N_BUCKETS)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(view_path)
    )


def refresh_from_feed(
    spark: SparkSession,
    view_path: str,
    feed: DataFrame,
    group_col: str,
    val_col: str,
) -> int:
    """Apply one change-feed batch to the materialized view. Returns
    the number of touched GROUPS (0 = nothing to do)."""
    sign = F.col("_change_type")
    sign_expr = None
    for ct, sg in _SIGN.items():
        cond = sign == ct
        sign_expr = (
            F.when(cond, sg) if sign_expr is None else sign_expr.when(cond, sg)
        )
    delta = (
        feed.select(
            F.col(group_col).alias("grp"),
            F.col(val_col),
            sign_expr.alias("sg"),
        )
        .filter(F.col("sg").isNotNull())
        .groupBy("grp")
        .agg(
            F.sum("sg").cast("bigint").alias("dn"),
            F.sum(F.col(val_col).cast(DEC) * F.col("sg")).cast(DEC).alias("dsum"),
        )
    )
    # Materialize the churn-proportional delta ONCE: it is consumed
    # twice (bucket discovery here, the merge-write below) and would
    # otherwise re-execute the change-feed scan + signed-sum shuffle.
    touched = delta.withColumn(
        "bucket", F.pmod(F.xxhash64("grp"), F.lit(_N_BUCKETS))
    ).localCheckpoint(eager=True)
    n_groups = touched.count()
    if n_groups == 0:
        return 0
    buckets = [r["bucket"] for r in touched.select("bucket").distinct().collect()]
    try:
        existing = spark.read.parquet(view_path).filter(
            F.col("bucket").isin(buckets)
        )
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" not in str(exc):
            raise
        existing = None
    if existing is None:
        merged = touched.select(
            "grp",
            F.col("dn").alias("n"),
            F.col("dsum").cast(DEC).alias("sum_value"),
            "bucket",
        )
    else:
        merged = (
            existing.select("grp", "n", "sum_value", "bucket")
            .unionByName(
                touched.select(
                    "grp",
                    F.col("dn").alias("n"),
                    F.col("dsum").cast(DEC).alias("sum_value"),
                    "bucket",
                )
            )
            .groupBy("grp", "bucket")
            .agg(
                F.sum("n").cast("bigint").alias("n"),
                F.sum("sum_value").cast(DEC).alias("sum_value"),
            )
        )
    # Materialize the survivors once: consumed by the write AND by the
    # emptied-bucket discovery below.
    survivors = merged.filter(F.col("n") > 0).localCheckpoint(eager=True)
    (
        survivors.coalesce(1)  # a bucket of group aggregates is tiny by construction
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(view_path)
    )
    # Dynamic partition overwrite only rewrites buckets PRESENT in the
    # written data — a touched bucket whose every group reached count
    # zero has no surviving rows, so its stale directory would outlive
    # the delete. Erase those directories explicitly (driver-side, but
    # bounded by the ≤_N_BUCKETS touched set).
    if existing is not None:
        alive = {
            r["bucket"] for r in survivors.select("bucket").distinct().collect()
        }
        emptied = [b for b in buckets if b not in alive]
        if emptied:
            jvm = spark._jvm
            jsc = spark._jsc
            root = jvm.org.apache.hadoop.fs.Path(view_path)
            fs = root.getFileSystem(jsc.hadoopConfiguration())
            for b in emptied:
                p = jvm.org.apache.hadoop.fs.Path(root, f"bucket={b}")
                fs.delete(p, True)
    return n_groups


def read_view(spark: SparkSession, view_path: str) -> DataFrame:
    """The maintained view with AVG derived at read time."""
    v = spark.read.parquet(view_path)
    return v.select(
        "grp",
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
        (F.col("sum_value").cast("double") / F.col("n")).alias("avg_value"),
    )
