"""Hive-style bucketed tables — the pay-the-shuffle-once join path.

At 100 TB the dominant cost of a recurring fact-fact join (orders ⋈
lineitem on orderkey, events ⋈ events on user, fingerprint-index ⋈
new-batch on band key) is shuffling BOTH sides on every run. Bucketing
moves that exchange to write time: ``bucketBy(n, key)`` hash-partitions
rows into a fixed bucket layout recorded in the table catalog, so every
subsequent equi-join between tables bucketed on the same key with the
same bucket count satisfies the join's HashClusteredDistribution
straight off the scan — the physical plan is a SortMergeJoin with NO
Exchange on either side (pinned by tests/test_bucketing.py). The
workload's steady-state cost drops from O(runs × shuffle) to
O(1 × shuffle + runs × co-located scan).

Two further scan-time wins come free from the same layout:

* **Bucket pruning** — an equality filter on the bucket key reads only
  the matching bucket's files (``SelectedBucketsCount: 1 out of n`` in
  the scan node), the point-lookup analog of partition pruning but on a
  high-cardinality key partitioning could never hold.
* **Exchange-free aggregation** — a groupBy on the bucket key likewise
  satisfies its ClusteredDistribution from the scan: no shuffle before
  the final aggregate.

The reference keeps its analytical tables in PostgreSQL where the
planner hash-joins in one box (ua2sql.py:51 engine setup); bucketing is
the distributed counterpart an engine must provide for the same query
shapes to stay cheap when the tables stop fitting one box.

Choosing n_buckets at scale: buckets are fixed at write time and every
writing task opens a file per bucket it touches, so pick
``n_buckets ≈ table_bytes / target_file_bytes`` (128–512 MB targets)
and route the write through :func:`write_bucketed`'s repartition-on-key
so each bucket is produced by exactly one task (one file per bucket,
no small-file fanout — a 1000-task write into 1024 buckets would
otherwise emit up to 1000×1024 files).

Bucketed writes are exact-layout contracts: Spark refuses bucketed
``insertInto`` under dynamic overwrite and joins only elide the
exchange when bucket counts match (or one divides the other with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) — both verified
in the tests rather than assumed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | Sequence[str],
    n_buckets: int,
    *,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed (and bucket-sorted) on
    ``key``.

    The input is first repartitioned on the bucket key into
    ``n_buckets`` partitions so each bucket is written by exactly one
    task — one file per bucket, which both avoids the small-file
    fanout and is the layout under which Spark trusts ``sortBy`` order
    at read time. ``path`` makes the table external (data under the
    caller's directory; dropping the table keeps the files).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    writer = (
        df.repartition(n_buckets, *keys)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, keys[0], *keys[1:])
        .sortBy(*(sort_cols or keys))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-bucket-count tables written by
    :func:`write_bucketed`.

    This is a plain ``DataFrame.join`` — the exchange elision is a
    property of the scan's reported output partitioning, not of any
    special join API. Kept as a named operator so the plan contract
    (SortMergeJoin, zero Exchange) has a single pinned entry point.
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
