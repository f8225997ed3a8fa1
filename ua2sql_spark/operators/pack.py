"""Token-sequence packing: concat-and-chunk a document stream into
fixed-capacity training sequences (the GPT-style packing pass), built
on a distributed prefix sum.

Semantics: documents are concatenated in ``order_col`` order into one
global token stream, which is cut every ``max_len`` tokens; each output
row is the overlap of one document with one sequence —
(doc, seq_id, seq_offset, n_tokens). A document crossing a boundary
emits one row per sequence it touches.

The primitive underneath is ``distributed_cumsum`` — a two-phase
parallel scan, because a single global window (``Window.orderBy`` with
no partition) collapses 100 TB onto ONE task:

  1. range-partition on the order column (global order across
     partitions, sampling exchange only),
  2. per-partition local cumulative sums (bounded windows),
  3. per-partition totals → driver (one tiny row per partition),
     exclusive-prefix them, broadcast the offsets back as a literal map.

Cost: one range exchange + one O(num_partitions) driver step. The
range-partitioned frame is pinned with ``localCheckpoint`` because the
totals job and the window job must observe the SAME sampled partition
boundaries (range-partitioner sampling is per-job otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum_excl",
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds ``out_col`` = exclusive prefix sum of ``value_col`` in global
    ``order_col`` order, without a global single-task window."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = part.groupBy("__pid").agg(F.sum(value_col).alias("__t")).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["__pid"]):
        offsets[r["__pid"]] = acc
        acc += r["__t"] or 0
    off = F.create_map(
        *[x for pid, o in offsets.items() for x in (F.lit(pid), F.lit(o))]
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(value_col).over(w), F.lit(0).cast("bigint"))
    return part.withColumn(
        out_col, (local + off[F.col("__pid")]).cast("bigint")
    ).drop("__pid")


def pack_sequences(
    df: DataFrame,
    order_col: str,
    ntok_col: str,
    max_len: int,
) -> DataFrame:
    """(doc, seq_id, seq_offset, n_tokens) rows assigning every token of
    every document to exactly one fixed-length sequence. Pure integer
    arithmetic on the prefix sum — deterministic, and the per-doc row
    expansion is a ``sequence``+``explode`` projection (no shuffle after
    the scan's range exchange)."""
    c = distributed_cumsum(df, order_col, ntok_col, out_col="__s")
    s, n = F.col("__s"), F.col(ntok_col)
    first = F.expr(f"__s DIV {max_len}")
    last = F.expr(f"(__s + {ntok_col} - 1) DIV {max_len}")
    out = c.filter(n > 0).select(
        F.col(order_col),
        n.alias("__n"),
        s,
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * max_len
    seg_start = F.greatest(s, seq_start)
    seg_end = F.least(s + F.col("__n"), seq_start + max_len)
    return out.select(
        F.col(order_col),
        F.col("seq_id").cast("bigint").alias("seq_id"),
        (seg_start - seq_start).cast("bigint").alias("seq_offset"),
        (seg_end - seg_start).cast("bigint").alias("n_tokens"),
    )
