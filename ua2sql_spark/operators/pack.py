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

  1. bucket rows by explicit range boundaries sampled with
     ``approxQuantile`` (driver-side literals — a stats pass, no data
     movement),
  2. per-bucket local cumulative sums — the bucketed window's required
     clustering IS the plan's single data exchange,
  3. per-bucket totals → driver (one tiny row per bucket),
     exclusive-prefix them, broadcast the offsets back as a literal map.

Cost: exactly ONE data exchange (hash on the bucket id) + a quantile
sketch pass + an O(num_buckets) driver step. An earlier variant used
``repartitionByRange`` + ``spark_partition_id``, which re-shuffled the
full dataset a second time for the window (the checkpoint hides range
partitioning from the planner); bucketing by literal boundaries lets
the window reuse the one exchange. Boundary quality only affects
balance, never correctness — equal keys always land in one bucket
(strict ``>`` comparisons), and the prefix offsets absorb any skew in
bucket sizes. The bucketed cumsum frame is ``localCheckpoint``-pinned
so the totals job and the consuming job execute the exchange once.
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
    ``order_col`` order, without a global single-task window.
    ``order_col`` must be numeric (quantile-sketchable) with unique
    values (it is the total order of the scan)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    bounds: list[float] = []
    if n > 1:
        qs = [i / n for i in range(1, n)]
        bounds = sorted(set(df.stat.approxQuantile(order_col, qs, 0.01)))
    bkt = F.lit(0)
    for x in bounds:
        bkt = bkt + F.when(F.col(order_col) > F.lit(x), 1).otherwise(0)

    w = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = (
        df.withColumn("__bkt", bkt.cast("int"))
        .withColumn(
            "__local",
            F.coalesce(F.sum(value_col).over(w), F.lit(0).cast("bigint")),
        )
        .localCheckpoint(eager=True)
    )
    totals = local.groupBy("__bkt").agg(F.sum(value_col).alias("__t")).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["__bkt"]):
        offsets[r["__bkt"]] = acc
        acc += r["__t"] or 0
    if offsets:
        off = F.create_map(
            *[x for b, o in offsets.items() for x in (F.lit(b), F.lit(o))]
        )[F.col("__bkt")]
    else:
        # empty input: F.create_map() with zero args types as
        # map<void,void> and fails analysis; the offset of nothing is 0
        off = F.lit(0).cast("bigint")
    return local.withColumn(
        out_col, (F.col("__local") + off).cast("bigint")
    ).drop("__bkt", "__local")


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
