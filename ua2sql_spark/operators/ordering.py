"""Scale-safe global ordering over a deterministic hash key.

The primitive under epoch shuffling (x104) and token-budget sampling
(x113): every row gets its global rank — and optionally its inclusive
running weight total — in the order of ``md5(seed|id)``, a
rerun/engine/partitioning-stable pseudorandom permutation.

The naive plan is one global Window (single-partition sort — dead at
scale). Instead, rows bucket by the first ``prefix_len`` hex chars of
the sort hash; per-bucket windows run in parallel, and a tiny
``16^prefix_len``-row offset table (cumulative counts/weights of all
smaller buckets) broadcasts back. Because the bucket is a *prefix* of
the sort key, (bucket, hash, id) order ≡ (hash, id) order — so results
are exactly those of the global window, provable against a plain
``row_number()/SUM() OVER (ORDER BY hash)`` oracle.

prefix_len is the scale dial: 2 → 256 buckets (default), 4 → 65,536
(≈1.5 M-row buckets at 10¹¹ rows). The offset table stays broadcast-
sized in either case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_ordered(
    df: DataFrame,
    id_col: str,
    weight_col: str | None = None,
    seed: str = "42",
    prefix_len: int = 2,
    pos_col: str = "pos",
    cum_col: str = "cum_weight",
) -> DataFrame:
    """All input columns plus ``pos`` (1-based global rank in
    md5(seed|id) order) and — when ``weight_col`` is given —
    ``cum_weight`` (inclusive running sum of the weight in that order).

    Precondition: ``id_col`` values must be unique (callers pass primary
    keys — doc_id, event id). Duplicate ids share an identical
    (hash, id) sort key, so their relative order — hence pos/cum_weight
    among the duplicates — would be nondeterministic across runs.
    """
    h = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    hashed = df.withColumn("__h", h).withColumn(
        "__b", F.substring(F.col("__h"), 1, prefix_len)
    )

    in_bucket = Window.partitionBy("__b").orderBy("__h", id_col)
    per_row = [F.row_number().over(in_bucket).alias("__rn")]
    per_bucket = [F.count(F.lit(1)).alias("__n")]
    if weight_col is not None:
        running = in_bucket.rowsBetween(Window.unboundedPreceding, 0)
        per_row.append(F.sum(weight_col).over(running).alias("__rw"))
        per_bucket.append(F.sum(weight_col).alias("__w"))

    counts = hashed.groupBy("__b").agg(*per_bucket)
    prior = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [F.coalesce(F.sum("__n").over(prior), F.lit(0)).alias("__off_n")]
    if weight_col is not None:
        off_cols.append(
            F.coalesce(F.sum("__w").over(prior), F.lit(0)).alias("__off_w")
        )
    offsets = counts.select("__b", *off_cols)

    out = hashed.select("*", *per_row).join(F.broadcast(offsets), "__b")
    result_cols = [F.col(c) for c in df.columns]
    result_cols.append(
        (F.col("__off_n") + F.col("__rn")).cast("bigint").alias(pos_col)
    )
    if weight_col is not None:
        result_cols.append((F.col("__off_w") + F.col("__rw")).alias(cum_col))
    return out.select(*result_cols)
