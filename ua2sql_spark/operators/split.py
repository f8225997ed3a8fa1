"""Deterministic hash-based dataset splitting — the train/val/test
assignment a training-data pipeline needs (SURVEY §2.11 extension).

Unlike ``randomSplit`` (seed- and partitioning-dependent), assignment
derives from a content hash: stable under re-runs, repartitioning and
incremental appends — the property that matters when the corpus is
100 TB and splits must never leak across reruns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets) from md5 of the key — identical in
    DuckDB as ('0x'||substring(md5(k),1,15))::BIGINT % n."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(n_buckets))


def hash_split(
    df: DataFrame,
    key_col: str,
    val_pct: int = 10,
    test_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Assign 'train'/'val'/'test' by hash bucket of ``key_col``."""
    b = hash_bucket(F.col(key_col))
    return df.withColumn(
        split_col,
        F.when(b < val_pct, "val")
        .when(b < val_pct + test_pct, "test")
        .otherwise("train"),
    )
