"""Distributed as-of join (SURVEY §2.3 J8).

Spark has no native ASOF JOIN; the idiomatic distributed form avoids
non-equi joins entirely: union the probe and reference sides, order by
(key, ts, side) and carry the last reference value forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding frame.

One shuffle by key, linear in input — versus the quadratic blowup of a
naive ``ts <= probe_ts`` theta join. The reference's checkpoint lookup
(latest jobId per type, ua2sql.py:165-176) is the degenerate
single-probe case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    reference: DataFrame,
    on: str,
    probe_ts: str = "ts",
    ref_ts: str = "ts",
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each probe row, attach the reference row values with the
    greatest ``ref_ts`` ≤ (or < if ``strict``) the probe's ts, per key.

    Returns the probe columns plus ``<col>_asof`` for each value column
    (default: all reference columns except the key and ts).
    """
    value_cols = value_cols or [
        c for c in reference.columns if c not in (on, ref_ts)
    ]
    p = probe.select(
        *probe.columns,
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__is_probe"),
        *[F.lit(None).cast(reference.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    # __ts must be derived before probe-shaped NULL columns shadow any
    # same-named reference column (e.g. both sides calling their ts "ts").
    r = reference.select(
        F.col(on),
        F.col(ref_ts).alias("__ts"),
        F.lit(0).alias("__is_probe"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[
            F.lit(None).cast(probe.schema[c].dataType).alias(c)
            for c in probe.columns
            if c != on
        ],
    )

    # At equal ts: reference sorts before probe (is_probe 0 < 1) so ties
    # match unless `strict`, where probe sorts first.
    side_order: Column = F.col("__is_probe") if not strict else -F.col("__is_probe")
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = p.unionByName(r)
    for c in value_cols:
        carried = carried.withColumn(
            f"{c}_asof", F.last(f"__v_{c}", ignorenulls=True).over(w)
        )
    return carried.filter(F.col("__is_probe") == 1).select(
        *probe.columns, *[f"{c}_asof" for c in value_cols]
    )
