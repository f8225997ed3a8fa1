"""Streaming distribution-drift monitor (PSI per micro-batch).

The online twin of ``queries/events_analytics.x167_value_drift_psi``:
a baseline histogram is frozen ONCE from a reference window, and every
micro-batch of the live stream is scored against it — the
model/data-monitoring loop that pages someone when an upstream change
shifts a feature distribution mid-ingest, instead of a nightly batch
job discovering it a day late.

Reference provenance: the reference has no monitoring surface at all
(ua2sql.py lands rows blind); this is part of the "operations a 100 TB
pipeline needs" extension tier, same as the rollup sink beside it.

Design (the 100 TB argument):

* The baseline is ``n_bins`` counts + shared global edges — a bounded
  driver-side object broadcast into the batch closure. Nothing about
  the reference window is re-read at stream time.
* Per batch, binning is MAP-ONLY expression work and the only shuffle
  is an ``n_bins``-bounded aggregate; the PSI fold then runs on
  ``n_bins`` integers driver-side (exact, no floating shuffle order).
* One monitor row (epoch, psi, n_rows, n_onesided) is appended per
  batch — the monitor table grows with EPOCHS, not data.
* Bins empty on either side are excluded from the sum and counted in
  ``n_onesided`` (same no-epsilon policy as x167): a genuinely new
  mode shows up as n_onesided > 0, which is itself a drift signal.
* NULLs are a BIN, not an omission: a null-surge upstream (schema or
  parser change) is a canonical drift event, so the null fraction
  participates in the PSI sum exactly like a value bin and is also
  reported as ``n_null``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_baseline(df: DataFrame, col: str, n_bins: int = 10) -> dict:
    """Freeze the reference histogram: global [lo, hi] plus per-bin
    counts. One aggregate + one ``n_bins``-bounded collect."""
    lo, hi = df.agg(F.min(col), F.max(col)).first()
    if lo is None or lo == hi:
        raise ValueError(f"degenerate baseline range for {col!r}: [{lo}, {hi}]")
    counts = _bin_counts(df, col, float(lo), float(hi), n_bins)
    return {
        "col": col,
        "lo": float(lo),
        "hi": float(hi),
        "n_bins": n_bins,
        # index n_bins is the NULL bin
        "counts": counts,
    }


def _bin_counts(df: DataFrame, col: str, lo: float, hi: float, n_bins: int) -> list[int]:
    """Per-bin counts with NULLs as the extra trailing bin (a NULL
    value bins to a NULL key, which groupBy keeps as its own group)."""
    got = {
        r["bin"]: r["c"]
        for r in df.select(_bin_expr(col, lo, hi, n_bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    return [got.get(b, 0) for b in range(n_bins)] + [got.get(None, 0)]


def _bin_expr(col: str, lo: float, hi: float, n_bins: int):
    # the NULL guard is explicit because greatest() SKIPS nulls
    # (greatest(0, NULL) = 0): without it a NULL value would silently
    # land in bin 0 instead of the null bin
    clamped = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(col) - F.lit(lo)) / F.lit(hi - lo) * n_bins),
        ),
    )
    return F.when(F.col(col).isNotNull(), clamped).cast("bigint")


def batch_psi(batch: DataFrame, baseline: dict) -> dict:
    """Score ONE batch against the frozen baseline. Returns
    ``{"psi", "n_rows", "n_onesided"}`` — exact integer ratios, the
    n_bins-sized fold done driver-side."""
    n_bins = baseline["n_bins"]
    cur = _bin_counts(
        batch, baseline["col"], baseline["lo"], baseline["hi"], n_bins
    )
    na, nb = sum(baseline["counts"]), sum(cur)
    psi, onesided = 0.0, 0
    if nb:
        for ca, cb in zip(baseline["counts"], cur):
            if ca > 0 and cb > 0:
                p, q = ca / na, cb / nb
                psi += (q - p) * math.log(q / p)
            elif ca > 0 or cb > 0:
                onesided += 1
    return {
        "psi": psi,
        "n_rows": nb,
        "n_onesided": onesided,
        "n_null": cur[n_bins],
    }


def psi_monitor_sink(baseline: dict, monitor_path: str):
    """``foreachBatch`` closure appending one monitor row per epoch.
    Idempotence note: under epoch replay the same epoch_id appears
    twice with identical values — readers dedupe on epoch_id (the
    same at-least-once contract as the rollup sink)."""

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        # no isEmpty() pre-probe: foreachBatch inputs re-read their
        # source per action, so probing would scan the batch twice —
        # batch_psi's one aggregate learns emptiness for free
        m = batch_psi(batch, baseline)
        if m["n_rows"] == 0:
            return
        spark = batch.sparkSession
        spark.createDataFrame(
            [
                (
                    int(epoch_id),
                    m["psi"],
                    m["n_rows"],
                    m["n_onesided"],
                    m["n_null"],
                )
            ],
            "epoch_id bigint, psi double, n_rows bigint, "
            "n_onesided bigint, n_null bigint",
        ).write.mode("append").parquet(monitor_path)

    return _sink
