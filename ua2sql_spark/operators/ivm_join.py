"""Incrementally-maintained JOIN views over CoW snapshot tables.

``operators/ivm.py`` maintains COUNT/SUM aggregate views from a change
feed; this module covers the other standing-view archetype a warehouse
materializes: the KEYED equi-join view ``V = A ⋈ B ON k`` (dimension
enrichment, feature joins), kept current from BOTH base tables' change
feeds without ever recomputing the join.

Design — "the view IS a table":

* ``V`` is itself a copy-on-write snapshot table (``upsert_cow`` /
  ``delete_cow`` keyed on the join key), so the maintained view gets
  time travel, a change feed, layout health, compaction, tags and
  clones FOR FREE — downstream consumers can chain another IVM off the
  view's own feed.
* Refresh rule (delta-join specialized to unique-key equi joins —
  both sides keyed by ``k``, at most one row per key per side): the
  set of keys whose view row can have changed is exactly
  ``K = keys(ΔA) ∪ keys(ΔB)``. Recompute the join FOR K ONLY
  (semi-join both sides down to K, one churn-sized inner join), upsert
  the rows that exist, delete the K-keys that no longer join. No
  general signed-multiplicity machinery is needed because unique keys
  make the join row a pure function of the two current rows — and the
  unique-key precondition is the same one ``upsert_cow`` already
  imposes on its batches.
* Scale shape: the change feeds are churn-proportional
  (``snapshot_changes`` diffs only changed files); K is
  churn-bounded; both base-table slices are key-semi-joins against
  the CURRENT snapshots — with per-file stats (``stats_cols``) or
  key-clustered layout those reads prune to the files holding K, and
  in the worst case they are one scan each, never a re-join of A×B.
  The view rewrite touches only partitions holding K (the CoW
  upsert/delete contract).
* Refresh is idempotent per (va, vb) target: re-running against the
  same base versions recomputes the same K-rows and upserts them
  key-idempotently (the at-least-once property every maintenance verb
  here carries). Cursor state (which base versions the view reflects)
  rides the view's OWN commit metadata, so a crash between the upsert
  and delete commits is repaired by re-running the refresh.

Reference parity: the reference keeps only latest-state base tables
(ua2sql.py:223-236) and delegates joins to PostgreSQL; standing join
views refreshed from deltas are this engine's extension (SURVEY §2.11
X12), the Delta Live Tables / materialized-view analog.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ua2sql_spark.operators.snapshot import (
    _read_sidecar_fail_closed,
    _write_sidecar_atomic,
    delete_cow,
    latest_version,
    read_snapshot,
    snapshot_changes,
    upsert_cow,
)

_CURSOR_SIDECAR = "_join_view_cursor.json"


def _read_cursor(spark: SparkSession, view_path: str) -> dict:
    # Fail-closed like _tags.json/_clones.json (ADVICE r13 #1): a writer
    # crash between delete and rename must surface as the staged-sidecar
    # recovery error, not as "no cursor -> full view rebuild".
    raw = _read_sidecar_fail_closed(spark, view_path, _CURSOR_SIDECAR)
    if raw is None:
        raise ValueError(
            f"{view_path} has no join-view cursor; build_join_view first"
        )
    return json.loads(raw)


def _write_cursor(spark: SparkSession, view_path: str, cur: dict) -> None:
    _write_sidecar_atomic(
        spark, view_path, _CURSOR_SIDECAR, json.dumps(cur, sort_keys=True)
    )


def _joined(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """The view's row shape: A's columns plus B's non-key columns
    (name-collision-free by precondition), inner-joined on the key."""
    b_cols = [c for c in b.columns if c != key]
    return a.join(b.select(key, *b_cols), key, "inner")


def build_join_view(
    spark: SparkSession,
    a_path: str,
    b_path: str,
    key: str,
    partition_col: str,
    view_path: str,
) -> int:
    """Materialize ``V = A ⋈ B ON key`` as a fresh CoW snapshot table
    and record which base versions it reflects. ``partition_col`` must
    be a column of A (it partitions the view like any CoW table).
    Returns the view's v0."""
    va = latest_version(spark, a_path)
    vb = latest_version(spark, b_path)
    if va is None or vb is None:
        raise ValueError("both base tables need at least one snapshot")
    a = read_snapshot(spark, a_path, va)
    b = read_snapshot(spark, b_path, vb)
    overlap = (set(a.columns) & set(b.columns)) - {key}
    if overlap:
        raise ValueError(
            f"non-key column collision between base tables: {sorted(overlap)}; "
            "rename before building the view"
        )
    v0, _ = upsert_cow(_joined(a, b, key), view_path, [key], partition_col)
    _write_cursor(
        spark, view_path,
        {"a_path": a_path, "b_path": b_path, "key": key,
         "partition_col": partition_col, "a_version": va, "b_version": vb},
    )
    return v0


def refresh_join_view(spark: SparkSession, view_path: str) -> dict:
    """Advance the view to the base tables' LATEST versions: one
    churn-sized recompute of the keys either feed touched, one upsert
    commit for rows that (still) join, one delete commit for touched
    keys that no longer do. Returns refresh metrics. No-op (zero
    commits) when neither base advanced."""
    cur = _read_cursor(spark, view_path)
    key = cur["key"]
    part = cur["partition_col"]
    va0, vb0 = cur["a_version"], cur["b_version"]
    va1 = latest_version(spark, cur["a_path"])
    vb1 = latest_version(spark, cur["b_path"])
    touched = None
    if va1 > va0:
        ka = snapshot_changes(spark, cur["a_path"], va0, va1, [key]).select(key)
        touched = ka
    if vb1 > vb0:
        kb = snapshot_changes(spark, cur["b_path"], vb0, vb1, [key]).select(key)
        touched = kb if touched is None else touched.unionByName(kb)
    if touched is None:
        return {"upserted": 0, "deleted": 0, "a_version": va0,
                "b_version": vb0}
    # churn-bounded and consumed by three passes (slice semi-joins +
    # the delete anti-join): materialize once
    touched = touched.distinct().localCheckpoint()
    if touched.rdd.isEmpty():
        # Bases advanced but the change feed is value-empty (e.g. a
        # compaction-only commit on a base, ADVICE r13 #4): advance the
        # cursor without committing an empty upsert/delete pair — the
        # view's version history stays churn-proportional, not
        # maintenance-pass-proportional.
        _write_cursor(spark, view_path, {**cur, "a_version": va1,
                                         "b_version": vb1})
        return {"upserted": 0, "deleted": 0, "a_version": va1,
                "b_version": vb1}

    a1 = read_snapshot(spark, cur["a_path"], va1).join(touched, key, "left_semi")
    b1 = read_snapshot(spark, cur["b_path"], vb1).join(touched, key, "left_semi")
    fresh = _joined(a1, b1, key).localCheckpoint()

    _, n_up = upsert_cow(fresh, view_path, [key], part)
    # touched keys with no current join row: remove from the view
    # (covers deletes on either side AND updates that break the match)
    gone = touched.join(fresh.select(key), key, "left_anti")
    _, n_del = delete_cow(spark, view_path, gone, part, key_cols=[key])
    _write_cursor(spark, view_path, {**cur, "a_version": va1,
                                     "b_version": vb1})
    return {"upserted": n_up, "deleted": n_del, "a_version": va1,
            "b_version": vb1}
