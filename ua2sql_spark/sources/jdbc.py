"""JDBC append sink — PostgreSQL parity for the reference's batched insert.

The reference accumulates row dicts and flushes a multi-row INSERT every
1000 rows (ua2sql.py:238-246). Spark's JDBC writer batches per partition
with ``batchsize`` — same wire behavior, but one concurrent stream per
partition instead of a single-threaded loop.

Type fidelity (SURVEY §7 hard part 1/2): PostgreSQL column types the
reference declares but Spark lacks are restored at DDL time via
``createTableColumnTypes``:

* ``remote_ip`` → INET (ua2sql.py:51,63,77)
* ``custom_params``/``receipt`` → JSONB (ua2sql.py:68,85)
* ``amount`` → NUMERIC(38,18) (ua2sql.py:82 Numeric — exact money)

No PostgreSQL exists in the test container, but Spark ships embedded
Derby — the write path (append mode, batching, auto-DDL, readback) is
exercised end-to-end against Derby
(``test_jdbc_sink_roundtrip_embedded_derby``); only the PG-specific
DDL types stay integration-gated behind ``pg_types``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REFERENCE_BATCH_SIZE = 1000  # ua2sql.py:238

# Natural keys for idempotent writes (SURVEY §2.9 T4): the reference's
# event tables have no unique constraint (ua2sql.py:46-86) — these are
# the logical-row identities implied by the schema.
NATURAL_KEYS: dict[str, list[str]] = {
    "appStart": ["userid", "ts"],
    "custom": ["userid", "sessionid", "ts", "name"],
    "transaction": ["userid", "sessionid", "ts", "transactionid"],
}

_PG_COLUMN_TYPES: dict[str, dict[str, str]] = {
    "appStart": {"remote_ip": "INET"},
    "custom": {"remote_ip": "INET", "custom_params": "JSONB"},
    "transaction": {
        "remote_ip": "INET",
        "receipt": "JSONB",
        "amount": "NUMERIC(38,18)",
    },
    "JobId": {},
}


def pg_column_types(feed: str) -> dict[str, str]:
    return dict(_PG_COLUMN_TYPES.get(feed, {}))


def jdbc_writer_options(
    feed: str, batchsize: int = REFERENCE_BATCH_SIZE
) -> dict[str, str]:
    """Options for ``df.write.jdbc`` reproducing the reference's sink:
    append mode, 1000-row batches, PG-specific DDL types."""
    opts = {
        "batchsize": str(batchsize),
        "isolationLevel": "READ_COMMITTED",
    }
    cols = pg_column_types(feed)
    if cols:
        opts["createTableColumnTypes"] = ", ".join(
            f"{name} {typ}" for name, typ in cols.items()
        )
    return opts


def write_feed_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    feed: str,
    properties: dict[str, str] | None = None,
    batchsize: int = REFERENCE_BATCH_SIZE,
    pg_types: bool = True,
) -> None:
    """Append ``df`` to a JDBC table with the reference's batching.

    Mirrors ua2sql.py:209-246; auto-creates the table on first write
    (the reference's metadata.create_all, ua2sql.py:91). ``pg_types``
    emits the PostgreSQL-specific DDL types (INET/JSONB/NUMERIC); turn
    it off for non-PG targets (the e2e test runs against embedded
    Derby, which Spark ships)."""
    props = dict(properties or {})
    props.update(jdbc_writer_options(feed, batchsize))
    if not pg_types:
        props.pop("createTableColumnTypes", None)
    df.write.mode("append").options(**props).jdbc(url, table, properties=props)


def upsert_feed_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    feed: str,
    key_cols: list[str] | None = None,
    properties: dict[str, str] | None = None,
    batchsize: int = REFERENCE_BATCH_SIZE,
    pg_types: bool = True,
    ts_col: str = "ts",
) -> int:
    """Idempotent insert-if-absent (the T4 exactly-once upgrade,
    SURVEY §4 custom-work item 4): re-delivered rows become no-ops, so
    at-least-once delivery (the reference's checkpoint-after-commit
    crash window, ua2sql.py:274-278) lands each logical row once.

    Plan: (1) ``dropDuplicates(keys)`` inside the batch, (2) left-anti
    join against the target's *existing keys* — the JDBC read projects
    only the key columns and, when ``ts_col`` is a key, pushes a
    ``ts BETWEEN batch_min AND batch_max`` predicate down to the
    database, so the anti-join side is bounded by the batch's event-time
    span rather than the whole history (the 100 TB requirement: a day's
    re-ingest must not scan years of target keys), (3) append survivors
    with the reference's batching.

    Engine-agnostic composition (runs against Derby in tests and PG in
    production); correctness needs a single writer per table — the
    reference's own serial model (ua2sql.py:293-295). On PostgreSQL a
    staging table + ``INSERT … ON CONFLICT DO NOTHING`` is the strictly
    atomic multi-writer variant; same dataflow, different final hop.

    Returns the number of rows actually appended."""
    keys = list(key_cols or NATURAL_KEYS[feed])
    spark = df.sparkSession
    fresh = df.dropDuplicates(keys)
    try:
        existing = spark.read.jdbc(url, table, properties=dict(properties or {}))
        existing = existing.select(*keys)
    except Exception:
        existing = None  # first write: target table absent
    if existing is not None:
        if ts_col in keys:
            bounds = fresh.agg(
                F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
            ).collect()[0]
            if bounds["lo"] is not None:
                # Keep NULL-ts target rows in the probe set: the bounds
                # pushdown is only an optimization, and BETWEEN drops
                # NULLs — without the isNull disjunct a re-delivered
                # NULL-ts row could never see its existing copy and the
                # eqNullSafe idempotency below would be defeated.
                existing = existing.filter(
                    F.col(ts_col).between(F.lit(bounds["lo"]), F.lit(bounds["hi"]))
                    | F.col(ts_col).isNull()
                )
        # Null-safe key equality: the reference's schema allows NULL in
        # every non-ts key (e.g. sessionid, ua2sql.py:62) and a plain
        # equality anti-join would re-insert NULL-keyed rows forever.
        # `<=>` keeps the join an equi-join for the planner (hashable
        # keys), so this still runs as broadcast/sort-merge, not NLJ.
        lhs, rhs = fresh.alias("b"), existing.alias("t")
        cond = None
        for k in keys:
            c = F.col(f"b.{k}").eqNullSafe(F.col(f"t.{k}"))
            cond = c if cond is None else cond & c
        fresh = lhs.join(rhs, cond, "left_anti")
    # Inserted-count from the write job's own metrics (observe), not a
    # separate count() — counting first would execute the anti-join
    # twice, a full extra pass over the diff at scale. Writing an empty
    # diff is a harmless no-op append, so no pre-count gate is needed.
    from pyspark.sql import Observation

    obs = Observation("upsert_fresh_rows")
    fresh = fresh.observe(obs, F.count(F.lit(1)).alias("rows"))
    write_feed_jdbc(
        fresh, url, table, feed,
        properties=properties, batchsize=batchsize, pg_types=pg_types,
    )
    return int(obs.get["rows"])


def jdbc_upsert_sink(
    url: str,
    table: str,
    feed: str,
    key_cols: list[str] | None = None,
    properties: dict[str, str] | None = None,
    pg_types: bool = True,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` closure over :func:`upsert_feed_jdbc` — plug into
    ``streaming.ingest.stream_feed`` for an end-to-end exactly-once-effect
    pipeline: the checkpoint gives at-least-once micro-batches, the
    key-anti-join makes re-deliveries no-ops."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        upsert_feed_jdbc(
            batch_df, url, table, feed,
            key_cols=key_cols, properties=properties, pg_types=pg_types,
        )

    return sink
