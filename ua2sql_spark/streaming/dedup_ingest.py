"""Continuous dedup ingest: the composed streaming sink a corpus build
actually runs — every micro-batch is deduplicated within itself, then
against the WHOLE historical corpus, and only the survivors commit to
the versioned table.

Composes three proven layers instead of inventing a fourth:

* in-batch dedup = one fingerprint ``groupBy`` (``x41``'s exact tier,
  injective content encoding from ``operators/dedup.exact_dedup``);
* cross-corpus dedup = one anti-join against a FINGERPRINT INDEX
  (``x117``'s daily-path design: hash + survivor id only, ~50 B/doc —
  the day's batch drives the join, never the 100 TB history);
* the commit = ``operators/snapshot.upsert_cow`` (CoW versions, so
  every training run can pin the exact corpus version it read).

Crash ordering (at-least-once by construction): the TABLE commits
before the index appends. A crash between the two replays the batch —
``upsert_cow`` is key-idempotent, so the table converges and the index
catches up. The reverse order would be data LOSS: fingerprints
claiming documents the table never received, silently dropping them
from every future batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fingerprint(text_col: str) -> F.Column:
    # length-prefixed (injective) like exact_dedup: NULL text must not
    # collide with the empty string
    v = F.col(text_col).cast("string")
    return F.sha2(
        F.when(v.isNull(), F.lit("\x00N")).otherwise(
            F.concat(F.length(v).cast("string"), F.lit(":"), v)
        ),
        256,
    )


def _index_exists(spark: SparkSession, index_path: str) -> bool:
    from ua2sql_spark.operators.snapshot import _jfs

    jvm, fs, p = _jfs(spark, index_path)
    return fs.exists(p)


def dedup_ingest_batch(
    batch: DataFrame,
    table_path: str,
    index_path: str,
    id_col: str,
    partition_col: str,
    text_col: str = "text",
) -> dict:
    """Apply one batch; returns stage counts. Survivor = smallest id
    per new fingerprint (deterministic under replay)."""
    spark = batch.sparkSession
    fp = batch.withColumn("__fp", _fingerprint(text_col))
    # within-batch: one row per fingerprint, smallest id wins
    pick = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    in_batch = fp.join(pick, [id_col, "__fp"], "left_semi")
    # cross-corpus: drop fingerprints the index already holds
    if _index_exists(spark, index_path):
        seen = spark.read.parquet(index_path).select("__fp")
        fresh = in_batch.join(seen, "__fp", "left_anti")
    else:
        fresh = in_batch
    # the anti-join output feeds BOTH the table upsert and the index
    # append — materialize the churn-bounded survivors once
    fresh = fresh.localCheckpoint(eager=True)
    n_in = batch.count()
    n_fresh = fresh.count()
    if n_fresh:
        from ua2sql_spark.operators.snapshot import upsert_cow

        # TABLE FIRST (see module docstring crash-ordering contract)
        version, _rows = upsert_cow(
            fresh.drop("__fp"), table_path, [id_col], partition_col
        )
        fresh.select("__fp", F.col(id_col).alias("survivor_id")).write.mode(
            "append"
        ).parquet(index_path)
    else:
        version = None
    return {"n_in": n_in, "n_fresh": n_fresh, "version": version}


def dedup_ingest_sink(
    table_path: str,
    index_path: str,
    id_col: str,
    partition_col: str,
    text_col: str = "text",
):
    """``foreachBatch`` closure over :func:`dedup_ingest_batch` — wire
    it to any stream: ``stream.writeStream.foreachBatch(sink)``."""

    def _sink(df: DataFrame, epoch_id: int) -> None:
        dedup_ingest_batch(
            df, table_path, index_path, id_col, partition_col, text_col
        )

    return _sink


def tombstone_sink(table_path: str, key_col: str, partition_col: str):
    """``foreachBatch`` closure turning a stream of tombstones (rows
    carrying ``key_col`` values to forget) into :func:`delete_cow`
    commits — the streaming half of the compliance path: a deletion-
    request topic drains continuously into versioned erasure commits,
    and every downstream CDF consumer (SCD2, IVM, cursors) observes
    them as delete events. Replay-safe: deleting an already-deleted
    key matches nothing and commits nothing.

    The tombstone keys flow into :func:`delete_cow` as a DataFrame
    (semi-join deletion), never as a driver-collected ``isin`` literal:
    a backfilled deletion topic delivering millions of keys in one
    micro-batch stays executor-side (ADVICE r8 low)."""

    def _sink(df: DataFrame, epoch_id: int) -> None:
        from ua2sql_spark.operators.snapshot import delete_cow

        keys = df.select(key_col).distinct()
        if keys.limit(1).count() > 0:
            delete_cow(
                df.sparkSession,
                table_path,
                keys,
                partition_col,
                key_cols=[key_col],
            )

    return _sink
