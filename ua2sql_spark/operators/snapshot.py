"""Copy-on-write snapshots over plain-parquet tables: versioned file
manifests give time-travel reads, version diffs, and torn-read-free
readers without adopting a table format — the minimal slice of what
Delta/Iceberg keep in their transaction log, built from the pieces this
engine already has (file manifests ``operators/manifest.py``, the
partition-scoped merge ``operators/merge.py``, VACUUM
``operators/layout.py``).

Reference provenance: extends the reference's append/backup sinks
(ua2sql.py:274-295 checkpoint-after-commit single-writer model) with
the versioned-read capability a 100 TB curation pipeline needs —
"which exact file set trained run N" is a snapshot version, not a hope.

Design:

* A snapshot is a parquet manifest under ``<table>/_snapshots/v{N}``:
  one row per live data file (file path, partition value, row count).
  The leading underscore keeps every Spark/DuckDB reader from ever
  globbing it as data.
* ``upsert_cow`` is the copy-on-write twin of ``merge.upsert_parquet``:
  identical MERGE semantics (batch replaces key-matches, carries the
  rest, bounded touched-partition list), but rewritten partitions are
  written as NEW uniquely-named files in APPEND mode — nothing is
  deleted — and the new manifest is (prior manifest minus touched
  partitions) + the new files. Prior versions stay readable.
* The COMMIT POINT is the atomic filesystem rename of the staged
  manifest directory to its final ``v{N}`` name: a crash before the
  rename leaves only unreferenced data files (harmless; vacuum sweeps
  them), never a half-visible version.
* Readers (``read_snapshot``) resolve a version's file list from its
  manifest and read exactly those files with ``basePath`` set — no
  directory listing of the table, so a reader is never torn by a
  concurrent writer appending files (single WRITER, as merge.py).
* Retention: old versions' files are invisible to the LATEST manifest,
  so ``vacuum_orphans`` against the latest manifest would end time
  travel (exactly Delta VACUUM's contract). To keep N versions, pass
  ``live_files_union`` — the union of all retained snapshots' files —
  as the vacuum manifest.

Scale shape: the manifest is file-count-bounded (not data-bounded); the
upsert's data plane is identical to merge.py (touched partitions only,
one anti-join); carrying untouched partitions forward is a
manifest-only operation that never touches the filesystem; the
before/after file diff lists ONLY the touched partition directories.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ua2sql_spark.operators.merge import _partition_dir_name

_SNAP_DIR = "_snapshots"
# {:06d} is a zero-pad MINIMUM: version 1_000_000 renders as "v1000000"
# (7 digits), so the match must be \d{6,} or that version becomes
# invisible to list_versions and the single writer wedges re-targeting it.
_VER_RE = re.compile(r"^v(\d{6,})$")

_MANIFEST_SCHEMA = "file string, partition string, row_count bigint"


def _jfs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return jvm, fs, p


def _snap_root(path: str) -> str:
    return f"{path}/{_SNAP_DIR}"


def snapshot_path(path: str, version: int) -> str:
    return f"{_snap_root(path)}/v{version:06d}"


def list_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed snapshot versions, ascending. A version exists iff its
    directory has been atomically renamed into place (staged ``.tmp-*``
    directories are by construction never matched)."""
    jvm, fs, _ = _jfs(spark, path)
    root = jvm.org.apache.hadoop.fs.Path(_snap_root(path))
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        m = _VER_RE.match(st.getPath().getName())
        if m and st.isDirectory():
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(spark: SparkSession, path: str) -> int | None:
    vs = list_versions(spark, path)
    return vs[-1] if vs else None


def read_manifest(spark: SparkSession, path: str, version: int) -> DataFrame:
    return spark.read.parquet(snapshot_path(path, version))


def _read_manifest_files(
    spark: SparkSession, files: list[str], merge_schema: bool = False
) -> DataFrame:
    """Read manifest-listed data files GROUPED BY their owning table
    root (every manifest entry is ``<root>/<partition_dir>/<name>``):
    each group gets its own ``basePath`` so hive partition columns are
    inferred, which lets a SHALLOW CLONE's foreign files — still living
    under the SOURCE table's directory — read exactly like local ones.
    For an un-cloned table there is one group and the plan is identical
    to the previous single ``basePath`` read (plan-pins unaffected)."""
    import os

    groups: dict[str, list[str]] = {}
    for f in files:
        groups.setdefault(os.path.dirname(os.path.dirname(f)), []).append(f)
    out = None
    for root in sorted(groups):
        reader = spark.read.option("basePath", root)
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        part = reader.parquet(*sorted(groups[root]))
        out = (
            part
            if out is None
            else out.unionByName(part, allowMissingColumns=merge_schema)
        )
    return out


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | str | None = None,
    merge_schema: bool = False,
    where: tuple | None = None,
) -> DataFrame:
    """The table as of ``version`` (default: latest). Reads exactly the
    manifest's files — never lists the table directory, so concurrent
    appends by the single writer are invisible until their commit.
    ``merge_schema=True`` unions file schemas across versions'
    surviving files (older files' missing columns read as NULL) — the
    schema-evolution read for tables whose upserts added columns.

    ``where=(col, lo, hi[, cast])`` is versioned DATA SKIPPING: when the
    version carries committed file stats (``upsert_cow(stats_cols=...)``)
    the read opens only files whose [min, max] on ``col`` can overlap —
    time travel AND pruning from the same commit (Delta/Iceberg keep
    these stats in the log; here they ride the manifest dir). Files the
    stats never covered (pre-stats versions' carried files) are KEPT
    conservatively, and the predicate is always re-applied exactly, so
    results are identical with and without stats."""
    if version is None or isinstance(version, str):
        # a string version is a TAG name (``tag_snapshot``)
        version = _resolve_version(spark, path, version)
    files = [
        r["file"] for r in read_manifest(spark, path, version).select("file").collect()
    ]
    if not files:
        raise ValueError(f"snapshot v{version} of {path} is empty")
    pred = None
    if where is not None:
        col, lo, hi = where[0], where[1], where[2]
        cast = where[3] if len(where) > 3 else "bigint"
        pred = F.col(col).between(F.lit(lo), F.lit(hi))
        stats = snapshot_stats(spark, path, version)
        if stats is not None:
            from ua2sql_spark.operators.manifest import prune_files

            kept = prune_files(stats, col, lo, hi, cast=cast)
            if kept is not None:
                # "covered" must be judged PER COLUMN: a file whose
                # stats rows describe only OTHER columns (stats_cols
                # varied across the versions that wrote it) has no
                # [min,max] for `col` and must be conservatively kept —
                # the whole-file set would silently drop its rows
                # (ADVICE r8 high).
                covered = {
                    r["file"]
                    for r in stats.filter(F.col("col") == col)
                    .select("file")
                    .distinct()
                    .collect()
                }
                files = sorted(set(kept) | (set(files) - covered))
                if not files:
                    # Zero overlap: derive the empty frame from the SAME
                    # reader path as a non-empty read (basePath +
                    # mergeSchema honored) so partition-column type
                    # inference and the merged schema match the
                    # non-empty result exactly (ADVICE r8 low — the
                    # sidecar StructType can disagree with
                    # directory-name inference). But NOT over the full
                    # file list: with mergeSchema that is a footer
                    # sweep over every live file (millions at 100 TB)
                    # just to return a guaranteed-empty frame (ADVICE
                    # r9 #3). ONE file per partition dir suffices
                    # exactly: a partition's live files are always
                    # written by the single commit that last rewrote it
                    # (CoW rewrites whole partitions), so per-partition
                    # representatives cover every schema generation AND
                    # every partition-dir value the type inference
                    # unions over. Sorted min-per-partition also keeps
                    # the first file identical to the sorted full list,
                    # so the mergeSchema=False branch reads the same
                    # footer it would have. The filter(false) collapses
                    # to an empty LocalRelation at optimization time,
                    # so no data file is scanned.
                    files = sorted(
                        r["f"]
                        for r in read_manifest(spark, path, version)
                        .groupBy("partition")
                        .agg(F.min("file").alias("f"))
                        .collect()
                    )
                    return _read_manifest_files(
                        spark, files, merge_schema
                    ).filter(F.lit(False))
    out = _read_manifest_files(spark, files, merge_schema)
    return out.filter(pred) if pred is not None else out


def snapshot_diff(
    spark: SparkSession, path: str, v_old: int, v_new: int
) -> dict[str, list[str]]:
    """Files added/removed between two versions — the audit answer to
    "what changed between training run A and B". Driver-side but
    file-count-bounded."""
    old = {r["file"] for r in read_manifest(spark, path, v_old).collect()}
    new = {r["file"] for r in read_manifest(spark, path, v_new).collect()}
    return {"added": sorted(new - old), "removed": sorted(old - new)}


def delete_versions_before(spark: SparkSession, path: str, keep_from: int) -> list[int]:
    """Retention shortening: drop the manifest dirs of every version
    below ``keep_from`` (time travel to them ends), so a following
    ``vacuum_orphans(live_files_union(...))`` reclaims the files only
    they referenced — the Delta ``logRetentionDuration`` + VACUUM
    sequence, and the hard-erasure tail of a compliance
    :func:`delete_cow`. Returns the versions removed."""
    versions = list_versions(spark, path)
    if not versions or keep_from > versions[-1]:
        raise ValueError(
            f"keep_from={keep_from} would drop every version of {path} "
            f"(latest is {versions[-1] if versions else None})"
        )
    # Tags are retention pins (Delta/Iceberg tag semantics): a tagged
    # version cannot be silently aged out — delete the tag first.
    pinned = {
        f"{name} -> v{v}"
        for name, v in list_tags(spark, path).items()
        if v < keep_from
    }
    if pinned:
        raise ValueError(
            f"retention would drop tagged version(s) of {path}: "
            f"{sorted(pinned)}; delete_tag first"
        )
    jvm, fs, _ = _jfs(spark, path)
    dropped = []
    for v in versions:
        if v < keep_from:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(snapshot_path(path, v)), True
            )
            dropped.append(v)
    return dropped


def live_files_union(
    spark: SparkSession,
    path: str,
    include_clones: bool = True,
    _visited: frozenset | None = None,
) -> DataFrame:
    """Union of every retained snapshot's file list — pass as the
    ``manifest`` to ``layout.vacuum_orphans`` to sweep only files no
    retained version references (delete old snapshot manifests first to
    shorten retention, exactly Delta's VACUUM knob).

    Clone safety is the DEFAULT (VERDICT r11 #3): shallow clones
    registered on this table (``clone_snapshot`` writes the sidecar at
    clone time) contribute their live sets too — recursively, so
    clones-of-clones are covered — and a registered clone that cannot
    be read raises instead of being silently skipped, because skipping
    it would let vacuum delete files the clone still references.
    ``unregister_clone`` retires a deleted clone; source-only vacuum is
    the explicit opt-in ``include_clones=False``.

    The recursion carries a visited-path set (ADVICE r12 #4): the API
    cannot create a cycle (``clone_snapshot`` requires a fresh dst),
    but a hand-edited or corrupted ``_clones.json`` (self-registration,
    A↔B) must surface as a named diagnostic on the vacuum path, not an
    unbounded ``RecursionError``. Detection is by exact path STRING —
    the registry stores the strings passed to ``clone_snapshot``, so
    two spellings of one directory are the registry's corruption to
    fix, not this guard's."""
    seen = (_visited or frozenset()) | {path}
    versions = list_versions(spark, path)
    if not versions:
        raise ValueError(f"no snapshots under {path}")
    df = None
    for v in versions:
        part = read_manifest(spark, path, v).select("file")
        df = part if df is None else df.unionByName(part)
    if include_clones:
        for c in list_clones(spark, path):
            if c in seen:
                raise ValueError(
                    f"clone registry cycle: {c!r} is registered under "
                    f"{path!r} but is already on the recursion path "
                    f"{sorted(seen)}; _clones.json is corrupted — "
                    "unregister_clone() the bogus entry"
                )
            try:
                df = df.unionByName(live_files_union(spark, c, _visited=seen))
            except ValueError as e:
                if "clone registry cycle" in str(e):
                    raise
                raise ValueError(
                    f"registered clone {c!r} of {path!r} is unreadable "
                    f"({e}); if the clone was deleted, unregister_clone() "
                    "it — vacuuming without its live set would delete "
                    "files it may still reference"
                ) from e
    return df.distinct()


def _list_partition_files(
    spark: SparkSession, path: str, dir_names: list[str]
) -> dict[str, tuple[str, int]]:
    """file -> (partition dir name, size) for ONLY the given partition
    DIRECTORY names (never the table root). Callers holding raw values
    escape them via ``_partition_dir_name`` first; callers holding
    manifest ``partition`` entries pass them verbatim — they are already
    escaped dir names, and re-escaping would look up a directory that
    does not exist (the round-6 compaction data-loss bug). Keys are
    fully-qualified Hadoop paths (``Path.toString()``) so manifests work
    on any filesystem, not just the default one."""
    jvm, fs, _ = _jfs(spark, path)
    out: dict[str, tuple[str, int]] = {}
    for dname in dir_names:
        p = jvm.org.apache.hadoop.fs.Path(path, dname)
        if not fs.exists(p):
            continue
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isFile() and not name.startswith(("_", ".")):
                out[st.getPath().toString()] = (dname, st.getLen())
    return out


def _manifest_rows_with_counts(
    spark: SparkSession, files: list[tuple[str, str]]
) -> list[tuple[str, str, int | None]]:
    """Attach exact per-file row counts to (file, partition) pairs via
    ONE distributed footer pass (``manifest.file_row_counts`` — the
    Delta ``numRecords`` stat). Every committer records them, so
    ``snapshot_layout_health``'s ``n_rows`` is real instead of NULL and
    carried manifest entries propagate the counts forward for free.
    Cost: one job over the files THIS commit wrote (churn-bounded,
    metadata pages only)."""
    from ua2sql_spark.operators.manifest import file_row_counts

    counts = file_row_counts(spark, [f for f, _p in files])
    return [(f, part, counts.get(f)) for f, part in files]


def bootstrap_snapshot(
    spark: SparkSession, path: str, partition_col: str
) -> int:
    """v0 for a pre-existing hive-partitioned table: one root listing
    plus one DISTRIBUTED footer pass for per-file row counts (both paid
    ONCE, at adoption time — every later version lists only the
    partitions it touches and carries the counts forward)."""
    if latest_version(spark, path) is not None:
        raise ValueError(f"{path} already has snapshots")
    jvm, fs, root = _jfs(spark, path)
    pairs = []
    it = fs.listFiles(root, True)
    prefix = f"/{_SNAP_DIR}/"
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        name = p.getName()
        if name.startswith(("_", ".")) or prefix in p.toUri().getPath():
            continue
        part = p.getParent().getName()
        if not part.startswith(f"{partition_col}="):
            continue
        # fully-qualified (scheme+authority kept): manifests must be
        # readable on non-default filesystems (s3a:// at 100 TB), and
        # vacuum_orphans normalizes both forms identically
        pairs.append((p.toString(), part))
    rows = _manifest_rows_with_counts(spark, pairs)
    return _commit_manifest(
        spark, path, 0, rows, operation="BOOTSTRAP",
        op_metrics={"n_adopted_files": len(rows)},
    )


def _commit_manifest(
    spark: SparkSession,
    path: str,
    version: int,
    rows: list[tuple],
    table_schema=None,
    stats_df: DataFrame | None = None,
    constraints: dict[str, str] | None = None,
    operation: str | None = None,
    op_metrics: dict | None = None,
) -> int:
    """Write the manifest to a staged directory, then atomically rename
    it to v{N} — THE commit point. ``table_schema`` (a StructType, when
    the committer knows it) rides along as an underscore-prefixed JSON
    sidecar inside the manifest dir — parquet readers ignore it, and it
    gives later upserts the table's FULL logical schema without a
    footer sweep over every live file (100 TB tables have millions).

    ``constraints`` (name -> SQL predicate) persists the table's CHECK
    invariants as another sidecar. ``None`` means "carry the previous
    latest version's constraints unchanged" — so metadata-oblivious
    commits (delete, compact, rollback, cluster) can never silently
    drop the table's invariants; pass a dict (possibly empty) to set
    the constraint set explicitly."""
    import json as _json
    import uuid

    jvm, fs, _ = _jfs(spark, path)
    if constraints is None and version > 0:
        prev = latest_version(spark, path)
        if prev is not None:
            constraints = table_constraints(spark, path, prev)
    staged = f"{_snap_root(path)}/.tmp-{uuid.uuid4().hex}"
    spark.createDataFrame(rows, _MANIFEST_SCHEMA).coalesce(1).write.parquet(staged)
    if stats_df is not None:
        # per-file column stats ride an underscore-prefixed SUBDIR
        # (ignored by the manifest's parquet read) inside the same
        # staged dir, so the rename commits manifest + schema + stats
        # as one atom; written distributed — |files|x|cols| rows never
        # pass through the driver
        stats_df.write.parquet(f"{staged}/{_STATS_DIR}")
    if table_schema is not None:
        sidecar = jvm.org.apache.hadoop.fs.Path(staged, _SCHEMA_SIDECAR)
        out = fs.create(sidecar, True)
        try:
            out.write(bytearray(table_schema.json().encode("utf-8")))
        finally:
            out.close()
    if constraints:
        csc = jvm.org.apache.hadoop.fs.Path(staged, _CONSTRAINTS_SIDECAR)
        out = fs.create(csc, True)
        try:
            out.write(
                bytearray(
                    _json.dumps(constraints, sort_keys=True).encode("utf-8")
                )
            )
        finally:
            out.close()
    if operation is not None:
        import datetime as _dt

        info = {
            "operation": operation,
            "timestamp": _dt.datetime.now(_dt.timezone.utc).isoformat(),
            "n_files": len(rows),
            "metrics": {k: str(v) for k, v in (op_metrics or {}).items()},
        }
        isc = jvm.org.apache.hadoop.fs.Path(staged, _COMMIT_INFO_SIDECAR)
        out = fs.create(isc, True)
        try:
            out.write(
                bytearray(_json.dumps(info, sort_keys=True).encode("utf-8"))
            )
        finally:
            out.close()
    final = jvm.org.apache.hadoop.fs.Path(snapshot_path(path, version))
    fs.mkdirs(final.getParent())
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(staged), final):
        raise RuntimeError(
            f"snapshot commit rename failed for v{version} of {path} "
            "(concurrent writer?)"
        )
    return version


_SCHEMA_SIDECAR = "_table_schema.json"
_STATS_DIR = "_stats"
_CONSTRAINTS_SIDECAR = "_constraints.json"
_COMMIT_INFO_SIDECAR = "_commit_info.json"


def describe_history(spark: SparkSession, path: str) -> list[dict]:
    """Delta's DESCRIBE HISTORY: one dict per retained version,
    newest first — version, operation, UTC timestamp, file count, and
    the committing operation's metrics (rows upserted/deleted, restore
    target, ...). Versions committed before operation tagging existed
    report operation 'UNKNOWN'. Driver-side but bounded by the retained
    version count (manifest dirs, not data files)."""
    import json as _json

    jvm, fs, _ = _jfs(spark, path)
    out = []
    for v in reversed(list_versions(spark, path)):
        raw = _read_sidecar_text(
            jvm, fs, snapshot_path(path, v), _COMMIT_INFO_SIDECAR
        )
        if raw:
            info = _json.loads(raw)
        else:
            info = {"operation": "UNKNOWN", "timestamp": None,
                    "n_files": None, "metrics": {}}
        info["version"] = v
        out.append(info)
    return out


class ConstraintViolation(ValueError):
    """A batch violated the table's CHECK constraints; nothing committed."""

    def __init__(self, path: str, violations: dict[str, tuple[int, str]]):
        self.violations = violations
        detail = "; ".join(
            f"{name}: {n} row(s) violate `{sql}`"
            for name, (n, sql) in sorted(violations.items())
        )
        super().__init__(f"CHECK constraint violation on {path}: {detail}")


def _read_sidecar_text(jvm, fs, dir_path: str, name: str) -> str | None:
    p = jvm.org.apache.hadoop.fs.Path(dir_path, name)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        data = []
        while True:
            b = stream.read()
            if b < 0:
                break
            data.append(b)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def table_constraints(
    spark: SparkSession, path: str, version: int | None = None
) -> dict[str, str]:
    """The CHECK constraints (name -> SQL predicate) committed with
    ``version`` (default: latest). Empty dict for tables/versions
    without constraints."""
    import json as _json

    if version is None:
        version = latest_version(spark, path)
        if version is None:
            return {}
    jvm, fs, _ = _jfs(spark, path)
    raw = _read_sidecar_text(
        jvm, fs, snapshot_path(path, version), _CONSTRAINTS_SIDECAR
    )
    return _json.loads(raw) if raw else {}


def _enforce_constraints(
    batch: DataFrame, path: str, constraints: dict[str, str]
) -> None:
    """One aggregate job counting violations of every constraint over
    the incoming batch; raises :class:`ConstraintViolation` listing
    each violated constraint with its row count. SQL CHECK semantics:
    a row violates only when the predicate evaluates FALSE — NULL
    (unknown) passes, exactly like the standard and Delta."""
    names = sorted(constraints)
    aggs = [
        F.sum(
            F.when(~F.expr(constraints[name]), 1).otherwise(0)
        ).alias(f"__c{i}")
        for i, name in enumerate(names)
    ]
    row = batch.agg(*aggs).first()
    violations = {
        name: (int(row[f"__c{i}"]), constraints[name])
        for i, name in enumerate(names)
        if row[f"__c{i}"]
    }
    if violations:
        raise ConstraintViolation(path, violations)


def drop_constraint(spark: SparkSession, path: str, name: str) -> int:
    """Remove one CHECK constraint via a metadata-only commit: a new
    version with the SAME file manifest (zero data movement, rollback's
    shape) whose constraint sidecar omits ``name``. Raises KeyError if
    the constraint doesn't exist on the latest version."""
    prev = latest_version(spark, path)
    if prev is None:
        raise ValueError(f"no snapshots under {path}")
    cons = table_constraints(spark, path, prev)
    if name not in cons:
        raise KeyError(
            f"constraint {name!r} not on {path} (has {sorted(cons)})"
        )
    del cons[name]
    rows = [
        (r["file"], r["partition"], r["row_count"])
        for r in read_manifest(spark, path, prev).collect()
    ]
    prev_stats = snapshot_stats(spark, path, prev)
    return _commit_manifest(
        spark,
        path,
        prev + 1,
        rows,
        table_schema=table_schema(spark, path, prev),
        stats_df=prev_stats,
        constraints=cons,
        operation="DROP_CONSTRAINT",
        op_metrics={"constraint": name},
    )


def snapshot_stats(spark: SparkSession, path: str, version: int) -> DataFrame | None:
    """The committed per-file column stats of ``version`` (schema =
    ``operators/manifest._MANIFEST_SCHEMA``), or None when the version
    was committed without ``stats_cols``."""
    jvm, fs, _ = _jfs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(snapshot_path(path, version), _STATS_DIR)
    if not fs.exists(p):
        return None
    return spark.read.parquet(p.toString())


def table_schema(spark: SparkSession, path: str, version: int):
    """The committed logical schema of ``version`` (StructType), or
    None for manifests written before the sidecar existed."""
    from pyspark.sql.types import StructType

    jvm, fs, _ = _jfs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(snapshot_path(path, version), _SCHEMA_SIDECAR)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        data = []
        while True:
            b = stream.read()
            if b < 0:
                break
            data.append(b)
    finally:
        stream.close()
    return StructType.fromJson(
        __import__("json").loads(bytes(data).decode("utf-8"))
    )


def _table_columns(spark: SparkSession, path: str, version: int) -> list[str]:
    """Column set of the committed version: sidecar when present, else
    a mergeSchema read across the version's live files (pre-sidecar
    tables only — pays footer reads once, and the next commit writes
    the sidecar)."""
    sch = table_schema(spark, path, version)
    if sch is not None:
        return list(sch.names)
    return read_snapshot(spark, path, version, merge_schema=True).columns


def upsert_cow(
    batch: DataFrame,
    path: str,
    key_cols: list[str],
    partition_col: str,
    max_touched_partitions: int = 10_000,
    stats_cols: list[str] | None = None,
    constraints: dict[str, str] | None = None,
) -> tuple[int, int]:
    """Copy-on-write MERGE: same semantics and partition-stability
    precondition as ``merge.upsert_parquet`` (key-matched target rows
    replaced, others carried, only touched partitions rewritten), but
    non-destructive — rewritten partitions land as NEW files, the new
    manifest version points at them, and every prior version stays
    readable until vacuumed. Returns (new_version, rows_written).

    ``constraints`` adds Delta-style CHECK invariants (name -> SQL
    predicate over the table's columns). The commit's EFFECTIVE set is
    the table's persisted constraints updated with this dict; every
    incoming batch row must satisfy all of them (FALSE = violation,
    NULL passes, per SQL CHECK) or the whole commit aborts with
    :class:`ConstraintViolation` before anything is written. The set
    persists in the manifest sidecar and is enforced on every later
    upsert automatically; ``drop_constraint`` removes one."""
    spark = batch.sparkSession
    batch = batch.dropDuplicates(key_cols)

    prev_for_cons = latest_version(spark, path)
    persisted_cons = (
        table_constraints(spark, path, prev_for_cons)
        if prev_for_cons is not None
        else {}
    )
    # ADD CONSTRAINT semantics (ADVICE r9 #1): a constraint that is new
    # (or whose predicate changed) on a NON-EMPTY table must hold for
    # the rows already stored, not just the incoming batch — otherwise
    # table_constraints() advertises an invariant the data violates.
    # Delta scans existing data before accepting ADD CONSTRAINT; so do
    # we: one aggregate job over the latest snapshot, checking ONLY the
    # added/changed constraints (existing rows satisfy the persisted
    # set by induction — every prior commit enforced it).
    added_cons = {
        n: p
        for n, p in (constraints or {}).items()
        if persisted_cons.get(n) != p
    }
    if added_cons and prev_for_cons is not None:
        existing = read_snapshot(spark, path, prev_for_cons, merge_schema=True)
        # A constraint may reference a column this batch INTRODUCES —
        # stored rows don't have it in any file, so surface it as NULL
        # (NULL passes CHECK, per SQL) instead of failing analysis.
        missing = [c for c in batch.columns if c not in existing.columns]
        if missing:
            bt = dict(batch.dtypes)
            existing = existing.select(
                "*", *[F.lit(None).cast(bt[c]).alias(c) for c in missing]
            )
        _enforce_constraints(existing, path, added_cons)
    effective_cons = dict(persisted_cons)
    effective_cons.update(constraints or {})
    if effective_cons:
        _enforce_constraints(batch, path, effective_cons)

    touched = [
        r[0]
        for r in batch.select(partition_col)
        .distinct()
        .limit(max_touched_partitions + 1)
        .collect()
    ]
    if len(touched) > max_touched_partitions:
        raise ValueError(
            f"batch touches more than {max_touched_partitions} partitions; "
            "partition the upsert batches or raise the bound"
        )

    prev = latest_version(spark, path)
    if prev is not None:
        # A batch MISSING columns the table has must fail loudly — and
        # against the FULL committed schema, not just the touched
        # partitions' slice: a batch touching only brand-new partitions
        # (live_touched empty) used to bypass the guard and commit the
        # exact heterogeneous table the contract rejects (ADVICE r7 #3).
        dropped = set(_table_columns(spark, path, prev)) - set(batch.columns)
        if dropped:
            raise ValueError(
                f"batch is missing target columns {sorted(dropped)}; "
                "add them to the batch (NULLs are fine) or drop them "
                "from the table explicitly"
            )
        manifest = read_manifest(spark, path, prev)
        touched_dirs = {
            _partition_dir_name(spark, partition_col, v) for v in touched
        }
        # the version's OWN view of the touched partitions (not the
        # directory's, which may hold other versions' files)
        live_touched = [
            r["file"]
            for r in manifest.filter(F.col("partition").isin(list(touched_dirs)))
            .select("file")
            .collect()
        ]
        carried_manifest = [
            (r["file"], r["partition"], r["row_count"])
            for r in manifest.filter(
                ~F.col("partition").isin(list(touched_dirs))
            ).collect()
        ]
        if live_touched:
            slice_df = _read_manifest_files(spark, live_touched)
            cond = None
            for k in key_cols:
                c = F.col(f"t.{k}").eqNullSafe(F.col(f"b.{k}"))
                cond = c if cond is None else cond & c
            # schema evolution: a batch may ADD columns the target's
            # older files lack — carried rows read those as NULL (the
            # batch's dtype), so the touched partition's rewrite lands
            # in the evolved schema; untouched partitions keep their
            # old files and evolve lazily on their next touch
            # (read_snapshot(merge_schema=True) reads across both).
            slice_cols = set(slice_df.columns)
            bt = dict(batch.dtypes)
            proj = [
                F.col(f"t.{c}") if c in slice_cols
                else F.lit(None).cast(bt[c]).alias(c)
                for c in batch.columns
            ]
            carried = (
                slice_df.alias("t")
                .join(batch.alias("b"), cond, "left_anti")
                .select(*proj)
            )
            out = batch.select(*batch.columns).unionByName(carried)
        else:
            out = batch
    else:
        carried_manifest = []
        out = batch
        # adopting an existing non-snapshot table silently would ignore
        # its rows; force an explicit bootstrap instead
        jvm, fs, root = _jfs(spark, path)
        if fs.exists(root):
            raise ValueError(
                f"{path} exists without snapshots; run bootstrap_snapshot first"
            )

    from pyspark.sql import Observation

    obs = Observation("upsert_cow_rows")
    out = out.observe(obs, F.count(F.lit(1)).alias("rows"))

    touched_dir_names = [
        _partition_dir_name(spark, partition_col, v) for v in touched
    ]
    before = _list_partition_files(spark, path, touched_dir_names)
    out.write.mode("append").partitionBy(partition_col).parquet(path)
    after = _list_partition_files(spark, path, touched_dir_names)
    new_files = _manifest_rows_with_counts(
        spark, [(f, part) for f, (part, _sz) in after.items() if f not in before]
    )

    version = (prev if prev is not None else -1) + 1
    stats_df = None
    if stats_cols:
        # churn-bounded: footer-read ONLY the files this commit wrote;
        # carried files keep their previous version's stats rows (files
        # never covered by stats stay prunable-never, read-always)
        from ua2sql_spark.operators.manifest import file_stats

        stats_df = file_stats(spark, [f for f, _p, _rc in new_files], stats_cols)
        if prev is not None:
            prev_stats = snapshot_stats(spark, path, prev)
            if prev_stats is not None and carried_manifest:
                carried_set = {f for f, _p, _rc in carried_manifest}
                stats_df = stats_df.unionByName(
                    prev_stats.filter(F.col("file").isin(list(carried_set)))
                )
    rows_written = int(obs.get["rows"])
    _commit_manifest(
        spark,
        path,
        version,
        carried_manifest + new_files,
        table_schema=out.schema,
        stats_df=stats_df,
        constraints=effective_cons,
        operation="UPSERT",
        op_metrics={"rows_written": rows_written,
                    "files_added": len(new_files)},
    )
    return version, rows_written


def delete_cow(
    spark: SparkSession,
    path: str,
    condition,
    partition_col: str,
    max_touched_partitions: int = 10_000,
    key_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Row-level copy-on-write DELETE — the compliance path
    (right-to-be-forgotten) an upsert-only store cannot express.
    ``condition`` is a Column predicate over the table's columns; rows
    where it is TRUE are deleted (NULL keeps, per SQL DELETE).

    ``condition`` may instead be a DataFrame of keys (with ``key_cols``
    naming the join columns): matching rows are found by semi-join and
    survivors by anti-join, so an arbitrarily large deletion batch (a
    backfilled tombstone topic) never round-trips through the driver as
    an ``isin`` literal (ADVICE r8 low). The keys are deduplicated and
    localCheckpoint-ed once — they are consumed by three passes.

    Same partition-granular CoW discipline as :func:`upsert_cow`: only
    partitions CONTAINING matches are rewritten (minus the matching
    rows), everything else is carried by manifest reference, the new
    manifest rename is the commit point, and a partition whose every
    row matched simply writes no file — its deletion is the absence of
    a manifest entry. ``snapshot_changes`` across the commit yields
    the deleted rows as ``delete`` change events, so SCD2 folds, IVM
    refreshes, and cursor consumers all observe the erasure.

    COMPLIANCE NOTE: prior versions still reference the old files —
    time travel is the POINT of the store. Hard erasure = this commit
    followed by dropping the pre-delete manifests and vacuuming
    (``live_files_union`` + ``layout.vacuum_orphans``), exactly Delta's
    DELETE-then-VACUUM sequence.

    Returns (new_version, rows_deleted); no version commits when
    nothing matches. Stats/schema sidecars propagate: rewritten files
    get fresh stats, carried files keep theirs."""
    prev = latest_version(spark, path)
    if prev is None:
        raise ValueError(f"no snapshots under {path}")
    snap = read_snapshot(spark, path, prev)
    if isinstance(condition, DataFrame):
        if not key_cols:
            raise ValueError("key_cols is required when condition is a DataFrame")
        keys = condition.select(*key_cols).distinct().localCheckpoint(eager=True)

        def _matches(df: DataFrame) -> DataFrame:
            return df.join(keys, on=key_cols, how="left_semi")

        def _survivors(df: DataFrame) -> DataFrame:
            return df.join(keys, on=key_cols, how="left_anti")

    else:
        hit = F.coalesce(condition, F.lit(False))

        def _matches(df: DataFrame) -> DataFrame:
            return df.filter(hit)

        def _survivors(df: DataFrame) -> DataFrame:
            return df.filter(~hit)

    touched = [
        r[0]
        for r in _matches(snap)
        .select(partition_col)
        .distinct()
        .limit(max_touched_partitions + 1)
        .collect()
    ]
    if not touched:
        return prev, 0
    if len(touched) > max_touched_partitions:
        raise ValueError(
            f"delete touches more than {max_touched_partitions} partitions; "
            "split the predicate or raise the bound"
        )
    manifest = read_manifest(spark, path, prev)
    touched_dirs = {_partition_dir_name(spark, partition_col, v) for v in touched}
    live_touched = [
        r["file"]
        for r in manifest.filter(F.col("partition").isin(list(touched_dirs)))
        .select("file")
        .collect()
    ]
    carried_manifest = [
        (r["file"], r["partition"], r["row_count"])
        for r in manifest.filter(~F.col("partition").isin(list(touched_dirs))).collect()
    ]
    slice_df = _read_manifest_files(spark, live_touched)
    n_deleted = _matches(slice_df).count()  # churn-bounded second pass
    keep = _survivors(slice_df)

    before = _list_partition_files(spark, path, list(touched_dirs))
    keep.write.mode("append").partitionBy(partition_col).parquet(path)
    after = _list_partition_files(spark, path, list(touched_dirs))
    new_files = _manifest_rows_with_counts(
        spark, [(f, part) for f, (part, _sz) in after.items() if f not in before]
    )

    version = prev + 1
    stats_df = None
    prev_stats = snapshot_stats(spark, path, prev)
    if prev_stats is not None:
        from ua2sql_spark.operators.manifest import file_stats

        cols = [r["col"] for r in prev_stats.select("col").distinct().collect()]
        carried_set = [f for f, _p, _rc in carried_manifest]
        stats_df = file_stats(
            spark, [f for f, _p, _rc in new_files], cols
        ).unionByName(prev_stats.filter(F.col("file").isin(carried_set)))
    _commit_manifest(
        spark,
        path,
        version,
        carried_manifest + new_files,
        table_schema=table_schema(spark, path, prev),
        stats_df=stats_df,
        operation="DELETE",
        op_metrics={"rows_deleted": n_deleted},
    )
    return version, n_deleted


def snapshot_upsert_sink(path: str, key_cols: list[str], partition_col: str):
    """``foreachBatch`` closure over :func:`upsert_cow` — the versioned
    twin of ``merge.parquet_upsert_sink``: every micro-batch commits one
    snapshot version, so the stream's table history is replayable and
    each training run can pin the exact version it read."""

    def _sink(df: DataFrame, epoch_id: int) -> None:
        upsert_cow(df, path, key_cols=key_cols, partition_col=partition_col)

    return _sink


def rollback(spark: SparkSession, path: str, to_version: int) -> int:
    """Restore the table to an earlier version by committing a NEW
    version whose manifest equals the old one — manifest-only, zero
    data movement (Delta's RESTORE). History stays intact: the bad
    versions remain inspectable until their files are vacuumed."""
    versions = list_versions(spark, path)
    if to_version not in versions:
        raise ValueError(f"version {to_version} not in {versions}")
    rows = [
        (r["file"], r["partition"], r["row_count"])
        for r in read_manifest(spark, path, to_version).collect()
    ]
    return _commit_manifest(
        spark,
        path,
        versions[-1] + 1,
        rows,
        table_schema=table_schema(spark, path, to_version),
        stats_df=snapshot_stats(spark, path, to_version),
        operation="RESTORE",
        op_metrics={"to_version": to_version},
    )


def snapshot_layout_health(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    small_file_bytes: int = 32 * 1024 * 1024,
    min_files: int = 2,
) -> DataFrame:
    """Per-partition layout health of a snapshot version — the
    compaction-decision number :func:`compact_snapshot` needs, in the
    same discipline as ``ivf_health_report`` (rebuild decision) and
    ``lsh_index_health`` (compaction trigger): measure first, rewrite
    only what the number says to. Reports, per partition:

    * ``n_files`` / ``n_rows`` — fragmentation as the manifest records
      it (micro-batch CoW upserts leave one file per touched partition
      per commit, so n_files ≈ commits-since-last-compaction);
      ``n_rows`` is exact for every file written since commits began
      recording footer counts, NULL only for legacy manifest entries
      that never carried one;
    * ``n_small_files`` / ``total_bytes`` — files under
      ``small_file_bytes`` (the scan-efficiency hazard: at 100 TB each
      file is a task + an open + a footer read) and the partition's
      on-disk size, from one driver-side metadata walk of exactly the
      manifest's files;
    * ``would_compact`` — whether ``compact_snapshot(min_files=...)``
      would rewrite this partition (n_files >= min_files, the SAME
      threshold semantics, so the report's rewrite bound agrees with
      what compaction actually does for any caller-chosen min_files —
      ADVICE r12 #2): SUM(would_compact) is the rewrite bound before
      paying it.

    Driver-side RPC cost is O(partition directories), not O(files):
    files are sized via ONE ``listStatus`` per parent directory
    (grouped from the manifest's fully-qualified paths — VERDICT r12
    #4; the previous per-file ``getFileStatus`` loop was hours at a
    10⁵–10⁶-file table), with a per-file fallback only for a file
    missing from its directory listing (a concurrently-vacuumed or
    hand-moved file — never a healthy table). No data files are read.
    Foreign (clone-referenced) files group under their own parent
    directories, so clones cost the same bound."""
    v = version if version is not None else latest_version(spark, path)
    if v is None:
        raise ValueError(f"no snapshots under {path}")
    manifest = read_manifest(spark, path, v)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    by_part: dict[str, list[tuple[str, int | None]]] = {}
    by_dir: dict[str, list[str]] = {}
    for r in manifest.collect():
        by_part.setdefault(r["partition"], []).append((r["file"], r["row_count"]))
        by_dir.setdefault(r["file"].rsplit("/", 1)[0], []).append(r["file"])
    sizes: dict[str, int] = {}
    for dname, fl in by_dir.items():
        dp = HPath(dname)
        fs = dp.getFileSystem(conf)
        listing = (
            {st.getPath().toString(): st.getLen() for st in fs.listStatus(dp)}
            if fs.exists(dp)
            else {}
        )
        for f in fl:
            sz = listing.get(f)
            if sz is None:
                sz = fs.getFileStatus(HPath(f)).getLen()
            sizes[f] = sz
    rows = []
    for part, files in sorted(by_part.items()):
        fsizes = [sizes[f] for f, _rc in files]
        known = [rc for _f, rc in files if rc is not None]
        rows.append(
            (
                part,
                len(files),
                int(sum(known)) if known else None,
                sum(1 for s in fsizes if s < small_file_bytes),
                int(sum(fsizes)),
                len(files) >= min_files,
            )
        )
    return spark.createDataFrame(
        rows,
        "partition string, n_files bigint, n_rows bigint, "
        "n_small_files bigint, total_bytes bigint, would_compact boolean",
    )


def compact_snapshot(
    spark: SparkSession,
    path: str,
    partition_col: str,
    min_files: int = 2,
    partitions: list[str] | None = None,
) -> tuple[int, list[str]]:
    """Compact fragmented partitions of the LATEST snapshot into one
    file each, committed as a new version — the maintenance pass that
    keeps per-version writes (each micro-batch upsert can leave several
    small files per touched partition) from decaying scan efficiency.
    Copy-on-write like everything here: old files stay until vacuumed,
    prior versions stay readable, the commit point is the manifest
    rename. Returns (new_version, compacted partition dir names).

    Scale shape: the manifest (file-count-bounded) picks the fragmented
    partitions driver-side; only THOSE partitions are read (by explicit
    file list, never a root listing) and rewritten with one task each
    (``repartition(partition_col)`` would shuffle everything — instead
    each partition's files coalesce independently).

    ``partitions`` (escaped dir names, e.g. the ``partition`` column of
    :func:`snapshot_layout_health`) restricts the rewrite to an
    explicit allowlist — the OPTIMIZE-WHERE verb that lets a caller
    compact exactly what the health report flagged (or only the
    partitions a maintenance window budgets for) instead of every
    fragmented partition at once."""
    prev = latest_version(spark, path)
    if prev is None:
        raise ValueError(f"no snapshots under {path}")
    manifest = read_manifest(spark, path, prev)
    grouped = manifest.groupBy("partition").agg(
        F.collect_list("file").alias("files")
    )
    if partitions is not None:
        grouped = grouped.filter(F.col("partition").isin(list(partitions)))
    frag = [
        (r["partition"], r["files"])
        for r in grouped.filter(F.size("files") >= min_files).collect()
    ]
    if not frag:
        return prev, []
    untouched = [
        (r["file"], r["partition"], r["row_count"])
        for r in manifest.filter(
            ~F.col("partition").isin([p for p, _ in frag])
        ).collect()
    ]
    # manifest `partition` entries ARE the escaped Hive dir names — use
    # them verbatim (splitting the value back out and re-escaping would
    # double-escape any value Hive escapes, listing a directory that
    # does not exist and silently dropping the partition's rows from
    # the new version)
    frag_dirs = [part for part, _files in frag]
    before = _list_partition_files(spark, path, frag_dirs)
    for part, files in frag:
        # one coalesced file per fragmented partition; the grouped read
        # keeps the partition column so partitionBy lands it back in
        # place (and re-homes a cloned partition's foreign files)
        (
            _read_manifest_files(spark, files)
            .coalesce(1)
            .write.mode("append")
            .partitionBy(partition_col)
            .parquet(path)
        )
    after = _list_partition_files(spark, path, frag_dirs)
    new_files = _manifest_rows_with_counts(
        spark, [(f, part) for f, (part, _sz) in after.items() if f not in before]
    )
    version = prev + 1
    stats_df = None
    prev_stats = snapshot_stats(spark, path, prev)
    if prev_stats is not None:
        # same columns as the previous version's stats, computed only
        # for the freshly-coalesced files; untouched files carry over
        from ua2sql_spark.operators.manifest import file_stats

        cols = [r["col"] for r in prev_stats.select("col").distinct().collect()]
        untouched_set = [f for f, _p, _rc in untouched]
        stats_df = file_stats(
            spark, [f for f, _p, _rc in new_files], cols
        ).unionByName(prev_stats.filter(F.col("file").isin(untouched_set)))
    _commit_manifest(
        spark,
        path,
        version,
        untouched + new_files,
        operation="OPTIMIZE_COMPACT",
        op_metrics={"files_written": len(new_files)},
        table_schema=table_schema(spark, path, prev),
        stats_df=stats_df,
    )
    return version, sorted(p for p, _ in frag)


def cluster_snapshot(
    spark: SparkSession,
    path: str,
    partition_col: str,
    zorder_cols: list[str],
    total_files: int = 32,
) -> int:
    """OPTIMIZE ZORDER for the snapshot store: rewrite the LATEST
    version's rows clustered on the Morton code of ``zorder_cols``
    (``layout.zorder_column``), committed as a new version with fresh
    per-file stats — the pairing that makes ``read_snapshot(where=...)``
    skip files for predicates on ANY interleaved column.

    One range exchange on (partition, z) + local sort, one partitioned
    write job, one manifest commit; no global sort. Copy-on-write like
    everything here: prior versions stay readable until vacuumed.
    Returns the new version."""
    from ua2sql_spark.operators.layout import zorder_column
    from ua2sql_spark.operators.manifest import file_stats

    prev = latest_version(spark, path)
    if prev is None:
        raise ValueError(f"no snapshots under {path}")
    manifest = read_manifest(spark, path, prev)
    part_dirs = [r["partition"] for r in manifest.select("partition").distinct().collect()]
    df = read_snapshot(spark, path, prev)
    out = (
        df.withColumn("__z", zorder_column(*zorder_cols))
        .repartitionByRange(total_files, F.col(partition_col), F.col("__z"))
        .sortWithinPartitions(partition_col, "__z")
        .drop("__z")
    )
    before = _list_partition_files(spark, path, part_dirs)
    out.write.mode("append").partitionBy(partition_col).parquet(path)
    after = _list_partition_files(spark, path, part_dirs)
    new_files = _manifest_rows_with_counts(
        spark, [(f, part) for f, (part, _sz) in after.items() if f not in before]
    )
    version = prev + 1
    # stats over the zorder columns are the entire point of the rewrite;
    # keep any previously-stats'd columns too
    prev_stats = snapshot_stats(spark, path, prev)
    cols = list(zorder_cols)
    if prev_stats is not None:
        cols = sorted(
            set(cols)
            | {r["col"] for r in prev_stats.select("col").distinct().collect()}
        )
    stats_df = file_stats(spark, [f for f, _p, _rc in new_files], cols)
    _commit_manifest(
        spark,
        path,
        version,
        new_files,
        operation="OPTIMIZE_ZORDER",
        op_metrics={"files_written": len(new_files)},
        table_schema=table_schema(spark, path, prev),
        stats_df=stats_df,
    )
    return version


def snapshot_changes(
    spark: SparkSession,
    path: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
) -> DataFrame:
    """Row-level change feed between two versions — the Delta CDF
    analog: one row per changed key with ``_change_type`` in
    ('insert', 'update_preimage', 'update_postimage', 'delete').
    Downstream consumers (index refresh, replication, audit) process
    deltas instead of re-reading the table.

    Scale shape: ``snapshot_diff`` narrows both sides to the files that
    CHANGED between the versions (manifest set difference — untouched
    partitions' shared files drop out before any data is read), then
    one full-outer key join of just those files' rows classifies each
    key. Cost is proportional to the churn, not the table."""
    d = snapshot_diff(spark, path, v_old, v_new)
    if not d["added"] and not d["removed"]:
        snap = read_snapshot(spark, path, v_new)
        return (
            spark.createDataFrame([], snap.schema)
            .withColumn("_change_type", F.lit(""))
            .select(*snap.columns, "_change_type")
            .limit(0)
        )

    def side(files: list[str]) -> DataFrame | None:
        if not files:
            return None
        return _read_manifest_files(spark, files, merge_schema=True)

    old = side(d["removed"])
    new = side(d["added"])
    if old is None:
        return new.withColumn("_change_type", F.lit("insert"))
    if new is None:
        return old.withColumn("_change_type", F.lit("delete"))

    cond = None
    for k in key_cols:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else cond & c
    cols = new.columns
    # Presence must be detected with non-null MARKER columns, not the
    # key values: upsert_cow joins keys null-safely, so a NULL key is a
    # legal key value — classifying on okey.isNull() would drop every
    # null-keyed row from all three change buckets.
    old = old.withColumn("_o_present", F.lit(True))
    new = new.withColumn("_n_present", F.lit(True))
    joined = old.alias("o").join(new.alias("n"), cond, "full_outer")
    okey = F.col("o._o_present").isNotNull()
    nkey = F.col("n._n_present").isNotNull()
    # value-identical rows (a key carried verbatim into a rewritten
    # file) are NOT changes: compare full-row structs null-safely over
    # the NEW schema — a column the old version lacked reads as NULL on
    # the old side, so an update that only sets the evolved column
    # still registers as a change
    ntypes = dict(new.dtypes)
    oval = F.struct(
        *[
            (
                F.col(f"o.{c}")
                if c in old.columns
                else F.lit(None).cast(ntypes[c])
            ).alias(c)
            for c in cols
        ]
    )
    nval = F.struct(*[F.col(f"n.{c}").alias(c) for c in cols])
    inserts = joined.filter(~okey & nkey).select(
        *[F.col(f"n.{c}") for c in cols], F.lit("insert").alias("_change_type")
    )
    deletes = joined.filter(okey & ~nkey).select(
        *[
            F.col(f"o.{c}") if c in old.columns else F.lit(None).alias(c)
            for c in cols
        ],
        F.lit("delete").alias("_change_type"),
    )
    updated = joined.filter(okey & nkey & ~oval.eqNullSafe(nval))
    pre = updated.select(
        *[
            F.col(f"o.{c}") if c in old.columns else F.lit(None).alias(c)
            for c in cols
        ],
        F.lit("update_preimage").alias("_change_type"),
    )
    post = updated.select(
        *[F.col(f"n.{c}") for c in cols],
        F.lit("update_postimage").alias("_change_type"),
    )
    return inserts.unionByName(deletes).unionByName(pre).unionByName(post)


def changes_since(
    spark: SparkSession,
    path: str,
    from_version: int,
    key_cols: list[str],
    to_version: int | None = None,
) -> DataFrame:
    """Incremental change feed: the union of every per-commit
    :func:`snapshot_changes` step in ``(from_version, to_version]``,
    each row tagged ``_commit_version`` — Delta's
    ``readChangeFeed(startingVersion=...)`` analog. Consumers get every
    intermediate image in commit order, not just the endpoint diff
    (a key updated twice appears twice, under its own version).

    ``from_version = -1`` means "from the very beginning": the feed
    opens with version 0's rows as inserts (Delta's
    ``startingVersion=0`` includes commit 0), then the per-commit
    diffs. A non-negative ``from_version`` must still be a committed
    (retained) version — if retention aged it out, the diff base is
    gone and the only honest recovery is a re-bootstrap: full-sync from
    ``read_snapshot(latest)`` and ``commit(latest)``; the error says
    so.

    Scale shape: each step is churn-proportional (see
    :func:`snapshot_changes`); the union is a plan-level concat of the
    per-step feeds (``allowMissingColumns`` so a schema-evolving
    commit inside the range reads as NULLs on the older steps) — Spark
    runs the steps' scans independently, nothing re-reads the table;
    ONE snapshot-root listing serves the whole call."""
    all_versions = list_versions(spark, path)
    if not all_versions:
        raise ValueError(f"no snapshots under {path}")
    if from_version >= 0 and from_version not in all_versions:
        raise ValueError(
            f"from_version {from_version} is not a committed version "
            f"(retained: {all_versions}); if retention removed it, "
            "re-bootstrap: full-sync from read_snapshot(latest) and "
            "commit(latest)"
        )
    versions = [v for v in all_versions if v > from_version]
    if to_version is not None:
        versions = [v for v in versions if v <= to_version]
    out = None
    prev = from_version
    for v in versions:
        if prev < 0:
            # opening step: v0's entire content is the insert batch
            step = read_snapshot(spark, path, v).withColumn(
                "_change_type", F.lit("insert")
            )
        else:
            step = snapshot_changes(spark, path, prev, v, key_cols)
        step = step.withColumn("_commit_version", F.lit(v).cast("bigint"))
        out = (
            step
            if out is None
            else out.unionByName(step, allowMissingColumns=True)
        )
        prev = v
    if out is None:
        snap = read_snapshot(spark, path, max(all_versions))
        return (
            spark.createDataFrame([], snap.schema)
            .withColumn("_change_type", F.lit(""))
            .withColumn("_commit_version", F.lit(0).cast("bigint"))
            .limit(0)
        )
    return out


class ChangeFeedCursor:
    """Checkpointed cursor over a snapshot table's change feed — the
    micro-batch consumer loop for index refresh / replication jobs:
    each ``poll()`` returns (changes DataFrame, latest_version) for
    everything committed since the cursor, and ``commit(version)``
    durably advances it.

    The checkpoint is a DIRECTORY of monotonically version-named
    marker files (``v-<020d>``): commit = write-temp + rename to a NEW
    name, position = max name. Nothing is ever deleted before the new
    position is durable (ADVICE r7 #2 — the previous delete-then-rename
    of a single file had a crash window that reset a COMMITTED position
    to -1 and replayed the feed from v0, double-applying every
    historical delta into non-idempotent consumers such as the IVM
    refresher). A crashed consumer re-reads at most its last
    uncommitted batch: at-least-once, never lost progress."""

    def __init__(self, spark: SparkSession, path: str, key_cols: list[str], checkpoint: str):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.checkpoint = checkpoint

    def _migrate_legacy(self, jvm, fs, p) -> None:
        """Pre-r8 checkpoints were a single FILE whose content is the
        integer position. Without migration, listStatus of that file
        finds no ``v-`` markers, so ``position()`` silently returns -1
        and the consumer replays the WHOLE feed from v0 into
        non-idempotent consumers — and ``commit()``'s mkdirs over the
        file then fails (ADVICE r8 medium). Detect the legacy file,
        read its position, and convert it to a marker directory before
        any read or commit proceeds.

        Crash recovery (ADVICE r9 #2): the swap below is
        stage-marker-dir -> delete(legacy file) -> rename(staged, p).
        A crash between the delete and the rename leaves NO checkpoint
        at p but a fully-staged ``.tmp-migrate-<name>-*`` dir beside it
        — previously nothing ever looked for it, so the next
        ``position()`` silently returned -1 and replayed the whole feed
        into non-idempotent consumers (the exact failure migration
        exists to prevent). The staged dir is durable by construction,
        so completing the rename here is always safe; the dir name
        embeds the checkpoint's own name so cursors sharing a parent
        directory can never adopt each other's stage."""
        HPath = jvm.org.apache.hadoop.fs.Path
        if not fs.exists(p):
            parent = p.getParent()
            if parent is not None and fs.exists(parent):
                orphans = [
                    st.getPath()
                    for st in fs.listStatus(parent)
                    if st.getPath()
                    .getName()
                    .startswith(f".tmp-migrate-{p.getName()}-")
                ]
                if orphans:
                    # Any staged dir carries the same legacy position
                    # (all staged from the one legacy file); adopt the
                    # lexicographically last for determinism, drop the
                    # rest.
                    chosen = max(orphans, key=lambda q: q.getName())
                    if not fs.rename(chosen, p):
                        raise RuntimeError(
                            "could not complete interrupted legacy-cursor "
                            f"migration {chosen.toString()} -> "
                            f"{self.checkpoint}"
                        )
                    for o in orphans:
                        if o.getName() != chosen.getName() and fs.exists(o):
                            fs.delete(o, True)
            return
        if not fs.getFileStatus(p).isFile():
            return
        stream = fs.open(p)
        try:
            data = []
            while True:
                b = stream.read()
                if b < 0:
                    break
                data.append(b)
        finally:
            stream.close()
        try:
            pos = int(bytes(data).decode("utf-8").strip())
        except ValueError as exc:
            raise RuntimeError(
                f"cursor checkpoint {self.checkpoint} is a file but not a "
                "legacy integer checkpoint — refusing to overwrite"
            ) from exc
        import uuid

        tmp = HPath(
            p.getParent(), f".tmp-migrate-{p.getName()}-{uuid.uuid4().hex}"
        )
        fs.mkdirs(tmp)
        fs.create(HPath(tmp, f"v-{pos:020d}"), True).close()
        # Swap: the legacy file stays in place until the marker dir is
        # fully staged; a crash between delete and rename re-runs the
        # migration finding no file (position -1) ONLY if the rename
        # also failed — so delete last is not safe; rename cannot
        # overwrite a file on all FS, so delete-then-rename with the
        # staged dir already durable is the narrowest window, and the
        # staged dir is recoverable by hand.
        if not fs.delete(p, False):
            fs.delete(tmp, True)
            raise RuntimeError(
                f"could not remove legacy cursor file {self.checkpoint}"
            )
        if not fs.rename(tmp, p):
            raise RuntimeError(
                f"legacy cursor migration rename failed for {self.checkpoint}; "
                f"staged markers left at {tmp.toString()}"
            )
        # Sweep stage dirs from EARLIER crashed attempts: left behind,
        # they would be "adopted" by the recovery branch above if the
        # checkpoint is ever intentionally deleted (operator resetting
        # the cursor), silently resurrecting an obsolete position
        # instead of replaying from -1.
        parent = p.getParent()
        if parent is not None and fs.exists(parent):
            for st in fs.listStatus(parent):
                name = st.getPath().getName()
                if name.startswith(f".tmp-migrate-{p.getName()}-"):
                    fs.delete(st.getPath(), True)

    def _markers(self, fs, p) -> list[int]:
        if not fs.exists(p):
            return []
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith("v-"):
                try:
                    out.append(int(name[2:]))
                except ValueError:
                    continue  # foreign file; never a committed marker
        return out

    def position(self) -> int:
        jvm, fs, p = _jfs(self.spark, self.checkpoint)
        self._migrate_legacy(jvm, fs, p)
        versions = self._markers(fs, p)
        return max(versions) if versions else -1  # fresh: deliver v0 too

    def poll(self) -> tuple[DataFrame, int]:
        pos = self.position()
        latest = latest_version(self.spark, self.path)
        if latest is None:
            raise ValueError(f"no snapshots under {self.path}")
        return (
            changes_since(self.spark, self.path, pos, self.key_cols, latest),
            latest,
        )

    def commit(self, version: int) -> None:
        # Same Hadoop FileSystem the table operations use (ADVICE r6
        # #4), so the checkpoint can live beside an s3a:/hdfs: table.
        # The marker content is empty — the version lives in the NAME,
        # committed by a rename to a name that never pre-exists, so no
        # step can clobber an earlier durable position.
        import uuid

        jvm, fs, p = _jfs(self.spark, self.checkpoint)
        self._migrate_legacy(jvm, fs, p)
        fs.mkdirs(p)
        HPath = jvm.org.apache.hadoop.fs.Path
        tmp = HPath(p, f".tmp-{uuid.uuid4().hex}")
        fs.create(tmp, True).close()
        target = HPath(p, f"v-{version:020d}")
        if not fs.rename(tmp, target):
            fs.delete(tmp, False)
            if not fs.exists(target):  # exists => same version already committed
                raise RuntimeError(
                    f"cursor checkpoint rename failed for {self.checkpoint}"
                )
        # Best-effort GC of superseded markers AFTER the new position
        # is durable; a crash here only leaves extra markers behind
        # (position() takes the max, so they are harmless).
        for v in self._markers(fs, p):
            if v < version:
                fs.delete(HPath(p, f"v-{v:020d}"), False)


# ---------------------------------------------------------------------------
# Tags + shallow clone (VERDICT r10 #7): the cheap branch-for-experiment
# primitives a 100 TB corpus store wants before any risky rewrite. A tag
# is a named retention-pinned pointer to a version; a shallow clone is a
# manifest-only table whose v0 references another table's live files at
# a pinned version — zero data copied, O(manifest) commit.
# ---------------------------------------------------------------------------
_TAGS_SIDECAR = "_tags.json"


def list_tags(spark: SparkSession, path: str) -> dict[str, int]:
    """name -> version for every tag on the table. Fails closed on a
    half-committed sidecar, same as :func:`list_clones`."""
    import json as _json

    raw = _read_sidecar_fail_closed(spark, path, _TAGS_SIDECAR)
    return _json.loads(raw) if raw else {}


def _write_tags(spark: SparkSession, path: str, tags: dict[str, int]) -> None:
    import json as _json

    _write_sidecar_atomic(
        spark, path, _TAGS_SIDECAR, _json.dumps(tags, sort_keys=True)
    )


def tag_snapshot(
    spark: SparkSession, path: str, name: str, version: int | None = None
) -> int:
    """Pin ``name`` to ``version`` (default latest). A tag is readable
    via ``read_snapshot(version=name)`` and protects its version from
    ``delete_versions_before`` until deleted. Names are immutable while
    they exist (re-pointing silently would break any run that recorded
    the tag) — ``delete_tag`` first to move one. Same single-writer
    contract as every commit here."""
    if _VER_RE.match(name):
        raise ValueError(f"tag name {name!r} collides with version syntax")
    vs = list_versions(spark, path)
    if not vs:
        raise ValueError(f"no snapshots under {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} does not exist under {path}")
    tags = list_tags(spark, path)
    if name in tags and tags[name] != v:
        raise ValueError(
            f"tag {name!r} already points at v{tags[name]}; delete_tag first"
        )
    tags[name] = v
    _write_tags(spark, path, tags)
    return v


def delete_tag(spark: SparkSession, path: str, name: str) -> int:
    """Remove a tag; returns the version it pointed at."""
    tags = list_tags(spark, path)
    if name not in tags:
        raise ValueError(f"no tag {name!r} on {path}")
    v = tags.pop(name)
    _write_tags(spark, path, tags)
    return v


def _resolve_version(
    spark: SparkSession, path: str, version: int | str | None
) -> int:
    """None -> latest; str -> tag lookup; int passes through."""
    if version is None:
        v = latest_version(spark, path)
        if v is None:
            raise ValueError(f"no snapshots under {path}")
        return v
    if isinstance(version, str):
        tags = list_tags(spark, path)
        if version not in tags:
            raise ValueError(f"no tag {version!r} on {path}")
        return tags[version]
    return version


_CLONES_SIDECAR = "_clones.json"


def _write_sidecar_atomic(
    spark: SparkSession, path: str, name: str, text: str
) -> None:
    """Mutable-sidecar commit idiom (ADVICE r12 #1): stage the new
    content under a unique ``.tmp-`` name, delete the old file, rename
    the stage into place — a reader never observes a torn write, which
    the previous ``fs.create(overwrite)`` allowed (a crash mid-write
    left truncated JSON that broke every later read). The remaining
    crash window (between delete and rename) leaves the stage file
    behind with no final file; :func:`_read_sidecar_fail_closed` turns
    that state into a named recovery error instead of an empty
    registry. Mutation runs under the table's single-writer commit
    contract, same as every manifest commit here."""
    import uuid

    jvm, fs, _ = _jfs(spark, path)
    HPath = jvm.org.apache.hadoop.fs.Path
    root = _snap_root(path)
    tmp = HPath(root, f".tmp-{name}-{uuid.uuid4().hex}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    final = HPath(root, name)
    if fs.exists(final):
        fs.delete(final, False)
    if not fs.rename(tmp, final):
        raise IOError(f"sidecar rename failed for {name} under {path}")


def _read_sidecar_fail_closed(spark: SparkSession, path: str, name: str):
    """Read a mutable sidecar; if the final file is MISSING but a
    staged ``.tmp-`` twin exists, a writer crashed between delete and
    rename — fail closed with recovery instructions rather than return
    "no registrations" (for ``_clones.json`` that empty answer is
    exactly the silent vacuum data loss the sidecar exists to
    prevent)."""
    jvm, fs, _ = _jfs(spark, path)
    raw = _read_sidecar_text(jvm, fs, _snap_root(path), name)
    if raw is None:
        root_p = jvm.org.apache.hadoop.fs.Path(_snap_root(path))
        if fs.exists(root_p):
            for st in fs.listStatus(root_p):
                n = st.getPath().getName()
                if n.startswith(f".tmp-{name}-"):
                    raise ValueError(
                        f"staged sidecar {n} exists but {name} is missing "
                        f"under {path}: a writer crashed between delete and "
                        "rename; inspect the stage and rename it into place "
                        f"as {name} to recover"
                    )
    return raw


def list_clones(spark: SparkSession, path: str) -> list[str]:
    """Destination paths of every shallow clone registered on this
    table (written by :func:`clone_snapshot` at clone time). Entries
    are the exact path strings passed to ``clone_snapshot``. Fails
    closed on a half-committed sidecar (crashed writer) — see
    :func:`_read_sidecar_fail_closed`."""
    import json as _json

    raw = _read_sidecar_fail_closed(spark, path, _CLONES_SIDECAR)
    return _json.loads(raw) if raw else []


def _write_clones(spark: SparkSession, path: str, clones: list[str]) -> None:
    import json as _json

    _write_sidecar_atomic(
        spark, path, _CLONES_SIDECAR, _json.dumps(sorted(clones))
    )


def unregister_clone(spark: SparkSession, src_path: str, dst_path: str) -> None:
    """Retire a clone registration — AFTER the clone is deleted or has
    fully localized away from the source's files. The registry fails
    vacuum closed (``live_files_union`` raises on an unreadable
    registered clone), so a deleted clone must be unregistered
    consciously rather than silently dropped."""
    clones = list_clones(spark, src_path)
    if dst_path not in clones:
        raise ValueError(f"{dst_path!r} is not a registered clone of {src_path!r}")
    _write_clones(spark, src_path, [c for c in clones if c != dst_path])


def clone_snapshot(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    version: int | str | None = None,
) -> int:
    """SHALLOW CLONE (Delta's ``CREATE TABLE ... SHALLOW CLONE`` analog):
    commit ``dst_path``'s v0 as a manifest that references
    ``src_path``'s live files at ``version`` (default latest; a tag
    name works). Zero data copied — the commit is O(manifest), not
    O(table) — and the source's history is untouched.

    The clone is a real table afterwards: manifest entries are
    fully-qualified, so every read resolves foreign files through the
    per-root grouped reader (:func:`_read_manifest_files`), and
    copy-on-write mutations (upsert/delete/compact) rewrite touched
    partitions into the CLONE's own directory — the clone localizes
    lazily as it diverges, exactly the branch-for-experiment shape.
    Schema sidecar and CHECK constraints carry over from the source
    version.

    VACUUM INTERACTION: the clone's foreign files live under the
    SOURCE's directory, so a source vacuum that ignores clones would
    invalidate them. The clone therefore REGISTERS itself in the
    source's ``_clones.json`` sidecar before committing, and
    ``live_files_union(src)`` unions registered clones' live sets BY
    DEFAULT — ``vacuum_orphans(live_files_union(src))`` is clone-safe
    with zero caller bookkeeping (VERDICT r11 #3). Registration happens
    before the clone's v0 commit so a crash between the two leaves a
    phantom registration (vacuum fails closed until
    ``unregister_clone``), never an unregistered clone (silent data
    loss). Source-only vacuum is the explicit opt-in
    ``live_files_union(src, include_clones=False)``.

    Registration is a read-modify-write of the source's sidecar and
    runs under the source table's SINGLE-WRITER commit contract (the
    same one every manifest commit assumes): two concurrent
    ``clone_snapshot`` calls against one source must be externally
    serialized or one registration can be lost (ADVICE r12 #1)."""
    src_v = _resolve_version(spark, src_path, version)
    if latest_version(spark, dst_path) is not None:
        raise ValueError(f"{dst_path} already has snapshots")
    jvm, fs, dst_root = _jfs(spark, dst_path)
    if fs.exists(dst_root):
        raise ValueError(
            f"{dst_path} exists; clone into a fresh directory so vacuum "
            "never has to reason about pre-existing unmanaged files"
        )
    clones = list_clones(spark, src_path)
    if dst_path not in clones:
        _write_clones(spark, src_path, clones + [dst_path])
    rows = [
        (r["file"], r["partition"], r["row_count"])
        for r in read_manifest(spark, src_path, src_v).collect()
    ]
    return _commit_manifest(
        spark,
        dst_path,
        0,
        rows,
        table_schema=table_schema(spark, src_path, src_v),
        constraints=table_constraints(spark, src_path, src_v) or {},
        operation="CLONE",
        op_metrics={"source_path": src_path, "source_version": src_v},
    )
