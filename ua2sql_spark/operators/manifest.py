"""File-level statistics manifest + manifest-driven scan pruning.

The payoff side of the layout work (``operators/layout.py``): once data
is range- or z-order-clustered, per-file column min/max stats are
narrow, and a predicate can drop whole files *before* Spark plans the
scan — the lakehouse "data skipping" pattern (Delta/Iceberg keep these
stats in their transaction log; for plain parquet directories we build
them from the footers).

Scale design:
* Footer reads are DISTRIBUTED: file paths go into a DataFrame and each
  task reads only the parquet footers of its slice (pyarrow reads the
  metadata pages, not the data). A 100 TB / 800k-file table costs 800k
  footer reads spread over the cluster, not a driver loop.
* The manifest itself is tiny (one row per file × column) — persist it
  as parquet next to the table and incrementally append for new files.
* ``prune_files`` collects only the surviving *paths* (bounded by file
  count, not rows) and hands them to ``spark.read.parquet(*files)`` —
  Catalyst still applies row-group pruning and predicate pushdown
  inside each chosen file, so manifest pruning composes with, never
  replaces, the engine's own pushdown.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_SCHEMA = (
    "file string, row_count bigint, col string, "
    "min_val string, max_val string, null_count bigint"
)


def build_file_manifest(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """One row per (data file, column) with file-level min/max/null
    stats folded across row groups. Values are canonical strings (the
    caller compares after casting back, see :func:`prune_files`) so one
    manifest schema serves every column type."""
    from ua2sql_spark.operators.layout import _fs_and_path

    fs, root = _fs_and_path(spark, path)
    files = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")) or not name.endswith(".parquet"):
            continue
        files.append(st.getPath().toString())
    return file_stats(spark, files, columns)


def file_stats(
    spark: SparkSession, files: list[str], columns: list[str] | None = None
) -> DataFrame:
    """:func:`build_file_manifest` over an EXPLICIT file list — the
    incremental path: a committer that just wrote N files stats exactly
    those N (churn-bounded), never re-listing or re-footer-reading the
    table."""
    if not files:
        return spark.createDataFrame([], _MANIFEST_SCHEMA)

    paths_df = spark.createDataFrame([(f,) for f in files], "file string")
    want = columns

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for fpath in pdf["file"]:
                local = fpath[len("file:") :] if fpath.startswith("file:") else fpath
                meta = pq.ParquetFile(local).metadata
                names = meta.schema.names
                cols = [c for c in (want or names) if c in names]
                acc: dict[str, list] = {c: [None, None, 0] for c in cols}
                # A single stats-less row group poisons the whole
                # file's range for that column: the sentinel must be
                # STICKY, or a later group's min/max would resurrect a
                # range that excludes the stats-less group's values and
                # prune_files would drop files that contain matches.
                dead: set[str] = set()
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    for j in range(g.num_columns):
                        c = g.column(j)
                        cname = c.path_in_schema
                        if cname not in acc or cname in dead:
                            continue
                        s = c.statistics
                        if s is None or not s.has_min_max:
                            acc[cname] = [None, None, None]
                            dead.add(cname)
                            continue
                        mn, mx, nc = acc[cname]
                        acc[cname] = [
                            s.min if mn is None or s.min < mn else mn,
                            s.max if mx is None or s.max > mx else mx,
                            None if nc is None else nc + (s.null_count or 0),
                        ]
                for cname, (mn, mx, nc) in acc.items():
                    rows.append(
                        (
                            fpath,
                            meta.num_rows,
                            cname,
                            None if mn is None else str(mn),
                            None if mx is None else str(mx),
                            nc,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "row_count", "col", "min_val", "max_val", "null_count",
                ],
            )

    return paths_df.repartition(min(len(files), 64)).mapInPandas(
        read_footers, schema=_MANIFEST_SCHEMA
    )


def file_row_counts(spark: SparkSession, files: list[str]) -> dict[str, int]:
    """``file -> parquet footer num_rows`` for an EXPLICIT file list,
    read DISTRIBUTED like :func:`file_stats` (one metadata page per
    file, never the data); the returned map is file-count-bounded, so
    the one collect is the same O(files-touched) the caller's manifest
    commit already pays. Committers record these in the manifest so
    downstream consumers (``snapshot_layout_health``, change
    accounting) get exact per-partition row counts without re-scanning
    data — the Delta ``numRecords`` per-file stat."""
    if not files:
        return {}

    paths_df = spark.createDataFrame([(f,) for f in files], "file string")

    def read_counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for fpath in pdf["file"]:
                local = fpath[len("file:") :] if fpath.startswith("file:") else fpath
                rows.append((fpath, pq.ParquetFile(local).metadata.num_rows))
            yield pd.DataFrame(rows, columns=["file", "row_count"])

    return {
        r["file"]: r["row_count"]
        for r in paths_df.repartition(min(len(files), 64))
        .mapInPandas(read_counts, schema="file string, row_count bigint")
        .collect()
    }


def prune_files(
    manifest: DataFrame, col: str, lo, hi, cast: str = "bigint"
) -> list[str] | None:
    """Paths of files whose [min, max] range on ``col`` overlaps
    [lo, hi] (files lacking stats are conservatively kept), or ``None``
    when the manifest carries NO rows for ``col`` at all — the caller
    must distinguish "no stats recorded" (cannot prune; fall back to a
    full scan) from "no file overlaps" (empty list; zero rows is the
    right answer). One collect, bounded by the table's file count.

    Stats whose canonical string does not survive the ``cast`` (e.g. a
    string column pruned with the default ``cast='bigint'``) are also
    conservatively KEPT: treating a failed-cast (NULL) range as
    non-overlapping would silently prune files that contain matches.
    """
    m = manifest.filter(F.col("col") == col)
    # try_cast, not cast: the session runs ANSI mode, where a plain cast
    # of a non-conforming stat string THROWS instead of yielding NULL
    mn = F.col("min_val").try_cast(cast)
    mx = F.col("max_val").try_cast(cast)
    keep = (
        F.col("min_val").isNull()
        | mn.isNull()
        | mx.isNull()
        | ((mx >= F.lit(lo)) & (mn <= F.lit(hi)))
    )
    rows = m.select("file", keep.alias("keep")).collect()
    if not rows:
        return None
    return [r["file"] for r in rows if r["keep"]]


def read_pruned(
    spark: SparkSession,
    manifest: DataFrame,
    col: str,
    lo,
    hi,
    cast: str = "bigint",
) -> DataFrame:
    """Scan only the manifest-surviving files AND re-apply the predicate
    (file-level stats prune conservatively; the filter does the exact
    cut, pushed down into the chosen files)."""
    files = prune_files(manifest, col, lo, hi, cast=cast)
    if files is None:
        raise ValueError(f"manifest has no stats for column {col!r}")
    if not files:
        raise ValueError(f"no files overlap {col} in [{lo}, {hi}]")
    return spark.read.parquet(*files).filter(
        F.col(col).between(F.lit(lo), F.lit(hi))
    )
