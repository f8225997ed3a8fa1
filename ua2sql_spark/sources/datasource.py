"""`unity_export` / `unity_export_jobs` — PySpark Python DataSources
over the Unity Raw Data Export API (the SURVEY §4 "custom streaming
DataSource for elegance" item: batch + streaming legs).

    spark.dataSource.register(UnityExportDataSource)
    df = (spark.read.format("unity_export")
          .option("base_url", ...).option("project_id", ...)
          .option("api_key", ...).option("feed", "custom")
          .option("job_id", jid)          # or start_date/continue_from
          .load())

What this buys over the driver-side controller (`sources/ingest.py`):
the *data plane* distributes. The reference downloads and parses result
files serially in one process (ua2sql.py:128-161, 209-246); the
driver-side `HttpExportClient` parallelizes only the post-landing scan.
Here, planning is control-plane only — job create + poll + fileList
listing on the driver — and **each result file becomes an
InputPartition**, so a 1000-file export is 1000 concurrent
download+gunzip+parse tasks across executors, no landing-zone hop at
all. Schema-first projection parity is preserved: declared columns
only, missing keys → NULL, JSONB islands kept as canonical JSON text
(the semantics of ua2sql.py:226-235, same as `sources/unity.py`).

The landing-zone pipeline stays the production default (replayable raw
zone, corrupt-record quarantine); this source is the direct-query path
— ad-hoc inspection of an export without landing it first.

Streaming leg (`unity_export_jobs`): the reference's T1 resume loop —
"create export with ``continueFrom`` = last job id, poll, ingest"
(ua2sql.py:253-276) — re-expressed as a Structured Streaming source
whose **offset IS the job-id chain**. Each microbatch = one completed
export job; the emitted rows are the job's *file manifest* (job_id,
name, url) — control-plane-sized, so the driver-side
SimpleDataSourceStreamReader is the right tool (its own docs: small
batches read on the driver). The heavy data plane then distributes via
`parse_export_manifest(df, feed)` — a `mapInPandas` transform that
downloads/gunzips/parses each file on executors, composable with both
the streaming and batch manifests. Exactly-once replay: a completed
job's fileList is immutable, so `readBetweenOffsets` re-listing it is
deterministic; the checkpointed offset replaces the reference's
Postgres job-id table (ua2sql.py:175-188) with Spark's own WAL.
"""

from __future__ import annotations

import gzip
import json
from datetime import date
from typing import Iterator, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ua2sql_spark.sources.unity import FEEDS, raw_schema


def _fetch_payload(url: str) -> bytes:
    """Executor-side: GET one result file, gunzip if the bytes say so
    (the server names files `.txt.gz` but the reader sniffs magic, so an
    uncompressed dump also parses)."""
    import requests

    r = requests.get(url, timeout=120)
    r.raise_for_status()
    payload = r.content
    if payload[:2] == b"\x1f\x8b":  # gzip magic
        payload = gzip.decompress(payload)
    return payload


def _project_lines(payload: bytes, schema: StructType) -> Iterator[tuple]:
    """Schema-first projection of JSON lines: declared columns only,
    missing keys → NULL, JSONB islands → canonical JSON text (the
    semantics of ua2sql.py:226-235, same as `sources/unity.py`)."""
    fields = [(f.name, isinstance(f.dataType, LongType)) for f in schema]
    for line in payload.splitlines():
        if not line.strip():
            continue
        rec = json.loads(line)
        out = []
        for fname, is_long in fields:
            v = rec.get(fname)  # missing key → NULL (ua2sql.py:229)
            if v is None:
                out.append(None)
            elif is_long:
                out.append(int(v))
            elif isinstance(v, (dict, list)):
                # JSONB island → canonical JSON text (ua2sql.py:68,85)
                out.append(json.dumps(v, separators=(",", ":")))
            else:
                out.append(str(v) if not isinstance(v, str) else v)
        yield tuple(out)


def _client_from_options(options: dict):
    from ua2sql_spark.sources.http_export import (
        DEFAULT_BASE_URL,
        HttpExportClient,
    )

    return HttpExportClient(
        project_id=options["project_id"],
        api_key=options["api_key"],
        base_url=options.get("base_url") or DEFAULT_BASE_URL,
        timeout_s=float(options.get("timeout_s", "60")),
    )


class _FilePartition(InputPartition):
    """One result file of the export job = one Spark task."""

    def __init__(self, url: str, name: str):
        self.url = url
        self.name = name


class UnityExportDataSource(DataSource):
    """Batch Python DataSource: one export job, one file per partition."""

    @classmethod
    def name(cls) -> str:
        return "unity_export"

    def schema(self) -> StructType:
        feed = self.options.get("feed")
        if feed not in FEEDS:
            raise ValueError(f"option 'feed' must be one of {FEEDS}, got {feed!r}")
        return raw_schema(feed)

    def reader(self, schema: StructType) -> "UnityExportReader":
        return UnityExportReader(dict(self.options), schema)


class UnityExportReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.options = options
        self.schema = schema

    def _client(self):
        return _client_from_options(self.options)

    def partitions(self) -> Sequence[InputPartition]:
        """Control plane, runs on the driver: ensure a completed job,
        then one partition per result file."""
        import time

        client = self._client()
        job_id = self.options.get("job_id")
        if not job_id:
            start = self.options.get("start_date")
            job_id = client.request_export(
                self.options["feed"],
                date.fromisoformat(start) if start else None,
                self.options.get("continue_from"),
            )
            if job_id is None:
                return []  # nothing to export — empty relation, no tasks
        poll_s = float(self.options.get("poll_interval_s", "5"))
        deadline = time.monotonic() + float(self.options.get("poll_timeout_s", "600"))
        while not client.is_complete(job_id):
            if time.monotonic() > deadline:
                raise TimeoutError(f"export job {job_id} did not complete")
            time.sleep(poll_s)
        job = client._get_job(job_id) or {}
        file_list = (job.get("result") or {}).get("fileList") or []
        return [_FilePartition(e["url"], e["name"]) for e in file_list]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        """Data plane, runs on an executor: stream one file, gunzip,
        parse JSON lines, project onto the declared schema."""
        yield from _project_lines(_fetch_payload(partition.url), self.schema)


# ---- streaming leg ----

MANIFEST_SCHEMA = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("name", StringType(), True),
        StructField("url", StringType(), True),
    ]
)


class UnityExportJobsDataSource(DataSource):
    """Streaming Python DataSource: the export-job chain as a stream of
    per-file manifest rows.

        spark.dataSource.register(UnityExportJobsDataSource)
        manifests = (spark.readStream.format("unity_export_jobs")
                     .option("base_url", ...).option("project_id", ...)
                     .option("api_key", ...).option("feed", "custom")
                     .load())
        events = parse_export_manifest(manifests, "custom")
    """

    @classmethod
    def name(cls) -> str:
        return "unity_export_jobs"

    def schema(self) -> StructType:
        if self.options.get("feed") not in FEEDS:
            raise ValueError(
                f"option 'feed' must be one of {FEEDS}, "
                f"got {self.options.get('feed')!r}"
            )
        return MANIFEST_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> "UnityExportJobsStreamReader":
        return UnityExportJobsStreamReader(dict(self.options))


class UnityExportJobsStreamReader(SimpleDataSourceStreamReader):
    """Offset = ``{"job": <last completed job id>}`` — the reference's
    ``continueFrom`` token (ua2sql.py:101,181-188), checkpointed by
    Spark's offset WAL instead of a Postgres table.

    Per trigger: create the next export with ``continueFrom`` = the
    start offset's job (or ``startDate`` for the very first batch), poll
    within a bounded budget, and on completion emit the job's file
    manifest and advance the offset. A non-200 create (the API's
    "nothing to export") or an in-flight poll budget leaves the offset
    unchanged — the trigger simply yields an empty batch and the next
    one retries. The in-flight job id is kept in reader memory only; if
    the driver dies mid-poll, the restart re-creates a job with the same
    ``continueFrom`` and the orphan is never read — at-least-once job
    *creation*, exactly-once manifest *emission*."""

    def __init__(self, options: dict):
        self.options = options
        self._pending: str | None = None

    def initialOffset(self) -> dict:
        return {"job": ""}

    def _manifest(self, client, job_id: str) -> list[tuple]:
        job = client._get_job(job_id) or {}
        file_list = (job.get("result") or {}).get("fileList") or []
        return [(job_id, e["name"], e["url"]) for e in file_list]

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        import time

        client = _client_from_options(self.options)
        job_id = self._pending
        if job_id is None:
            last = start.get("job") or None
            start_date = self.options.get("start_date")
            job_id = client.request_export(
                self.options["feed"],
                date.fromisoformat(start_date) if start_date and not last else None,
                last,
            )
            if job_id is None:  # nothing to export — empty batch, no advance
                return iter(()), dict(start)
            self._pending = job_id
        poll_s = float(self.options.get("poll_interval_s", "1"))
        deadline = time.monotonic() + float(self.options.get("poll_budget_s", "30"))
        while not client.is_complete(job_id):
            if time.monotonic() > deadline:
                # still running: hold the offset, retry next trigger
                return iter(()), dict(start)
            time.sleep(poll_s)
        self._pending = None
        return iter(self._manifest(client, job_id)), {"job": job_id}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # failure recovery: a completed job's fileList is immutable, so
        # re-listing it replays the batch deterministically
        if not end.get("job") or end.get("job") == start.get("job"):
            return iter(())
        return iter(self._manifest(_client_from_options(self.options), end["job"]))

    def commit(self, end: dict) -> None:
        pass  # offset WAL is the source of truth; nothing to release


def parse_export_manifest(df, feed: str):
    """Distributed data plane for the manifest stream: each manifest row
    (one export result file) is downloaded, gunzipped, and parsed on an
    executor via ``mapInPandas`` — Arrow-batched, one HTTP fetch per
    file, never the whole dump through the driver (contrast
    ua2sql.py:209-246, which parses every file serially in one
    process). Works on both the streaming (`unity_export_jobs`) and any
    batch manifest with a ``url`` column."""
    import pandas as pd

    schema = raw_schema(feed)
    cols = [f.name for f in schema]

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for url in pdf["url"]:
                rows = list(_project_lines(_fetch_payload(url), schema))
                # object dtype end-to-end: Arrow maps None → NULL for
                # long columns (float64 NaN would corrupt them)
                yield pd.DataFrame(rows, columns=cols, dtype=object)

    return df.mapInPandas(_parse, schema=schema)


# ---------------------------------------------------------------------------
# Writer leg: `unity_backup` — the reference's backup/archive sink
# (ua2sql.py: backup of job results to disk) as a TRANSACTIONAL Python
# DataSource writer. Demonstrates the DSv2 commit protocol in the
# Python API: each task streams its rows to a hidden .staged shard and
# returns a WriterCommitMessage; only the DRIVER's commit() publishes
# (renames) the shards and writes the _MANIFEST.json — so readers
# never observe a partial write, and a failed/speculated task's
# leftovers are invisible by construction (and swept by abort()).
# Complements sources/corpus_export.py (which targets fixed shard
# COUNTS via hash-sharding); this sink preserves the DataFrame's own
# partitioning — one shard per task, the natural shape when an
# upstream repartition already sized the work.
# ---------------------------------------------------------------------------
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _BackupCommit(WriterCommitMessage):
    staged: str
    rows: int


class UnityBackupDataSource(DataSource):
    """gzip-JSONL archive sink with driver-side atomic publication.

    Targets a filesystem shared by driver and executors (local mode,
    NFS, a fuse-mounted store) — the reference's disk-backup analog.
    The atomic step is os.replace, so an object-store deployment would
    swap the rename for a staged-multipart commit; the task/driver
    commit PROTOCOL (stage → message → publish) is the part that
    carries over unchanged."""

    @classmethod
    def name(cls) -> str:
        return "unity_backup"

    def writer(self, schema: StructType, overwrite: bool) -> "UnityBackupWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("unity_backup requires .option('path', ...)")
        return UnityBackupWriter(path, overwrite)


class UnityBackupWriter(DataSourceWriter):
    def __init__(self, path: str, overwrite: bool):
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator) -> _BackupCommit:
        # Executor-side: stream rows to a hidden staged shard. The
        # leading dot keeps Spark/DuckDB globs from ever reading it.
        import gzip
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f".staged-{uuid.uuid4().hex}.jsonl.gz")
        n = 0
        with gzip.open(staged, "wt", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(recursive=True),
                                    sort_keys=True, default=str))
                fh.write("\n")
                n += 1
        return _BackupCommit(staged=staged, rows=n)

    def commit(self, messages) -> None:
        # Driver-side publication. The COMMIT POINT is the atomic
        # os.replace of _MANIFEST.json — readers trust the manifest,
        # never the directory glob. Ordering makes every crash window
        # safe: (1) rename staged shards to their final names (new
        # names never collide with prior ones, so a crash here leaves
        # the OLD manifest fully intact and consistent), (2) atomically
        # swap in the new manifest, (3) only THEN, under overwrite,
        # delete prior shards the new manifest no longer references —
        # a crash between 2 and 3 leaves harmless unreferenced files,
        # never a manifest naming missing ones.
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)  # zero-task writes still commit
        # Shards always number from one past the highest existing index
        # — even under overwrite — so step 1 never clobbers a file the
        # live manifest still references.
        existing = sorted(
            f for f in os.listdir(self.path)
            if f.startswith("part-") and f.endswith(".jsonl.gz")
        )
        base = (
            max(int(f.split("-")[1].split(".")[0]) for f in existing) + 1
            if existing
            else 0
        )
        mpath = os.path.join(self.path, "_MANIFEST.json")
        prior = []
        if not self.overwrite and existing and os.path.exists(mpath):
            # Append extends: carry forward prior shards that survive.
            with open(mpath) as fh:
                prior = [
                    sh for sh in json.load(fh)["shards"] if sh["file"] in existing
                ]
        manifest = list(prior)
        live = [m for m in messages if m is not None]
        for i, m in enumerate(live):
            final = os.path.join(self.path, f"part-{base + i:05d}.jsonl.gz")
            os.replace(m.staged, final)
            manifest.append({"file": os.path.basename(final), "rows": m.rows})
        tmp = os.path.join(self.path, f".manifest-{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "shards": manifest,
                    "total_rows": sum(s["rows"] for s in manifest),
                },
                fh,
            )
        os.replace(tmp, mpath)  # <-- the commit point
        if self.overwrite:
            referenced = {s["file"] for s in manifest}
            for f in existing:
                if f not in referenced:
                    os.remove(os.path.join(self.path, f))
        self._sweep_staged()

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
        self._sweep_staged()

    def _sweep_staged(self) -> None:
        # Failed/speculated tasks that never returned a commit message
        # leave .staged-* shards behind; every commit/abort sweeps them
        # (any staged file surviving to this point belongs to no live
        # task — the driver has already collected all messages).
        import os

        # abort() can run before any task ever created the target dir
        # (upstream stage failure) — a missing dir means nothing staged
        try:
            entries = os.listdir(self.path)
        except FileNotFoundError:
            return
        for f in entries:
            if f.startswith(".staged-") or (
                f.startswith(".manifest-") and f.endswith(".tmp")
            ):
                try:
                    os.remove(os.path.join(self.path, f))
                except OSError:
                    pass
