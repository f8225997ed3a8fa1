"""`unity_export` — a PySpark Python DataSource over the Unity Raw Data
Export API (the SURVEY §4 "custom streaming DataSource for elegance"
item, batch leg).

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
"""

from __future__ import annotations

import gzip
import json
from datetime import date
from typing import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import LongType, StructType

from ua2sql_spark.sources.unity import FEEDS, raw_schema


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
        from ua2sql_spark.sources.http_export import (
            DEFAULT_BASE_URL,
            HttpExportClient,
        )

        return HttpExportClient(
            project_id=self.options["project_id"],
            api_key=self.options["api_key"],
            base_url=self.options.get("base_url") or DEFAULT_BASE_URL,
            timeout_s=float(self.options.get("timeout_s", "60")),
        )

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
        import requests

        r = requests.get(partition.url, timeout=120)
        r.raise_for_status()
        payload = r.content
        if payload[:2] == b"\x1f\x8b":  # gzip magic
            payload = gzip.decompress(payload)
        fields = [(f.name, isinstance(f.dataType, LongType)) for f in self.schema]
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
