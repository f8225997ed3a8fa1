"""Ingest-parity tests (SURVEY §5.3/§5.4, FIXTURES.md §2).

Fixture cases: (a) happy path, (b) missing fields → NULL, (c) extra
fields dropped, (d) sub-second ts truncation parity, (e) empty file,
(f) duplicate rows across runs → at-least-once, plus checkpoint
resume-from-offset semantics.
"""

from __future__ import annotations

import gzip
import json
import os
from datetime import datetime
from decimal import Decimal

import pytest

from ua2sql_spark.sources.checkpoint import JobIdCheckpoint
from ua2sql_spark.sources.ingest import (
    LocalFileExportClient,
    parquet_sink,
    run_ingest,
)
from ua2sql_spark.sources.jdbc import jdbc_writer_options
from ua2sql_spark.sources.unity import FEEDS, landed_schema, read_feed


def write_jsonl_gz(path: str, rows: list[dict]) -> str:
    with gzip.open(path, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return path


BASE_MS = 1_700_000_000_123  # 2023-11-14 22:13:20.123 UTC


def custom_rows():
    return [
        {  # happy path
            "ts": BASE_MS,
            "submit_time": BASE_MS + 5_000,
            "userid": "u1",
            "remote_ip": "203.0.113.7",
            "platform": "iOS",
            "user_agent": "ua/1",
            "sdk_ver": "5.0",
            "sessionid": 42,
            "name": "level_up",
            "custom_params": {"level": 3, "tags": ["a", "b"]},
        },
        {  # missing most fields → NULLs (ua2sql.py:229)
            "ts": BASE_MS + 60_000,
            "userid": "u2",
            "name": "ping",
            "unknown_extra_key": "dropped silently",  # ua2sql.py:226-235
        },
    ]


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    return str(d)


def test_happy_path_and_projection(spark, landing):
    write_jsonl_gz(os.path.join(landing, "dump.txt.gz"), custom_rows())
    df = read_feed(spark, landing, "custom")
    assert df.schema == landed_schema("custom")
    rows = {r["userid"]: r for r in df.collect()}
    r1 = rows["u1"]
    assert r1["ts"] == datetime(2023, 11, 14, 22, 13, 20, 123000)
    assert r1["submit_time"] == datetime(2023, 11, 14, 22, 13, 25, 123000)
    assert r1["sessionid"] == 42
    # JSONB island carried as raw JSON text (ua2sql.py:68)
    assert json.loads(r1["custom_params"]) == {"level": 3, "tags": ["a", "b"]}
    r2 = rows["u2"]
    # missing keys → NULL; extra keys dropped (no such column exists)
    assert r2["remote_ip"] is None and r2["sessionid"] is None
    assert "unknown_extra_key" not in df.columns


def test_ts_truncation_parity(spark, landing):
    write_jsonl_gz(os.path.join(landing, "dump.txt.gz"), custom_rows())
    df = read_feed(spark, landing, "custom", parity_ts=True)
    r1 = [r for r in df.collect() if r["userid"] == "u1"][0]
    # reference truncates to whole seconds (ua2sql.py:232-233)
    assert r1["ts"] == datetime(2023, 11, 14, 22, 13, 20)
    assert r1["submit_time"] == datetime(2023, 11, 14, 22, 13, 25)


def test_transaction_amount_is_exact_decimal(spark, landing):
    rows = [
        {
            "ts": BASE_MS,
            "userid": "u1",
            "sessionid": 1,
            "currency": "USD",
            "amount": 19.99,
            "transactionid": "t-1",
            "productid": "p-1",
            "receipt": {"store": "apple", "sig": "abc"},
        }
    ]
    write_jsonl_gz(os.path.join(landing, "tx.txt.gz"), rows)
    df = read_feed(spark, landing, "transaction")
    r = df.collect()[0]
    assert r["amount"] == Decimal("19.99")  # never a float (ua2sql.py:82)
    assert json.loads(r["receipt"])["store"] == "apple"


def test_empty_file(spark, landing):
    write_jsonl_gz(os.path.join(landing, "empty.txt.gz"), [])
    df = read_feed(spark, landing, "appStart")
    # the reference executes an empty INSERT here (documented bug,
    # ua2sql.py:244-245); we land zero rows cleanly
    assert df.count() == 0


def test_checkpoint_protocol(spark, tmp_path):
    cp = JobIdCheckpoint(spark, str(tmp_path / "jobid"))
    assert cp.find_previous_job_id("custom") is None
    cp.append("custom-0", "custom", ts=datetime(2024, 1, 1, 10))
    cp.append("custom-1", "custom", ts=datetime(2024, 1, 2, 10))
    cp.append("appStart-7", "appStart", ts=datetime(2024, 1, 3, 10))
    assert cp.find_previous_job_id("custom") == "custom-1"  # max_by ts
    assert cp.find_previous_job_id("appStart") == "appStart-7"
    assert cp.find_previous_job_id("transaction") is None


def test_full_ingest_resume_and_at_least_once(spark, tmp_path):
    """Two ingest cycles: run 2 resumes from the checkpoint (continueFrom
    semantics, ua2sql.py:101-104) and re-delivers an overlapping row —
    landed duplicates are expected (at-least-once, T4)."""
    fixtures = tmp_path / "fixtures"
    fixtures.mkdir()
    shared_row = {"ts": BASE_MS, "userid": "dup", "name": "overlap"}
    run0 = write_jsonl_gz(
        str(fixtures / "c0.txt.gz"),
        [shared_row, {"ts": BASE_MS + 1, "userid": "a", "name": "x"}],
    )
    run1 = write_jsonl_gz(
        str(fixtures / "c1.txt.gz"),
        [shared_row, {"ts": BASE_MS + 2, "userid": "b", "name": "y"}],
    )
    client = LocalFileExportClient(exports={"custom": [[run0], [run1]]})
    cp = JobIdCheckpoint(spark, str(tmp_path / "jobid"))
    sink = parquet_sink(str(tmp_path / "warehouse"))

    r1 = run_ingest(
        spark, client, str(tmp_path / "staging"), cp, sink,
        feeds=("custom",), backup_root=str(tmp_path / "backup"),
        poll_interval_s=0.01,
    )
    assert r1[0].rows == 2 and r1[0].job_id == "custom-0"
    assert cp.find_previous_job_id("custom") == "custom-0"

    r2 = run_ingest(
        spark, client, str(tmp_path / "staging"), cp, sink,
        feeds=("custom",), poll_interval_s=0.01,
    )
    assert r2[0].rows == 2 and r2[0].job_id == "custom-1"

    landed = spark.read.parquet(str(tmp_path / "warehouse" / "custom"))
    assert landed.count() == 4  # at-least-once: the overlap row is duplicated
    assert landed.filter("userid = 'dup'").count() == 2

    # third run: no new exports → clean no-op (reference would crash here)
    r3 = run_ingest(
        spark, client, str(tmp_path / "staging"), cp, sink,
        feeds=("custom",), poll_interval_s=0.01,
    )
    assert r3[0].job_id is None and r3[0].rows == 0

    # backup archive kept the raw dump partitioned by feed/date (S9)
    backup_feed_dir = tmp_path / "backup" / "custom"
    assert backup_feed_dir.is_dir() and any(backup_feed_dir.iterdir())

    # staging was wiped after each successful ingest (S10)
    staging_files = [
        f for f in (tmp_path / "staging" / "custom").iterdir() if f.is_file()
    ]
    assert staging_files == []


def test_jdbc_options_parity():
    opts = jdbc_writer_options("transaction")
    assert opts["batchsize"] == "1000"  # ua2sql.py:238
    ddl = opts["createTableColumnTypes"]
    assert "remote_ip INET" in ddl and "receipt JSONB" in ddl
    assert "amount NUMERIC(38,18)" in ddl
    assert "createTableColumnTypes" not in jdbc_writer_options("JobId")


def test_all_feed_schemas_declared():
    for feed in FEEDS:
        s = landed_schema(feed)
        assert {"ts", "submit_time", "userid", "remote_ip"} <= set(s.names)


def test_corrupt_record_quarantine(spark, landing):
    """A malformed line must not kill the ingest (the reference would
    raise at json.loads, ua2sql.py:222): PERMISSIVE capture routes it to
    the quarantine split verbatim; good rows are unaffected."""
    import gzip as _gzip

    from ua2sql_spark.sources.unity import split_corrupt

    path = os.path.join(landing, "dump.txt.gz")
    with _gzip.open(path, "wt") as f:
        for r in custom_rows():
            f.write(json.dumps(r) + "\n")
        f.write('{"ts": 123, "userid": "u3", BROKEN\n')
    df = read_feed(spark, landing, "custom", capture_corrupt=True)
    good, bad = split_corrupt(df)
    assert good.count() == 2
    assert set(r["userid"] for r in good.collect()) == {"u1", "u2"}
    quarantined = bad.collect()
    assert len(quarantined) == 1 and "BROKEN" in quarantined[0][0]


def test_jdbc_sink_roundtrip_embedded_derby(spark, landing, tmp_path):
    """Real end-to-end JDBC write+readback (S6/S7): Spark ships embedded
    Derby, so the append sink, 1000-row batching and auto-DDL run for
    real — only the PG-specific column types (INET/JSONB) stay
    integration-gated behind pg_types."""
    from ua2sql_spark.sources.jdbc import write_feed_jdbc

    write_jsonl_gz(os.path.join(landing, "dump.txt.gz"), custom_rows())
    df = read_feed(spark, landing, "custom")
    url = f"jdbc:derby:{tmp_path}/derby_db;create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}

    write_feed_jdbc(df, url, "custom_events", feed="custom",
                    properties=props, pg_types=False)
    back = spark.read.jdbc(url, "custom_events", properties=props)
    assert back.count() == 2
    got = {r["USERID" if "USERID" in back.columns else "userid"]: r
           for r in back.collect()}
    assert set(got) == {"u1", "u2"}

    # append semantics: a second write doubles the rows (at-least-once,
    # reference T4 — no unique constraint on event tables, ua2sql.py:46-86)
    write_feed_jdbc(df, url, "custom_events", feed="custom",
                    properties=props, pg_types=False)
    assert spark.read.jdbc(url, "custom_events", properties=props).count() == 4


def test_jdbc_idempotent_upsert(spark, landing, tmp_path):
    """T4 exactly-once upgrade: re-delivered rows are no-ops; a batch
    overlapping the target adds only its genuinely-new rows."""
    from ua2sql_spark.sources.jdbc import upsert_feed_jdbc

    write_jsonl_gz(os.path.join(landing, "dump.txt.gz"), custom_rows())
    df = read_feed(spark, landing, "custom")
    url = f"jdbc:derby:{tmp_path}/derby_ups;create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}

    # first write: table auto-created, everything lands
    assert upsert_feed_jdbc(df, url, "custom_e1", "custom",
                            properties=props, pg_types=False) == 2
    # exact re-delivery (the reference's crash-between-insert-and-
    # checkpoint window, ua2sql.py:274-278): zero new rows
    assert upsert_feed_jdbc(df, url, "custom_e1", "custom",
                            properties=props, pg_types=False) == 0
    back = spark.read.jdbc(url, "custom_e1", properties=props)
    assert back.count() == 2

    # overlapping batch: one old row (u2/ping) + one new row
    overlap = [custom_rows()[1],
               {"ts": BASE_MS + 120_000, "userid": "u3", "name": "buy",
                "sessionid": 7}]
    write_jsonl_gz(os.path.join(landing, "dump2.txt.gz"), overlap)
    df2 = read_feed(spark, landing, "custom")  # re-reads all 4 rows
    assert upsert_feed_jdbc(df2, url, "custom_e1", "custom",
                            properties=props, pg_types=False) == 1
    back = spark.read.jdbc(url, "custom_e1", properties=props)
    assert back.count() == 3
    cols = {c.lower() for c in back.columns}
    assert {"userid", "ts", "name"} <= cols


def test_stream_upsert_sink_end_to_end(spark, landing, tmp_path):
    """Streaming T1+T4: file-source checkpoint gives at-least-once
    micro-batches; the foreachBatch upsert makes duplicate rows inside
    later files no-ops — target converges to the distinct row set."""
    from ua2sql_spark.sources.jdbc import jdbc_upsert_sink
    from ua2sql_spark.streaming.ingest import stream_feed

    url = f"jdbc:derby:{tmp_path}/derby_stream;create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    ckpt = str(tmp_path / "ckpt")
    sink = jdbc_upsert_sink(url, "custom_s", "custom",
                            properties=props, pg_types=False)

    write_jsonl_gz(os.path.join(landing, "a.txt.gz"), custom_rows())
    q = stream_feed(spark, landing, "custom", ckpt, sink)
    q.awaitTermination(120)
    assert spark.read.jdbc(url, "custom_s", properties=props).count() == 2

    # second run: a file that re-ships row u2 plus a new row u9
    dup_and_new = [custom_rows()[1],
                   {"ts": BASE_MS + 300_000, "userid": "u9", "name": "x",
                    "sessionid": 1}]
    write_jsonl_gz(os.path.join(landing, "b.txt.gz"), dup_and_new)
    q = stream_feed(spark, landing, "custom", ckpt, sink)
    q.awaitTermination(120)
    back = spark.read.jdbc(url, "custom_s", properties=props)
    assert back.count() == 3


def test_webdataset_export_roundtrip_and_determinism(spark, tmp_path):
    """WebDataset tar shards: every sample lands exactly once with its
    members adjacent, the manifest is the write's own output, and a
    re-export produces byte-identical shards (mtime pinned, member
    order deterministic) — the reproducibility a training-data delivery
    needs."""
    import hashlib
    import tarfile

    from pyspark.sql import functions as F

    from ua2sql_spark.sources.corpus_export import write_webdataset
    from ua2sql_spark.catalog import load_table
    from tests.conftest import SF_DIR

    d = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text", F.encode("text", "utf-8").alias("payload"))
    )
    out1 = str(tmp_path / "wds1")
    manifest = write_webdataset(
        d, out1, n_shards=4, payload_col="payload"
    ).collect()
    assert sum(r["n_samples"] for r in manifest) == 100
    assert len(manifest) == 4

    expected = {str(r["doc_id"]): r["text"] for r in d.collect()}
    seen = {}
    for r in manifest:
        with tarfile.open(r["path"]) as tar:
            members = tar.getnames()
            for m in members:
                if m.endswith(".txt"):
                    key = m[:-4]
                    seen[key] = tar.extractfile(m).read().decode()
                    assert f"{key}.bin" in members  # payload member present
    assert seen == expected

    # byte-identical re-export
    out2 = str(tmp_path / "wds2")
    write_webdataset(d, out2, n_shards=4, payload_col="payload").collect()
    for r in manifest:
        name = r["path"].split("/")[-1]
        h1 = hashlib.sha256(open(r["path"], "rb").read()).hexdigest()
        h2 = hashlib.sha256(open(f"{out2}/{name}", "rb").read()).hexdigest()
        assert h1 == h2, name

    # the loader side: read_webdataset reproduces every sample
    from ua2sql_spark.sources.corpus_export import read_webdataset

    back = {
        r["key"]: (r["text"], bytes(r["payload"]))
        for r in read_webdataset(spark, out1).collect()
    }
    assert back == {
        k: (v, v.encode("utf-8")) for k, v in expected.items()
    }


def test_export_jsonl_gz_roundtrip(spark, tmp_path):
    from ua2sql_spark.sources.corpus_export import export_jsonl_gz
    from ua2sql_spark.catalog import load_table
    from tests.conftest import SF_DIR

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    path = str(tmp_path / "jsonl")
    export_jsonl_gz(d, path, n_files=3)
    import glob

    files = glob.glob(path + "/part-*.json.gz")
    assert len(files) == 3
    back = spark.read.json(path)
    assert back.count() == d.count()
    assert {r["doc_id"] for r in back.collect()} == {
        r["doc_id"] for r in d.collect()
    }


def test_unity_backup_writer_atomic_commit(spark, tmp_path):
    """Python DataSource WRITER leg: tasks stage hidden shards, the
    driver's commit publishes them + a manifest atomically; overwrite
    replaces prior shards; abort leaves nothing visible. Read-back via
    Spark's JSON reader must reproduce the rows exactly."""
    import gzip
    import json
    import os

    from ua2sql_spark.sources.datasource import (
        UnityBackupDataSource,
        UnityBackupWriter,
        _BackupCommit,
    )

    spark.dataSource.register(UnityBackupDataSource)
    path = str(tmp_path / "backup")
    df = spark.range(100).selectExpr("id", "id * 3 AS v").repartition(4)
    df.write.format("unity_backup").option("path", path).mode("append").save()

    files = sorted(os.listdir(path))
    parts = [f for f in files if f.startswith("part-")]
    assert len(parts) == 4 and "_MANIFEST.json" in files
    assert not [f for f in files if f.startswith(".staged")]
    manifest = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert manifest["total_rows"] == 100
    assert sum(s["rows"] for s in manifest["shards"]) == 100

    back = spark.read.json(os.path.join(path, "part-*.jsonl.gz"))
    got = {(r["id"], r["v"]) for r in back.collect()}
    assert got == {(i, i * 3) for i in range(100)}

    # overwrite: fewer tasks -> old shards must not survive
    df2 = spark.range(10).selectExpr("id", "id AS v").repartition(1)
    df2.write.format("unity_backup").option("path", path).mode("overwrite").save()
    parts2 = [f for f in sorted(os.listdir(path)) if f.startswith("part-")]
    assert len(parts2) == 1
    assert json.load(open(os.path.join(path, "_MANIFEST.json")))["total_rows"] == 10

    # overwrite never renumbers from zero: shard names always extend
    # past the highest prior index, so a crash mid-publication can
    # never clobber a file the live manifest still references — the
    # surviving shard is the one the manifest names
    man2 = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert [s["file"] for s in man2["shards"]] == parts2

    # append after overwrite must EXTEND: new shards number past the
    # existing ones, the manifest unions prior + new
    df3 = spark.range(5).selectExpr("id", "id AS v").repartition(1)
    df3.write.format("unity_backup").option("path", path).mode("append").save()
    parts3 = [f for f in sorted(os.listdir(path)) if f.startswith("part-")]
    assert len(parts3) == 2 and parts3[0] == parts2[0]
    assert int(parts3[1].split("-")[1].split(".")[0]) > int(
        parts3[0].split("-")[1].split(".")[0]
    )
    man3 = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert man3["total_rows"] == 15 and len(man3["shards"]) == 2
    assert [s["file"] for s in man3["shards"]] == parts3

    # a .staged leftover from a task that never returned a commit
    # message (failed/speculated) is swept by the next commit
    stray = os.path.join(path, ".staged-0rphan.jsonl.gz")
    with gzip.open(stray, "wt") as fh:
        fh.write("{}\n")
    spark.range(1).selectExpr("id", "id AS v").repartition(1).write.format(
        "unity_backup"
    ).option("path", path).mode("append").save()
    assert not os.path.exists(stray)

    # abort sweeps staged files and publishes nothing
    staged = os.path.join(path, ".staged-deadbeef.jsonl.gz")
    with gzip.open(staged, "wt") as fh:
        fh.write("{}\n")
    UnityBackupWriter(path, overwrite=False).abort(
        [_BackupCommit(staged=staged, rows=1)]
    )
    assert not os.path.exists(staged)
    assert len([f for f in os.listdir(path) if f.startswith("part-")]) == 3


def test_unity_backup_abort_before_any_write(tmp_path):
    """Regression (round-6 review): abort() can fire before any task
    created the target directory (upstream stage failure) — the staged
    sweep must not raise FileNotFoundError and mask the real error."""
    from ua2sql_spark.sources.datasource import UnityBackupWriter

    missing = str(tmp_path / "never-created")
    UnityBackupWriter(missing, overwrite=False).abort([])  # must not raise
    import os

    assert not os.path.exists(missing)
