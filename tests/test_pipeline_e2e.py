"""End-to-end corpus pipeline (ua2sql_spark/pipeline.py): the composed
read -> NFC -> quality gate -> exact+near dedup -> pack -> WebDataset
chain, with the row-conservation invariant the export manifest must
satisfy (VERDICT r6 next-round #8 / r7 next-round #3)."""

from __future__ import annotations

import tarfile

from tests.conftest import SF_DIR  # noqa: F401  (fixture wiring)


def test_corpus_pipeline_conserves_rows(spark, tmp_path):
    from ua2sql_spark.pipeline import corpus_pipeline

    out = str(tmp_path / "wds")
    m = corpus_pipeline(spark, SF_DIR, out, n_shards=8)

    # monotone stage funnel, nothing vanishes unaccounted
    assert m["n_raw"] >= m["n_gated"] >= m["n_survivors"] > 0
    assert m["n_sequences"] > 0

    # THE invariant: every dedup survivor is exported exactly once
    assert m["n_exported"] == m["n_survivors"]
    assert sum(r["n_samples"] for r in m["manifest"]) == m["n_survivors"]

    # the tars really carry one .txt member per exported sample
    n_members = 0
    for r in m["manifest"]:
        with tarfile.open(r["path"]) as tar:
            names = tar.getnames()
            assert all(n.endswith(".txt") for n in names)
            n_members += len(names)
    assert n_members == m["n_survivors"]


def test_pipeline_is_deterministic(spark, tmp_path):
    """Same input -> same survivor set and identical shard manifests
    (sizes included: member order and mtimes are pinned)."""
    from ua2sql_spark.pipeline import corpus_pipeline

    m1 = corpus_pipeline(spark, SF_DIR, str(tmp_path / "a"), n_shards=4)
    m2 = corpus_pipeline(spark, SF_DIR, str(tmp_path / "b"), n_shards=4)
    k1 = sorted((r["shard"], r["n_samples"], r["n_bytes"]) for r in m1["manifest"])
    k2 = sorted((r["shard"], r["n_samples"], r["n_bytes"]) for r in m2["manifest"])
    assert k1 == k2 and m1["n_survivors"] == m2["n_survivors"]


def test_pipeline_cli_subcommand(spark, tmp_path, capsys):
    """`python -m ua2sql_spark pipeline <sf> <out> [shards]` runs the
    composed build and prints the stage-count record as one JSON line."""
    import json

    from ua2sql_spark.__main__ import main

    out = str(tmp_path / "cli_wds")
    rc = main(["pipeline", SF_DIR, out, "4"], spark=spark)
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_exported"] == rec["n_survivors"] > 0
    assert rec["n_shards"] == 4

    assert main(["pipeline"], spark=spark) == 1  # usage error path


def test_pipeline_empty_after_gate(spark, tmp_path):
    """A corpus whose every document fails the quality gate exports
    zero samples without erroring — the shard writer and the packing
    prefix-sum both tolerate empty input."""
    from ua2sql_spark.pipeline import corpus_pipeline

    # build a tiny sf-dir clone whose documents are all too short
    import os

    clone = tmp_path / "sfx"
    clone.mkdir()
    spark.createDataFrame(
        [(1, "a b", "en", "s"), (2, "c", "en", "s")],
        "doc_id bigint, text string, lang string, source string",
    ).write.parquet(str(clone / "documents.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        os.symlink(f"{SF_DIR}/{t}.parquet", clone / f"{t}.parquet")
    m = corpus_pipeline(spark, str(clone), str(tmp_path / "out"), n_shards=2)
    assert m["n_gated"] == m["n_survivors"] == m["n_exported"] == 0
