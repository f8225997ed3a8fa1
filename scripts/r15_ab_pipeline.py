"""Interleaved A/B: pipeline-internal job overlap (r15, guide §2.6).

A = pre-change corpus_pipeline loaded from the c326dbf worktree via
importlib (its `from ua2sql_spark...` imports resolve against the
CURRENT package, so both variants share every operator — the A/B
isolates the thread-pool overlap only).
B = production ua2sql_spark.pipeline.corpus_pipeline.

Each run writes a fresh scratch export dir (removed after). Result
metrics asserted identical on round 0 (manifest shard rows included).

Usage: python scripts/r15_ab_pipeline.py [rounds]
"""
import importlib.util
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OLD_TREE = os.environ.get("UA2SQL_AB_OLD_TREE", "/tmp/r15_before")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7

from ua2sql_spark.session import get_spark  # noqa: E402
from ua2sql_spark.pipeline import corpus_pipeline as pipe_b  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "old_pipeline", os.path.join(OLD_TREE, "ua2sql_spark", "pipeline.py")
)
old_pipeline = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old_pipeline)
pipe_a = old_pipeline.corpus_pipeline

spark = get_spark("r15-ab-pipeline")
spark.sparkContext.setLogLevel("ERROR")


def run(fn):
    scratch = tempfile.mkdtemp(prefix="ab_pipe_")
    try:
        t0 = time.perf_counter()
        m = fn(spark, SF_DIR, os.path.join(scratch, "wds"))
        return time.perf_counter() - t0, m
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_, ma = run(pipe_a)  # warm (plan/codegen) + capture metrics
_, mb = run(pipe_b)
ka = {k: ma[k] for k in ("n_raw", "n_gated", "n_survivors", "n_sequences", "n_exported")}
kb = {k: mb[k] for k in ("n_raw", "n_gated", "n_survivors", "n_sequences", "n_exported")}
assert ka == kb, f"metrics differ: {ka} vs {kb}"


def shard_key(rows):
    # path-independent manifest compare (each run exports into a fresh
    # scratch dir, so the path column necessarily differs)
    return sorted(
        tuple(sorted((k, v) for k, v in r.items() if "path" not in k))
        for r in rows
    )


assert shard_key(ma["manifest"]) == shard_key(mb["manifest"])
print("results identical:", ka, flush=True)

ta, tb = [], []
for i in range(rounds):
    da, _ = run(pipe_a); ta.append(da)
    db, _ = run(pipe_b); tb.append(db)
    print(f"round {i}: A {da:.3f}  B {db:.3f}", flush=True)
print(f"A(seq) median {statistics.median(ta):.4f}  B(overlap) median {statistics.median(tb):.4f}")
spark.stop()
