"""Interleaved A/B: LSH verify-tier size gate (r15).

A = pre-change minhash_lsh_pairs (loaded from a worktree of commit
c326dbf via importlib under a private module name, so the baseline can
never silently drift from what actually shipped — the ADVICE r14
lesson about inline copies).
B = the production registry entry (current tree).

Alternating A,B,...; per-variant median over N rounds; result equality
asserted on the first round (sorted rows, exact). Usage:

    python scripts/r15_ab_lsh_gate.py [query] [rounds]

query in {x43, x101, x69}; default x43, 7 rounds.
"""
import importlib.util
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OLD_TREE = os.environ.get("UA2SQL_AB_OLD_TREE", "/tmp/r15_before")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

which = sys.argv[1] if len(sys.argv) > 1 else "x43"
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7

from pyspark.sql import functions as F  # noqa: E402

from ua2sql_spark.session import get_spark  # noqa: E402
from ua2sql_spark.registry import all_queries  # noqa: E402
from ua2sql_spark.catalog import load_table  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "old_dedup", os.path.join(OLD_TREE, "ua2sql_spark", "operators", "dedup.py")
)
old_dedup = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old_dedup)

spark = get_spark("r15-ab-lsh-gate")
spark.sparkContext.setLogLevel("ERROR")
specs = all_queries()

NAME = {
    "x43": "x43_minhash_lsh_neardup",
    "x101": "x101_minhash_fast_exact_tier",
    "x69": "x69_ngram_jaccard_neardup",
}[which]


def variant_b():
    return specs[NAME].fn(spark, SF_DIR)


def variant_a():
    # Same parameters as the registry entries (queries/dedup.py), old
    # operator implementation.
    if which == "x43":
        d = load_table(spark, SF_DIR, "documents")
        return old_dedup.minhash_lsh_pairs(
            d, id_col="doc_id", text_col="text", num_hashes=16,
            band_size=8, threshold=0.9, hash_family="md5",
        ).select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard"
        )
    if which == "x101":
        from ua2sql_spark.queries.dedup import _docs_with_reingest

        docs = _docs_with_reingest(spark, SF_DIR)
        return old_dedup.minhash_lsh_pairs(
            docs, id_col="doc_id", text_col="text", num_hashes=16,
            band_size=16, threshold=1.0, hash_family="xxhash64",
        ).select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard"
        )
    if which == "x69":
        from ua2sql_spark.functions.text import char_shingles
        from ua2sql_spark.queries.pipeline_ops import (
            _CG_BAND, _CG_HASHES, _CG_N, _CG_THRESHOLD,
        )

        d = load_table(spark, SF_DIR, "documents").filter(
            F.length("text") >= _CG_N
        )
        return old_dedup.minhash_lsh_pairs(
            d, id_col="doc_id", text_col="text", num_hashes=_CG_HASHES,
            band_size=_CG_BAND, threshold=_CG_THRESHOLD,
            tokenizer=lambda c: char_shingles(c, _CG_N), hash_family="md5",
        ).select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard"
        )
    raise SystemExit(f"unknown {which}")


def run(df):
    df.write.format("noop").mode("overwrite").save()


def rows(df):
    return sorted(tuple(r) for r in df.collect())


# x69's registry entry uses threshold 0.8? verify against actual spec
# params by comparing RESULTS, not assumptions: equality below fails
# loudly if the copied params drifted.
assert rows(variant_a()) == rows(variant_b()), "A/B results differ!"
print("results identical", flush=True)

run(variant_a())  # warm both plans
run(variant_b())
ta, tb = [], []
for i in range(rounds):
    t0 = time.perf_counter(); run(variant_a()); ta.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run(variant_b()); tb.append(time.perf_counter() - t0)
    print(f"round {i}: A {ta[-1]:.3f}  B {tb[-1]:.3f}", flush=True)
print(f"A(old) median {statistics.median(ta):.4f}  B(gate) median {statistics.median(tb):.4f}")
spark.stop()
