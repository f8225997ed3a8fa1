"""Scale-slope smoke (VERDICT r8 #5): measure the wall-time slope of
the most expensive queries from sf0.1 to a locally-tiled ~4x corpus and
assert near-linearity. This converts SCALE.md's partition-arithmetic
arguments into a measured number: a quadratic term or a data-dependent
constant-factor bomb shows up as a slope, not a story.

Opt-in (SPARK_GRAFT_SLOPE=1): the 4x build + 2x5 timed runs take
minutes and belong in a bench-adjacent lane, not the per-commit suite.

Tiling construction — the 4x corpus must scale SIZE without inventing
cross-copy structure the original didn't have:

* documents: copy k suffixes EVERY word with the copy index — a
  vocabulary bijection, so every within-copy similarity relation
  (shingles, minhash, word sets) is preserved exactly while copies
  share zero vocabulary (no artificial cross-copy near-dup pairs that
  would quadratically inflate LSH buckets and masquerade as engine
  superlinearity). doc_id offsets by a large stride so copies' id
  ranges are disjoint; the stride divides the ORIGINAL moduli in use
  (eval splits, centroid strides), so those copies replay the exact
  modular structure, while later rows with moduli the stride doesn't
  divide (x202/x206's 7/9/13/17 perturbation keys) still see ~N/m
  selected rows per copy — counts, and therefore timing slopes, are
  preserved statistically even though the selected id SET shifts.
* embeddings: copy k circularly shifts the vector by 16k dims —
  same-copy dot products are rotation-invariant (within-copy geometry
  identical), cross-copy cosines fall back to the random baseline.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from ua2sql_spark.catalog import load_table
from ua2sql_spark.registry import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 4
# Divisible by the sampling/centroid moduli the older slope rows use
# (powers of 10, 2, 5); NOT by x202/x206's 7/9/13/17 perturbation keys —
# for those only the per-copy selected-row COUNT matters (~N/m holds for
# any offset), not which ids are selected (ADVICE r11 #3).
STRIDE = 100_000_000
# Per-query slope gate = (work-model growth at 4x data) x 1.6 noise
# margin (VERDICT r8 #5 asks <= ~1.5x super-linearity vs the MODEL;
# the margin covers this box's measured +-15-45% sub-2s noise band).
# Work models:
# * x174 semdedup: centroids scale with N (stride rule), so cell count
#   grows 4x at constant cell SIZE -> pairwise work linear in N.
# * x178 k-means: K initial centroids also follow a stride rule, so
#   K grows 4x and Lloyd is Theta(N*K*d) -> 16x at 4x data. (First
#   slope run measured 8.0x - BETTER than the model - while the naive
#   reading of "4x data" would have called the same number a 2x
#   superlinearity. The model is the point of this table.)
# * x96 near-dup clusters: within-copy pair count scales 4x (the tiling
#   adds no cross-copy pairs), iteration count constant -> linear.
# * x138 PageRank / x155 calibration: edges/histograms linear.
# * x194 LSH-index probe (round 10): index build, batch probe, verify
#   and the prefix-tier truth contract are all within-copy (the vocab
#   bijection gives copies disjoint band hashes and prefix tokens, so
#   candidate/pair counts scale 4x, not 16x) -> linear. The fixture
#   cache keys on sf_dir, so both scales time the SAME (build-once +
#   probe) composition.
# * x198 IVF health report (round 11): the N x K assign lives in the
#   fixture BUILD (warm-up pays it once per sf_dir); the timed report
#   is an equi-join of the lists against broadcast centroids + one
#   groupBy -> linear in list rows.
# * x199 structured PII scrub (round 11): map-only projection
#   (regex extraction + per-candidate digit folds) -> linear.
# * x200 corpus version drift (round 11): the CoW commit sequence is
#   fixture-cached; the timed change feed diffs the changed files and
#   aggregates -> linear in changed rows.
# * x202 table reconcile (round 11): one full-outer equi-join on
#   doc_id (both sides derive from the tiled documents -> 4x) plus
#   map-side compares and one partial-agg fold -> linear.
# * x204 LSH index health (round 11): the index build (save + two
#   appends) is fixture-cached per sf_dir; the timed report is one
#   lists/ scan + two partial-agg folds -> linear in band rows (the
#   vocab bijection keeps copies' band hashes disjoint, so group
#   sizes don't inflate cross-copy).
# * x205 image dhash (round 11): hash minting is per-doc map work
#   (4x); the doc_id stride keeps within-pair structure intact per
#   copy and the 16-bit band join's candidate traffic stays tiny at
#   these corpus sizes -> linear.
SLOPE_QUERIES = {
    "x174_semdedup": 4 * 1.6,
    "x178_kmeans_lloyd": 16 * 1.6,
    "x96_neardup_clusters": 4 * 1.6,
    "x138_domain_pagerank": 4 * 1.6,
    "x155_pr_calibration": 4 * 1.6,
    "x194_lsh_index_probe": 4 * 1.6,
    "x198_ivf_health_report": 4 * 1.6,
    "x199_pii_structured_scrub": 4 * 1.6,
    "x200_corpus_version_drift": 4 * 1.6,
    "x202_table_reconcile": 4 * 1.6,
    "x204_lsh_index_health": 4 * 1.6,
    "x205_image_dhash_neardup": 4 * 1.6,
    # x206: change feed + semi-joins + keyed diff, all churn-bounded;
    # churn scales with the tiled corpus -> linear (commit sequence is
    # fixture-cached per sf_dir)
    "x206_incremental_reconcile": 4 * 1.6,
    # x203/x207 (round 12): rank stats over the now-TILED lineitem —
    # both reduce to per-value/cell counts first, so 4x rows over a
    # constant distinct-value domain must cost one 4x row scan; the
    # window/rank-map work is value-domain-bounded and does not grow.
    "x203_mann_whitney_u": 4 * 1.6,
    "x207_spearman_rank_corr": 4 * 1.6,
    # x201 (round 12): the commit sequence is fixture-cached per sf_dir
    # and the base table is a <=350-row customer slice — the timed work
    # is two bounded manifest reads + a tiny union, CONSTANT at any sf.
    # Bound = 1x model with a wider 2.5 margin: sub-second rows see the
    # box's +-45% noise band on BOTH numerator and denominator.
    "x201_snapshot_restore": 1 * 2.5,
    # x209 Kendall tau-b (round 13, VERDICT r12 #6): the doubled-rank
    # cell fold and the concordance grid self-join are VALUE-DOMAIN
    # bounded by claim (|quantity| x |discount| cells over the tiled
    # lineitem's CONSTANT distinct-value domain) — 4x rows must cost
    # one 4x row scan into cells and nothing more. This is the same
    # family whose x207 row caught the BIGINT overflow at this very
    # tile in r12; the slope row makes the quadratic hazard a measured
    # number.
    "x209_kendall_tau": 4 * 1.6,
    # x210 Benford (round 13): map-side first-digit projection + a
    # 9-row aggregate against pinned ppm literals -> one row scan,
    # linear.
    "x210_benford_digit_audit": 4 * 1.6,
    # x211 chi-squared (round 13): one row-scan to contingency cells
    # (<= |rf| x |ls| rows, constant domain under the tiling); margins
    # and contributions are grid-sized -> linear.
    "x211_chi_squared_independence": 4 * 1.6,
    # x212 snapshot layout health (round 13, gated from birth): the
    # six-slice fixture build is cached per sf_dir (warm-up pays it);
    # the timed report is one 6-row manifest read + one listStatus per
    # partition dir (3 dirs at ANY sf) -> CONSTANT, x201's sub-second
    # noise margin.
    "x212_snapshot_layout_health": 1 * 2.5,
    # x213 Mann-Kendall (round 13): reads ORDERS, which the tiling
    # symlinks (only lineitem/documents/embeddings scale) -> the month
    # fold and months²-bounded grid are IDENTICAL at both scales ->
    # constant, sub-second noise margin.
    "x213_mann_kendall_trend": 1 * 2.5,
    # x214 split-leakage audit (round 13): one fingerprint groupBy over
    # the tiled documents; the vocab bijection keeps copies' word sets
    # disjoint, so fingerprint groups never merge cross-copy and the
    # per-group arithmetic stays group-size-bounded -> linear.
    "x214_split_leakage_audit": 4 * 1.6,
    # x215/x216 (round 13): both read EVENTS, which the tiling symlinks
    # (only lineitem/documents/embeddings scale) -> constant at the 4x
    # tile, sub-second noise margin like the other constant rows.
    "x215_ohlc_downsample": 1 * 2.5,
    "x216_retention_cohorts": 1 * 2.5,
    # x217 (round 13): the two-table CoW build + both mutation commits
    # + the refresh are fixture-cached per sf_dir; the timed work is
    # the view read, the recompute join (tiled documents -> 4x) and a
    # per-source fold -> linear.
    "x217_ivm_join_view": 4 * 1.6,
    # x218 CIDR LPM enrich (round 14): reads EVENTS, which the tiling
    # symlinks -> constant at the 4x tile; the two broadcast route
    # joins are 30-row dims at any sf. Sub-second noise margin.
    "x218_cidr_route_enrich": 1 * 2.5,
    # x220 maintained-view cascade (round 14): the two-base build,
    # both view materializations and both refreshes are fixture-cached
    # per sf_dir; the timed work is the aggregate-view read (bucket
    # dirs), the from-scratch recompute join over the tiled documents
    # (4x) and the symmetric-difference folds -> linear, like x217.
    "x220_ivm_agg_cascade": 4 * 1.6,
    # x219 weighted median (round 14): lineitem tiles 4x and
    # l_extendedprice is near-unique, so the distinct (flag, value)
    # cell frame scales ~4x with the corpus -> one 4x row scan into
    # cells + a cell-sized window -> linear.
    "x219_weighted_median": 4 * 1.6,
}

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOPE") != "1",
    reason="slope smoke is opt-in: SPARK_GRAFT_SLOPE=1 (minutes of bench-class runtime)",
)


def _build_4x(spark, src_dir: str, dst_dir: str) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    for t in "region nation customer supplier part orders events".split():
        link = os.path.join(dst_dir, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(src_dir, f"{t}.parquet"), link)

    # lineitem tiles by plain row copies with offset keys and IDENTICAL
    # value columns: the rank-stats rows (x203/x207) reduce to
    # per-VALUE/CELL counts, so 4x rows over a CONSTANT distinct-value
    # domain is exactly their claimed linear regime — a slope above the
    # bound would mean the work secretly scales with something other
    # than the row scan (VERDICT r11 #7).
    li = load_table(spark, src_dir, "lineitem")
    li_copies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * STRIDE))
        for k in range(COPIES)
    ]
    out = li_copies[0]
    for c in li_copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst_dir, "lineitem.parquet")
    )

    docs = load_table(spark, src_dir, "documents")
    doc_copies = []
    for k in range(COPIES):
        c = docs.select(
            (F.col("doc_id") + F.lit(k * STRIDE)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit(str(k))),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        doc_copies.append(c)
    out = doc_copies[0]
    for c in doc_copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst_dir, "documents.parquet")
    )

    emb = load_table(spark, src_dir, "embeddings")
    dims = len(emb.select("embedding").first()["embedding"])
    emb_copies = []
    for k in range(COPIES):
        shift = (16 * k) % dims
        shifted = F.concat(
            F.slice(F.col("embedding"), shift + 1, dims - shift),
            F.slice(F.col("embedding"), 1, shift),
        )
        emb_copies.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * STRIDE)).alias("vec_id"),
                (shifted if shift else F.col("embedding")).alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            )
        )
    out = emb_copies[0]
    for c in emb_copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst_dir, "embeddings.parquet")
    )


def _timed(fn, n: int = 2) -> float:
    fn()  # warm-up: plan + codegen
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def test_expensive_queries_scale_near_linearly(spark, tmp_path_factory):
    big = str(tmp_path_factory.mktemp("sf4x"))
    _build_4x(spark, SF_DIR, big)
    specs = all_queries()
    slopes = {}
    for name in SLOPE_QUERIES:
        run = lambda d: specs[name].fn(spark, d).write.format("noop").mode(  # noqa: E731
            "overwrite"
        ).save()
        t1 = _timed(lambda: run(SF_DIR))
        t4 = _timed(lambda: run(big))
        slopes[name] = round(t4 / t1, 2)
        print(f"SLOPE {name}: {t1:.2f}s -> {t4:.2f}s  ratio {slopes[name]}")
    bad = {
        n: (s, SLOPE_QUERIES[n]) for n, s in slopes.items() if s > SLOPE_QUERIES[n]
    }
    assert not bad, f"slopes above work-model bound: {bad} | all: {slopes}"
