"""Deduplication operators: SURVEY.md §2.11 X1/X2 (exact, fingerprint,
MinHash-LSH, SimHash) over the ``documents`` table.

Everything is a DataFrame composition — explode/groupBy/join — with
md5/sha2 as the hash family so the DuckDB oracle can run the *identical*
algorithm (both engines produce identical lowercase hex digests, and
lexicographic MIN over uniformly-distributed hex strings is a valid
min-hash permutation).

Scale notes
-----------
* Exact dedup is one hash-groupBy: shuffle on the content hash, never on
  the raw text (project the hash first; at 100 TB raw-text shuffle is
  the classic mistake).
* MinHash-LSH candidates come from an equi-join on (band_no, band_hash)
  — no cross join anywhere; candidate volume is tunable via bands×rows.
* The re-ingest union in x41 mirrors the reference's at-least-once
  duplication semantics (ua2sql.py:274-278: crash between insert and
  checkpoint → duplicates): dedup-by-content-hash is the upgrade path
  (SURVEY §2.9 T4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ua2sql_spark.catalog import load_table
from ua2sql_spark.registry import query

# 2 bands of 8: P(candidate) ≈ 1-(1-J^8)^2 — steep around J≈0.9, so the
# verify stage sees ~J≥0.8 candidates only. This corpus is adversarially
# self-similar (tiny vocabulary, mean pairwise J≈0.6); wider bands are
# what keeps candidate volume ~linear in the true-duplicate count.
NUM_MINHASHES = 16
BAND_SIZE = 8
NUM_BANDS = NUM_MINHASHES // BAND_SIZE
JACCARD_THRESHOLD = 0.9
REINGEST_OFFSET = 1_000_000


def _band_ranges() -> list[tuple[int, list[int]]]:
    return [
        (b + 1, list(range(b * BAND_SIZE, (b + 1) * BAND_SIZE))) for b in range(NUM_BANDS)
    ]


def _docs_with_reingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ a simulated second ingest run that re-landed the even
    half under fresh surrogate ids (at-least-once duplication, T4)."""
    d = load_table(spark, sf_dir, "documents")
    reingest = d.filter(F.col("doc_id") % 2 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(REINGEST_OFFSET)
    )
    return d.unionByName(reingest)


_REINGEST_SQL = f"""
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {REINGEST_OFFSET} AS doc_id, text
        FROM documents WHERE doc_id % 2 = 0
"""


# ---------------------------------------------------------------------------
# X1: exact dedup by content hash — survivor = min doc_id per sha256(text).
# ---------------------------------------------------------------------------
@query(
    "x41_exact_dedup",
    oracle=f"""
    SELECT sha256(text) AS content_sha,
           MIN(doc_id) AS survivor_doc_id,
           COUNT(*) AS n_copies
    FROM ({_REINGEST_SQL})
    GROUP BY sha256(text)
    """,
)
def x41_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_reingest(spark, sf_dir)
    return (
        docs.select(F.sha2(F.col("text"), 256).alias("content_sha"), "doc_id")
        .groupBy("content_sha")
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# X1b: canonical fingerprint dedup — md5 of the sorted distinct word set;
# catches word-order permutations exact dedup misses. Emits only groups
# with >1 member (the actual duplicate families in the data).
# ---------------------------------------------------------------------------
@query(
    "x42_fingerprint_dedup",
    oracle="""
    SELECT fingerprint, n_docs, first_doc_id, last_doc_id FROM (
        SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                   AS fingerprint,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS first_doc_id,
               MAX(doc_id) AS last_doc_id
        FROM documents
        GROUP BY 1
    ) WHERE n_docs > 1
    """,
)
def x42_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fingerprint = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), " ")
    )
    return (
        d.select(fingerprint.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# X2: MinHash + LSH near-dup pairs.
#   shingle→minhash: h_j(doc) = MIN(md5('<j>|' || word)) over distinct words
#   band→bucket:     band hash = md5(h0||h1||h2||h3), md5(h4||...||h7)
#   bucket-join:     equi-join on (band_no, band_hash), doc_a < doc_b
#   verify:          exact word-set Jaccard ≥ 0.9
# Identical algorithm in the oracle — a deterministic approximation,
# exactly mirrored (candidate recall is the LSH's, not ground truth's).
# ---------------------------------------------------------------------------
from ua2sql_spark.functions.text import sql_minhash_exprs

_SQL_MINHASH = sql_minhash_exprs("word", NUM_MINHASHES)


_X43_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word FROM documents
    ),
    mh AS (
        SELECT doc_id,
               {', '.join(_SQL_MINHASH)}
        FROM w GROUP BY doc_id
    ),
    bands AS (
        {' UNION ALL '.join(
            f"SELECT doc_id, {no} AS band_no,"
            f" md5(concat_ws('|', {', '.join(f'h{j}' for j in js)})) AS band_hash FROM mh"
            for no, js in _band_ranges()
        )}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_no = b.band_no AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    ),
    sets AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents
    )
    SELECT doc_a, doc_b, jaccard FROM (
        SELECT doc_a, doc_b,
               CAST(len(list_intersect(x.ws, y.ws)) AS DOUBLE)
                   / len(list_distinct(list_concat(x.ws, y.ws))) AS jaccard
        FROM cand
        JOIN sets x ON doc_a = x.doc_id
        JOIN sets y ON doc_b = y.doc_id
    ) WHERE jaccard >= {JACCARD_THRESHOLD}
    """


@query("x43_minhash_lsh_neardup", oracle=_X43_ORACLE)
def x43_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d,
        id_col="doc_id",
        text_col="text",
        num_hashes=NUM_MINHASHES,
        band_size=BAND_SIZE,
        threshold=JACCARD_THRESHOLD,
        hash_family="md5",  # pinned: the DuckDB oracle replays these digests
    ).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard"
    )


# ---------------------------------------------------------------------------
# X2b: SimHash — 16-bit signature from per-word md5 digests; documents
# sharing a signature are near-dup candidates. The bit arithmetic is the
# same scalar SQL in both engines (instr-based hex-digit decode).
# ---------------------------------------------------------------------------
def _simhash_bit_sql(k: int, shift_op: str) -> str:
    """Contribution of bit k (0..15): +1 if bit set in the word's digest
    nibble, else -1. shift_op differs: Spark `shiftright`, DuckDB `>>`."""
    pos = k // 4 + 1  # hex digit position (1-based)
    bit = k % 4
    digit_val = f"(instr('0123456789abcdef', substring(md5(word), {pos}, 1)) - 1)"
    if shift_op == "spark":
        bit_expr = f"(shiftright({digit_val}, {bit}) & 1)"
    else:
        bit_expr = f"(({digit_val} >> {bit}) & 1)"
    return f"SUM(2 * {bit_expr} - 1)"


_SIMHASH_ASSEMBLE = " + ".join(
    f"(CASE WHEN s{k} >= 0 THEN {1 << k} ELSE 0 END)" for k in range(16)
)


@query(
    "x44_simhash",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word FROM documents
    ),
    sums AS (
        SELECT doc_id,
               {', '.join(f"{_simhash_bit_sql(k, 'duckdb')} AS s{k}" for k in range(16))}
        FROM w GROUP BY doc_id
    ),
    sig AS (
        SELECT doc_id, CAST({_SIMHASH_ASSEMBLE} AS BIGINT) AS simhash16 FROM sums
    )
    SELECT doc_id, simhash16,
           COUNT(*) OVER (PARTITION BY simhash16) AS cluster_size
    FROM sig
    """,
)
def x44_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("word")
    )
    sums = words.groupBy("doc_id").agg(
        *[F.expr(_simhash_bit_sql(k, "spark")).alias(f"s{k}") for k in range(16)]
    )
    sig = sums.select("doc_id", F.expr(_SIMHASH_ASSEMBLE).cast("bigint").alias("simhash16"))
    return sig.withColumn(
        "cluster_size", F.count(F.lit(1)).over(Window.partitionBy("simhash16"))
    )


# ---------------------------------------------------------------------------
# X2e: near-dup DEDUP (survivor selection) — the scale-path variant of
# x43: instead of materializing the quadratic pair list, drop every doc
# with a verified near-duplicate of smaller id. Output is the surviving
# corpus per language (compact, linear).
# ---------------------------------------------------------------------------
@query(
    "x81_neardup_dedup",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word FROM documents
    ),
    mh AS (
        SELECT doc_id,
               {', '.join(_SQL_MINHASH)}
        FROM w GROUP BY doc_id
    ),
    bands AS (
        {' UNION ALL '.join(
            f"SELECT doc_id, {no} AS band_no,"
            f" md5(concat_ws('|', {', '.join(f'h{j}' for j in js)})) AS band_hash FROM mh"
            for no, js in _band_ranges()
        )}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_no = b.band_no AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    ),
    sets AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents
    ),
    dropped AS (
        SELECT DISTINCT doc_b FROM (
            SELECT doc_a, doc_b,
                   CAST(len(list_intersect(x.ws, y.ws)) AS DOUBLE)
                       / len(list_distinct(list_concat(x.ws, y.ws))) AS jaccard
            FROM cand
            JOIN sets x ON doc_a = x.doc_id
            JOIN sets y ON doc_b = y.doc_id
        ) WHERE jaccard >= {JACCARD_THRESHOLD}
    )
    SELECT lang, COUNT(*) AS n_survivors, MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM documents
    WHERE doc_id NOT IN (SELECT doc_b FROM dropped)
    GROUP BY lang
    """,
)
def x81_neardup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.operators.dedup import neardup_dedup

    d = load_table(spark, sf_dir, "documents")
    survivors = neardup_dedup(
        d,
        id_col="doc_id",
        text_col="text",
        num_hashes=NUM_MINHASHES,
        band_size=BAND_SIZE,
        threshold=JACCARD_THRESHOLD,
        hash_family="md5",  # pinned: the DuckDB oracle replays these digests
    )
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_survivors"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


# ---------------------------------------------------------------------------
# X2c: transitive near-dup clusters — connected components over the
# verified LSH pair graph (operators/components.py). Near-duplication
# is not transitive; corpus dedup needs the transitive closure or
# chained families (A~B~C) keep multiple members. Component label =
# min doc_id in the family (deterministic).
#
# The oracle computes the same closure with a recursive CTE over the
# identical pair list — a full-strength differential check of an
# iterative distributed algorithm.
# ---------------------------------------------------------------------------
@query(
    "x96_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS (
        SELECT doc_a, doc_b FROM ({_X43_ORACLE})
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach AS (
        SELECT DISTINCT a AS v, a AS r FROM edges
        UNION
        SELECT e.b AS v, reach.r AS r FROM reach JOIN edges e ON reach.v = e.a
    )
    SELECT v AS doc_id, MIN(r) AS component FROM reach GROUP BY v
    """,
)
def x96_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.operators.components import connected_components
    from ua2sql_spark.operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d,
        id_col="doc_id",
        text_col="text",
        num_hashes=NUM_MINHASHES,
        band_size=BAND_SIZE,
        threshold=JACCARD_THRESHOLD,
        hash_family="md5",  # pinned: the DuckDB oracle replays these digests
    )
    return connected_components(pairs, "id_a", "id_b").select(
        F.col("vertex").alias("doc_id"), "component"
    )


# ---------------------------------------------------------------------------
# X2 production hash family: xxhash64 minhash+LSH, oracle-checked on the
# exact-set tier. The md5 family (x43) exists because DuckDB can replay
# md5; xxhash64 it cannot — but at threshold=1.0 LSH recall is exactly 1
# under ANY hash family (identical token sets ⇒ identical signatures ⇒
# same bucket in every band) and the verify stage computes exact Jaccard,
# so the expected output is hash-independent: precisely the pairs with
# identical word sets. That makes the fast path hard-verifiable: the
# oracle joins on the canonical word-set fingerprint and never touches a
# hash the two engines could disagree on.
# ---------------------------------------------------------------------------
@query(
    "x101_minhash_fast_exact_tier",
    oracle=f"""
    WITH corpus AS ({_REINGEST_SQL}),
    fp AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                   AS f
        FROM corpus
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(1.0 AS DOUBLE) AS jaccard
    FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
    """,
)
def x101_minhash_fast_exact_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs_with_reingest(spark, sf_dir)
    return minhash_lsh_pairs(
        docs,
        id_col="doc_id",
        text_col="text",
        num_hashes=NUM_MINHASHES,
        # One band of ALL 16 hashes: at threshold=1.0 banding adds no
        # recall (identical sets agree on the FULL signature), it only
        # admits J<1 false candidates into the verify stage — a single
        # full-signature band shrinks buckets to near-exact groups.
        band_size=NUM_MINHASHES,
        threshold=1.0,
        hash_family="xxhash64",
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard")


# ---------------------------------------------------------------------------
# Fast-family clusters: the ENTIRE production pipeline — xxhash64
# minhash → full-signature LSH → exact-Jaccard verify → distributed
# connected components — hard-verified on the exact-set tier. Identical
# word sets form cliques with recall 1 under any hash family, and
# components of a union of cliques are just the fingerprint groups, so
# the oracle is a plain min-per-group over word-set fingerprints: no
# hash either engine could disagree on, yet every stage of the fast
# path (signatures, banding, verify, label propagation) must be right
# for the output to match.
# ---------------------------------------------------------------------------
@query(
    "x115_neardup_clusters_fast",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                   AS f
        FROM ({_REINGEST_SQL})
    )
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY f) AS component
    FROM fp
    WHERE f IN (SELECT f FROM fp GROUP BY f HAVING COUNT(*) > 1)
    """,
)
def x115_neardup_clusters_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.operators.components import connected_components
    from ua2sql_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs_with_reingest(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        docs,
        id_col="doc_id",
        text_col="text",
        num_hashes=NUM_MINHASHES,
        band_size=NUM_MINHASHES,  # one full-signature band (see x101)
        threshold=1.0,
        hash_family="xxhash64",
    )
    return connected_components(pairs, "id_a", "id_b").select(
        F.col("vertex").alias("doc_id"), "component"
    )


# ---------------------------------------------------------------------------
# Incremental dedup (x117): the production daily path — dedup a NEW
# batch against the historical corpus without rescanning it. The
# history side is a fingerprint INDEX (hash + survivor id only, never
# text): within-batch dedup is one fingerprint groupBy; cross-corpus
# dedup is one anti-join keyed on the fingerprint. At 100 TB the index
# is ~50 B/doc — three orders of magnitude smaller than the corpus —
# and the day's batch, not the history, drives the join's work. Here
# odd doc_ids play the indexed history and even doc_ids the new batch.
# ---------------------------------------------------------------------------
@query(
    "x117_incremental_dedup",
    oracle="""
    WITH fp AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                   AS f
        FROM documents
    ),
    index_side AS (SELECT DISTINCT f FROM fp WHERE doc_id % 2 = 1),
    batch AS (
        SELECT f, MIN(doc_id) AS doc_id, COUNT(*) AS n_batch_copies
        FROM fp WHERE doc_id % 2 = 0 GROUP BY f
    )
    SELECT doc_id, n_batch_copies
    FROM batch WHERE f NOT IN (SELECT f FROM index_side)
    """,
)
def x117_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fingerprint = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), " ")
    )
    fp = d.select("doc_id", fingerprint.alias("f"))
    index_side = fp.filter(F.col("doc_id") % 2 == 1).select("f").distinct()
    batch = (
        fp.filter(F.col("doc_id") % 2 == 0)
        .groupBy("f")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_batch_copies"),
        )
    )
    return batch.join(index_side, "f", "left_anti").select("doc_id", "n_batch_copies")


# ---------------------------------------------------------------------------
# x141: SPAN-level dedup — the C4/CCNet sub-document technique: exact
# dedup at whole-document granularity (x41) misses boilerplate
# repeated INSIDE otherwise-distinct documents, so production corpora
# also dedup fixed word-window spans corpus-wide, keeping only each
# span's first occurrence (deterministic (doc_id, block) order) and
# reassembling documents from their surviving blocks. One explode
# (blocks carry only (doc_id, block_idx, span)), ONE shuffle on the
# span string for the first-occurrence window, one groupBy doc to
# reassemble — the span shuffle is the natural key and its fan-in per
# span is the duplication factor, never |docs|. At 100 TB the span
# string would be replaced by its xxhash64 (the x101 discipline);
# the md5-free plan here keeps the oracle replayable verbatim.
# ---------------------------------------------------------------------------
_SPAN_WORDS = 10


@query(
    "x141_span_dedup",
    oracle=f"""
    WITH blocks AS (
        SELECT doc_id, b,
               array_to_string(w[(b * {_SPAN_WORDS} + 1):((b + 1) * {_SPAN_WORDS})], ' ') AS span
        FROM (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ), unnest(range(0, CAST(CEIL(len(w) / {_SPAN_WORDS}.0) AS BIGINT))) AS t(b)
    ),
    kept AS (
        SELECT doc_id, b, span FROM blocks
        QUALIFY ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, b) = 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(CEIL(len(string_split(d.text, ' ')) / {_SPAN_WORDS}.0) AS BIGINT) AS n_blocks,
           COALESCE(k.clean_md5, md5('')) AS clean_md5
    FROM documents d
    LEFT JOIN (
        SELECT doc_id, COUNT(*) AS n_kept,
               md5(string_agg(span, ' ' ORDER BY b)) AS clean_md5
        FROM kept GROUP BY doc_id
    ) k ON k.doc_id = d.doc_id
    """,
)
def x141_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ua2sql_spark.functions.arrays import let

    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n_blocks = F.ceil(F.size(w) / float(_SPAN_WORDS)).cast("bigint")
    # let-bound: the per-block lambda slices the BOUND word array — the
    # naive form re-ran split once per block per row
    block_structs = let(
        w,
        lambda ws: F.transform(
            F.sequence(
                F.lit(0), F.ceil(F.size(ws) / float(_SPAN_WORDS)).cast("bigint") - 1
            ),
            lambda b: F.struct(
                b.alias("b"),
                F.array_join(
                    F.slice(ws, b * _SPAN_WORDS + 1, _SPAN_WORDS), " "
                ).alias("span"),
            ),
        ),
    )
    blocks = d.select(
        "doc_id",
        F.explode(block_structs).alias("blk"),
    ).select("doc_id", F.col("blk.b").alias("b"), F.col("blk.span").alias("span"))
    first = Window.partitionBy("span").orderBy("doc_id", "b")
    kept = (
        blocks.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("b", "span"))),
                    lambda s: s["span"],
                ),
                " ",
            )
        ).alias("clean_md5"),
    )
    return (
        d.select("doc_id", n_blocks.alias("n_blocks"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            "n_blocks",
            F.coalesce(F.col("clean_md5"), F.md5(F.lit(""))).alias("clean_md5"),
        )
    )


# ---------------------------------------------------------------------------
# x142: content-defined chunking (CDC) — the insertion-robust
# complement to x141's fixed blocks: chunk boundaries are a pure
# function of LOCAL content (a 4-gram hash hitting a 1/64 pattern), so
# inserting one word shifts at most the two chunks around the edit
# while fixed blocks shift EVERY downstream block. This is the
# FastCDC/rsync discipline applied to corpus text: chunk fingerprints
# feed the same first-occurrence / incremental-index machinery as
# x41/x117 at sub-document granularity. Map-only until the single
# chunk-duplication aggregate; the boundary predicate here is a
# replayable md5-of-4-gram so the oracle mirrors it verbatim — at
# 100 TB the per-position digest becomes a gear/rolling hash inside
# one mapInPandas pass (same plumbing, cheaper constant).
# ---------------------------------------------------------------------------
_CDC_W = 4  # boundary window (chars)
_CDC_PAT = ("00", "40", "80", "c0")  # 4/256 -> mean chunk ~64 chars


@query(
    "x142_cdc_chunks",
    oracle=f"""
    WITH bounds AS (
        SELECT doc_id, text,
               list_filter(range(1, len(text) - {_CDC_W - 2}),
                           i -> substr(md5(substr(text, CAST(i AS INTEGER), {_CDC_W})), 1, 2)
                                IN {_CDC_PAT}) AS cuts
        FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               md5(substr(text,
                          CAST(p[j] + 1 AS INTEGER),
                          CAST(p[j + 1] - p[j] AS INTEGER))) AS chunk_md5,
               p[j + 1] - p[j] AS chunk_len
        FROM (
            SELECT doc_id, text,
                   list_prepend(0, list_append(cuts, len(text))) AS p
            FROM bounds
        ), unnest(range(1, len(p))) AS t(j)
        WHERE p[j + 1] > p[j]
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(MIN(chunk_len) AS BIGINT) AS min_chunk,
           CAST(MAX(chunk_len) AS BIGINT) AS max_chunk,
           md5(string_agg(chunk_md5, '' ORDER BY chunk_md5)) AS chunks_fp
    FROM chunks
    GROUP BY doc_id
    """,
)
def x142_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    t = F.col("text")
    # Guard: Spark's sequence(1, n) DESCENDS for n < 1 (unlike DuckDB's
    # empty range), so texts shorter than the boundary window must get
    # an explicitly empty cut list — they become one whole-text chunk.
    positions = F.when(
        F.length(t) >= _CDC_W,
        F.sequence(F.lit(1), F.length(t) - (_CDC_W - 1)),
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.filter(
        positions,
        lambda i: F.substring(F.md5(t.substr(i, F.lit(_CDC_W))), 1, 2).isin(
            *_CDC_PAT
        ),
    )
    with_p = d.select(
        "doc_id",
        "text",
        F.concat(
            F.array(F.lit(0)), cuts, F.array(F.length(t))
        ).alias("p"),
    )
    chunks = with_p.select(
        "doc_id",
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.size("p") - 1),
                    lambda j: F.struct(
                        F.md5(
                            F.col("text").substr(
                                F.element_at(F.col("p"), j) + 1,
                                F.element_at(F.col("p"), j + 1)
                                - F.element_at(F.col("p"), j),
                            )
                        ).alias("chunk_md5"),
                        (
                            F.element_at(F.col("p"), j + 1)
                            - F.element_at(F.col("p"), j)
                        ).alias("chunk_len"),
                    ),
                ),
                lambda s: s["chunk_len"] > 0,
            )
        ).alias("c"),
    ).select("doc_id", F.col("c.chunk_md5"), F.col("c.chunk_len"))
    return chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.min("chunk_len").cast("bigint").alias("min_chunk"),
        F.max("chunk_len").cast("bigint").alias("max_chunk"),
        F.md5(F.array_join(F.array_sort(F.collect_list("chunk_md5")), "")).alias(
            "chunks_fp"
        ),
    )


# ---------------------------------------------------------------------------
# X1i: duplication-degree histogram — the dedup AUDIT readout: for each
# cluster size k, how many exact-duplicate clusters have exactly k
# members, what fraction of rows they hold, and how many rows dedup
# would delete. The one-table summary a curation run reports before
# committing a dedup pass ("1.9% of the corpus sits in 2-copy
# clusters") — cheap enough to run on every ingest.
#
# Scale shape: the sha-groupBy is the SAME single shuffle as x41; the
# second aggregate runs on cluster-count-bounded data and the output is
# |distinct k| rows. Fractions are exact integer ratios rounded at 6dp.
# ---------------------------------------------------------------------------


@query(
    "x164_dup_size_histogram",
    oracle=f"""
    WITH clusters AS (
        SELECT sha256(text) AS h, CAST(COUNT(*) AS BIGINT) AS k
        FROM ({_REINGEST_SQL})
        GROUP BY sha256(text)
    ),
    tot AS (SELECT CAST(SUM(k) AS BIGINT) AS n_rows FROM clusters)
    SELECT k AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) * k AS BIGINT) AS n_rows,
           ROUND(CAST(COUNT(*) * k AS DOUBLE) / MAX(tot.n_rows), 6)
               AS row_fraction,
           CAST(COUNT(*) * (k - 1) AS BIGINT) AS rows_removed_by_dedup
    FROM clusters, tot
    GROUP BY k
    ORDER BY k
    """,
)
def x164_dup_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_reingest(spark, sf_dir)
    # cluster-bounded rows, reused by the total and the histogram —
    # materialize once instead of re-running the sha shuffle twice
    clusters = (
        docs.select(F.sha2(F.col("text"), 256).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint()
    )
    tot = clusters.agg(F.sum("k").alias("n_rows"))
    return (
        clusters.crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            (F.count(F.lit(1)) * F.col("k").cast("bigint")).alias("_nr"),
            F.max("n_rows").alias("_tot"),
        )
        .select(
            F.col("k").alias("cluster_size"),
            "n_clusters",
            F.col("_nr").alias("n_rows"),
            F.round(F.col("_nr").cast("double") / F.col("_tot"), 6).alias(
                "row_fraction"
            ),
            (F.col("n_clusters") * (F.col("k") - 1)).cast("bigint").alias(
                "rows_removed_by_dedup"
            ),
        )
        .orderBy("cluster_size")
    )


# ---------------------------------------------------------------------------
# X2h: EXACT set-similarity join via prefix filtering (PPJoin family,
# Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08) — the deterministic
# complement of the MinHash-LSH tier: LSH trades recall for speed
# probabilistically; the prefix filter is a LOSSLESS candidate pruner,
# so the join returns EXACTLY the pairs with Jaccard >= t. The oracle
# deliberately brute-forces all pairs with no filter — a driver-gated
# recall-1.0 contract for the pruning, not a replay of it.
#
# Filter soundness: order every token set by global rarity (df ASC,
# token ASC — rarest first); if J(a,b) >= t then |a∩b| >= ceil(t·|s|)
# for each side s, so two sets whose first |s| - ceil(t·|s|) + 1
# tokens are disjoint cannot qualify — candidates only need to share a
# PREFIX token. All threshold arithmetic is integer (ceil(19s/20) =
# (19s+19)//20, verify 20·|∩| >= 19·|∪|), so there is no float-epsilon
# soundness hole on either engine.
#
# Scale shape: candidate fan-in per token is its df restricted to
# prefixes — frequent tokens almost never land in a rarest-first
# prefix, which is the whole trick; the size-compatibility bound
# (20·min >= 19·max) prunes inside the join condition before the
# distinct. Verification joins are per-candidate array intersections,
# never all-pairs. df table is |vocab|-bounded and broadcast.
# ---------------------------------------------------------------------------
_PSJ_NUM, _PSJ_DEN = 19, 20  # Jaccard threshold 0.95 as an exact rational


@query(
    "x179_prefix_simjoin",
    oracle=f"""
    WITH sets AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS gs
        FROM documents
    )
    SELECT doc_a, doc_b, ROUND(CAST(i AS DOUBLE) / u, 6) AS jaccard FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.gs, b.gs)) AS i,
               len(list_distinct(list_concat(a.gs, b.gs))) AS u
        FROM sets a JOIN sets b ON a.doc_id < b.doc_id
    ) WHERE {_PSJ_DEN} * i >= {_PSJ_NUM} * u
    ORDER BY doc_a, doc_b
    """,
)
def x179_prefix_simjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    verified = _prefix_truth(spark, sf_dir)
    return verified.select(
        "doc_a",
        "doc_b",
        F.round(F.col("i").cast("double") / F.col("u"), 6).alias("jaccard"),
    ).orderBy("doc_a", "doc_b")


def _prefix_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact prefix-similarity truth tier (doc_a, doc_b, i, u) as a
    shared per-(process, testdata) artifact (VERDICT r10 #3): x179
    emits it, x181 and x194 measure recall against it, and each used to
    recompute the same lossless join over the same ``documents`` bytes
    (~25 s of the r10 gated window spent proving one fact three times).
    The pair set is a pure function of ``documents``, so it rides the
    x186/x190 ``fixture_artifact`` precedent: the driver's fresh
    process still builds it exactly once (first-run path and hashes
    unchanged); only repeat invocations in one process read the
    materialized parquet."""
    from ua2sql_spark.queries.common import fixture_artifact

    def build(path: str) -> None:
        _prefix_sim_pairs(load_table(spark, sf_dir, "documents")).write.mode(
            "overwrite"
        ).parquet(path)

    path = fixture_artifact(spark, sf_dir, "psjtruth", "documents", build)
    return spark.read.parquet(path)


def _prefix_sim_pairs(d: DataFrame) -> DataFrame:
    """The x179 core, shared with x181's truth side: EXACT Jaccard >=
    NUM/DEN word-set pairs via lossless prefix filtering; returns
    (doc_a, doc_b, i, u)."""
    from pyspark.sql import Window

    sets = (
        d.select("doc_id", F.array_distinct(F.split("text", " ")).alias("gs"))
        # documents is a handful of parquet files — spread the explode/
        # window/verify work across executors before three passes reuse it
        .repartition(32, "doc_id")
        .localCheckpoint(eager=False)
    )
    toks = sets.select("doc_id", F.explode("gs").alias("tok"))
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    sized = toks.join(
        sets.select("doc_id", F.size("gs").alias("s")), "doc_id"
    ).join(F.broadcast(dfreq), "tok")
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    # prefix length pi = s - ceil(t*s) + 1, all-integer ceil
    pi = (
        F.col("s")
        - ((F.lit(_PSJ_NUM) * F.col("s") + (_PSJ_DEN - 1)) / _PSJ_DEN).cast("long")
        + 1
    )
    prefix = (
        sized.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= pi)
        .select("doc_id", "tok", "s")
        .localCheckpoint(eager=False)
    )
    a = prefix.select(
        F.col("doc_id").alias("doc_a"), "tok", F.col("s").alias("sa")
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"), F.col("tok").alias("tok_b"),
        F.col("s").alias("sb"),
    )
    cand = (
        a.join(
            b,
            (F.col("tok") == F.col("tok_b"))
            & (F.col("doc_a") < F.col("doc_b"))
            & (
                F.lit(_PSJ_DEN) * F.least("sa", "sb")
                >= F.lit(_PSJ_NUM) * F.greatest("sa", "sb")
            ),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    ga = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("gs").alias("ga"),
        F.size("gs").alias("__sa"),
    )
    gb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("gs").alias("gb"),
        F.size("gs").alias("__sb"),
    )
    # u = |A∪B| = |A| + |B| - |A∩B| exactly (gs is array_distinct), so
    # the per-candidate array_union — a second hash-set build plus a
    # materialized concat array — disappears; i and the emitted u are
    # the same integers as before. The threshold DEN·i ≥ NUM·u is
    # rearranged over u = sa+sb-i into (DEN+NUM)·i ≥ NUM·(sa+sb) —
    # exact integer algebra — so that when Catalyst pushes the filter
    # into the join condition (it inlines the aliases), the condition
    # references array_intersect ONCE, not twice; survivors pay one
    # more intersect in the output projection of i and u.
    verified = (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ga", "gb")).alias("i"),
            (F.col("__sa") + F.col("__sb")).alias("__s"),
        )
        .filter(
            F.lit(_PSJ_DEN + _PSJ_NUM) * F.col("i")
            >= F.lit(_PSJ_NUM) * F.col("__s")
        )
        .select(
            "doc_a", "doc_b", "i", (F.col("__s") - F.col("i")).alias("u")
        )
    )
    return verified


# ---------------------------------------------------------------------------
# X2i: LSH recall contract — the dedup family's quality gate, mirroring
# what x121/x133/x154 do for retrieval: the banded-MinHash tier's
# recall is MEASURED against the exact prefix-filter tier (x179, a
# lossless join, so its output IS ground truth) and gated as a bit.
# Theory for 16 hashes / 2 bands of 8 at s≈0.95: 1-(1-s^8)^2 ≈ 0.886;
# observed 0.83–0.86 on this corpus — the gate (10·hits ≥ 7·truth)
# leaves margin for per-round data regeneration while still catching a
# banding/seed/tokenizer regression that silently drops recall.
#
# The intersection is an explicit semi-join of LSH pairs against the
# integer-thresholded truth set, so no float-boundary equivalence
# argument is needed anywhere. Both counts are exact integers; recall
# is one double division. Scale: truth = x179's prefix-filter plan,
# LSH = x43's banded plan, intersection keyed on the (small) pair sets.
# ---------------------------------------------------------------------------
@query(
    "x181_lsh_recall_contract",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
        FROM documents
    ),
    mh AS (
        SELECT doc_id, {', '.join(_SQL_MINHASH)} FROM w GROUP BY doc_id
    ),
    bands AS (
        {' UNION ALL '.join(
            f"SELECT doc_id, {no} AS band_no,"
            f" md5(concat_ws('|', {', '.join(f'h{j}' for j in js)})) AS band_hash FROM mh"
            for no, js in _band_ranges()
        )}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_no = b.band_no AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    ),
    sets AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents
    ),
    truth AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sets a JOIN sets b ON a.doc_id < b.doc_id
         AND {_PSJ_DEN} * len(list_intersect(a.ws, b.ws))
             >= {_PSJ_NUM} * len(list_distinct(list_concat(a.ws, b.ws)))
    ),
    hit AS (SELECT * FROM truth SEMI JOIN cand USING (doc_a, doc_b)),
    n AS (
        SELECT (SELECT COUNT(*) FROM truth) AS n_true,
               (SELECT COUNT(*) FROM hit) AS n_hits
    )
    SELECT CAST(n_true AS BIGINT) AS n_true,
           CAST(n_hits AS BIGINT) AS n_lsh_hits,
           ROUND(CAST(n_hits AS DOUBLE) / n_true, 6) AS recall,
           CAST(CASE WHEN 10 * n_hits >= 7 * n_true THEN 1 ELSE 0 END AS INT)
               AS meets_bound
    FROM n
    """,
)
def x181_lsh_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    truth = _prefix_truth(spark, sf_dir).select("doc_a", "doc_b")
    # threshold 19/20 as a double == the 0.95 literal; the filter only
    # trims LSH candidates below the bar, the semi-join against the
    # integer-defined truth decides what counts as a hit
    lsh = minhash_lsh_pairs(
        d,
        id_col="doc_id",
        text_col="text",
        num_hashes=NUM_MINHASHES,
        band_size=BAND_SIZE,
        threshold=_PSJ_NUM / _PSJ_DEN,
        hash_family="md5",  # pinned: the oracle replays these digests
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    n_hits = lsh.join(truth, ["doc_a", "doc_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_lsh_hits")
    )
    return (
        n_true.crossJoin(F.broadcast(n_hits))
        .select(
            F.col("n_true").cast("bigint").alias("n_true"),
            F.col("n_lsh_hits").cast("bigint").alias("n_lsh_hits"),
            F.round(
                F.col("n_lsh_hits").cast("double") / F.col("n_true"), 6
            ).alias("recall"),
            F.when(
                F.lit(10) * F.col("n_lsh_hits") >= F.lit(7) * F.col("n_true"), 1
            )
            .otherwise(0)
            .cast("int")
            .alias("meets_bound"),
        )
    )


# ---------------------------------------------------------------------------
# X2j: persisted-LSH-index probe (VERDICT r9 #6) — the daily-ingest
# near-dup shape at 100 TB. x117 dedups a new batch against a
# fingerprint index but only EXACT duplicates; near-dup against history
# previously re-minted signatures for the whole corpus every run. Here
# the history's band rows are materialized ONCE
# (operators/dedup.save_lsh_index: hive-partitioned by (band_no,
# band_bucket)), the batch probes only its own buckets
# (partition-pruned scan, plan-pinned in tests/test_plans.py), and the
# candidates go through the exact-Jaccard verify tier. The driver gate
# mirrors x181's recall-contract pattern: truth = the lossless
# prefix-filter tier restricted to cross (history x batch) pairs;
# hits = verified probe candidates (verified => hits ⊆ truth, so the
# count needs no float-boundary argument); all-integer bound
# 10·hits ≥ 7·truth. History = doc_id % 4 != 0, batch = doc_id % 4 == 0.
# md5 family so DuckDB replays the identical band digests.
# ---------------------------------------------------------------------------
@query(
    "x194_lsh_index_probe",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
        FROM documents
    ),
    mh AS (
        SELECT doc_id, {', '.join(_SQL_MINHASH)} FROM w GROUP BY doc_id
    ),
    bands AS (
        {' UNION ALL '.join(
            f"SELECT doc_id, {no} AS band_no,"
            f" md5(concat_ws('|', {', '.join(f'h{j}' for j in js)})) AS band_hash FROM mh"
            for no, js in _band_ranges()
        )}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS index_id, b.doc_id AS batch_id
        FROM bands a JOIN bands b
          ON a.band_no = b.band_no AND a.band_hash = b.band_hash
        WHERE a.doc_id % 4 <> 0 AND b.doc_id % 4 = 0
    ),
    sets AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents
    ),
    truth AS (
        SELECT a.doc_id AS index_id, b.doc_id AS batch_id
        FROM sets a JOIN sets b
          ON a.doc_id % 4 <> 0 AND b.doc_id % 4 = 0
         AND {_PSJ_DEN} * len(list_intersect(a.ws, b.ws))
             >= {_PSJ_NUM} * len(list_distinct(list_concat(a.ws, b.ws)))
    ),
    hit AS (SELECT * FROM truth SEMI JOIN cand USING (index_id, batch_id)),
    n AS (
        SELECT (SELECT COUNT(*) FROM truth) AS n_true,
               (SELECT COUNT(*) FROM hit) AS n_hits
    )
    SELECT CAST(n_true AS BIGINT) AS n_true,
           CAST(n_hits AS BIGINT) AS n_index_hits,
           ROUND(CAST(n_hits AS DOUBLE) / n_true, 6) AS recall,
           CAST(CASE WHEN 10 * n_hits >= 7 * n_true THEN 1 ELSE 0 END AS INT)
               AS meets_bound
    FROM n
    """,
)
def x194_lsh_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.operators.dedup import probe_lsh_index, save_lsh_index
    from ua2sql_spark.queries.common import fixture_artifact

    d = load_table(spark, sf_dir, "documents")
    history = d.filter(F.col("doc_id") % 4 != 0)
    batch = d.filter(F.col("doc_id") % 4 == 0)

    # The index over history is a pure function of `documents`, so it
    # rides the shared fixture cache (one build per process+testdata;
    # the driver's single fresh-process invocation builds as before).
    def build(path: str) -> None:
        save_lsh_index(
            history,
            path,
            id_col="doc_id",
            text_col="text",
            num_hashes=NUM_MINHASHES,
            band_size=BAND_SIZE,
            hash_family="md5",  # pinned: the oracle replays these digests
        )

    path = fixture_artifact(spark, sf_dir, "x194idx", "documents", build)
    cand = probe_lsh_index(spark, path, batch).select("index_id", "batch_id")

    # Exact-Jaccard verify tier over the candidates only (the x43
    # discipline): verified ⊆ truth by construction, so the hit count
    # needs no float-boundary equivalence argument.
    sets = d.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("ws")
    )
    ga = sets.select(
        F.col("doc_id").alias("index_id"),
        F.col("ws").alias("ga"),
        F.size("ws").alias("__sa"),
    )
    gb = sets.select(
        F.col("doc_id").alias("batch_id"),
        F.col("ws").alias("gb"),
        F.size("ws").alias("__sb"),
    )
    # |A∪B| = |A|+|B|-|A∩B| exactly (ws is array_distinct), and the
    # integer threshold DEN·i ≥ NUM·(sa+sb−i) rearranges to
    # (DEN+NUM)·i ≥ NUM·(sa+sb): the filter Catalyst pushes into the
    # join condition evaluates array_intersect ONCE per candidate —
    # the old union form built two hash sets and materialized the
    # concatenated union array per candidate. The leading size gate
    # (r15) is the same bound x179's candidate join carries —
    # i ≤ min(sa,sb) makes DEN·min ≥ NUM·max necessary — evaluated
    # first so the And short-circuits past the intersect for
    # size-incompatible candidates; integer-exact, drops only pairs
    # the intersect conjunct provably rejects.
    verified = (
        cand.join(ga, "index_id")
        .join(gb, "batch_id")
        .filter(
            (
                F.lit(_PSJ_DEN) * F.least("__sa", "__sb")
                >= F.lit(_PSJ_NUM) * F.greatest("__sa", "__sb")
            )
            & (
                F.lit(_PSJ_DEN + _PSJ_NUM)
                * F.size(F.array_intersect("ga", "gb"))
                >= F.lit(_PSJ_NUM) * (F.col("__sa") + F.col("__sb"))
            )
        )
        .select("index_id", "batch_id")
    )

    # Truth: the lossless prefix-filter tier (recall 1.0, proven by
    # x179's brute-force oracle) restricted to cross-side pairs.
    cross = (F.col("doc_a") % 4 == 0) != (F.col("doc_b") % 4 == 0)
    truth = _prefix_truth(spark, sf_dir).filter(cross)

    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    n_hits = verified.agg(F.count(F.lit(1)).alias("n_index_hits"))
    return (
        n_true.crossJoin(F.broadcast(n_hits))
        .select(
            F.col("n_true").cast("bigint").alias("n_true"),
            F.col("n_index_hits").cast("bigint").alias("n_index_hits"),
            F.round(
                F.col("n_index_hits").cast("double") / F.col("n_true"), 6
            ).alias("recall"),
            F.when(
                F.lit(10) * F.col("n_index_hits") >= F.lit(7) * F.col("n_true"), 1
            )
            .otherwise(0)
            .cast("int")
            .alias("meets_bound"),
        )
    )


# ---------------------------------------------------------------------------
# X2k: fuzzy edit-distance join (round 10) — record-linkage at string
# granularity: every (original, perturbed-catalog) part-name pair
# within Levenshtein distance 2, found by the rarest-q-gram prefix +
# length-band blocking of operators/fuzzy.py (the x179 PPJoin
# discipline adapted to edit distance), verified exactly. The oracle
# brute-forces all pairs with DuckDB's levenshtein — both engines
# implement the classical DP, so the driver gate doubles as a
# recall-1.0 proof of the blocking tiers. The perturbed side
# deterministically deletes each name's 3rd character (replayable
# arithmetically in SQL); heavy name duplication in `part` makes the
# result a genuine many-to-many linkage, not just the diagonal.
# ---------------------------------------------------------------------------
@query(
    "x195_fuzzy_editdist_join",
    oracle="""
    WITH orig AS (
        SELECT p_partkey AS orig_id, p_name AS name
        FROM part WHERE p_partkey < 400
    ),
    pert AS (
        SELECT p_partkey + 1000000 AS pert_id,
               substring(p_name, 1, 2) || substring(p_name, 4) AS name
        FROM part WHERE p_partkey < 400
    )
    SELECT o.orig_id, p.pert_id,
           CAST(levenshtein(o.name, p.name) AS INT) AS dist
    FROM orig o, pert p
    WHERE levenshtein(o.name, p.name) <= 2
    """,
)
def x195_fuzzy_editdist_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.operators.fuzzy import fuzzy_join_editdist

    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 400)
    orig = p.select(
        F.col("p_partkey").alias("orig_id"), F.col("p_name").alias("name")
    )
    pert = p.select(
        (F.col("p_partkey") + 1_000_000).alias("pert_id"),
        F.concat(
            F.substring("p_name", 1, 2), F.expr("substring(p_name, 4)")
        ).alias("name"),
    )
    out = fuzzy_join_editdist(
        orig, pert, "orig_id", "name", "pert_id", "name", k=2, q=2
    )
    return out.select(
        F.col("a_id").alias("orig_id"),
        F.col("b_id").alias("pert_id"),
        F.col("dist").cast("int").alias("dist"),
    )


# ---------------------------------------------------------------------------
# X1c: bloom-fingerprint probe (round 10) — the anti-join accelerator
# for x117's incremental exact dedup, under the hard gate. A sharded
# Bloom filter over the historical fingerprint store (md5-derived bit
# positions, so DuckDB replays the membership math bit-for-bit) flags
# the batch's "maybe" slice; everything else is DEFINITELY new and
# skips the exact anti-join. The contract proves the two properties a
# bloom must have: zero false negatives (dups found via the maybe set
# == independently-computed exact dups, all-integer equality) and a
# bounded false-positive residue (n_false_pos is the measured cost of
# skipping the join for the rest). History = odd doc_ids, batch = even
# (the x117 split).
# ---------------------------------------------------------------------------
_BLOOM_SHARDS, _BLOOM_M, _BLOOM_K = 4, 1 << 14, 3


@query(
    "x196_bloom_fingerprint_probe",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                   AS f
        FROM documents
    ),
    hist AS (SELECT DISTINCT f FROM fp WHERE doc_id % 2 = 1),
    batch AS (SELECT DISTINCT f FROM fp WHERE doc_id % 2 = 0),
    hpos AS (
        SELECT ('0x' || substring(md5(f || '|s'), 1, 15))::BIGINT % {_BLOOM_SHARDS}
                   AS shard,
               ('0x' || substring(md5(f || '|' || i), 1, 15))::BIGINT % {_BLOOM_M}
                   AS pos
        FROM hist, range({_BLOOM_K}) t(i)
    ),
    bpos AS (
        SELECT f, i,
               ('0x' || substring(md5(f || '|s'), 1, 15))::BIGINT % {_BLOOM_SHARDS}
                   AS shard,
               ('0x' || substring(md5(f || '|' || i), 1, 15))::BIGINT % {_BLOOM_M}
                   AS pos
        FROM batch, range({_BLOOM_K}) t(i)
    ),
    hit AS (
        SELECT b.f, b.i FROM bpos b
        WHERE EXISTS (
            SELECT 1 FROM hpos h WHERE h.shard = b.shard AND h.pos = b.pos
        )
        GROUP BY b.f, b.i
    ),
    maybe AS (SELECT f FROM hit GROUP BY f HAVING COUNT(*) = {_BLOOM_K}),
    n AS (
        SELECT (SELECT COUNT(*) FROM batch) AS n_batch,
               (SELECT COUNT(*) FROM maybe) AS n_maybe,
               (SELECT COUNT(*) FROM batch SEMI JOIN hist USING (f)) AS n_dups,
               (SELECT COUNT(*) FROM maybe SEMI JOIN hist USING (f))
                   AS n_dups_via_maybe
    )
    SELECT CAST(n_batch AS BIGINT) AS n_batch,
           CAST(n_maybe AS BIGINT) AS n_maybe,
           CAST(n_dups AS BIGINT) AS n_dups,
           CAST(n_maybe - n_dups AS BIGINT) AS n_false_pos,
           CAST(CASE WHEN n_dups_via_maybe = n_dups THEN 1 ELSE 0 END AS INT)
               AS fn_free
    FROM n
    """,
)
def x196_bloom_fingerprint_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.operators.bloom import bloom_maybe, build_bloom_index

    d = load_table(spark, sf_dir, "documents")
    fingerprint = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), " ")
    )
    fp = d.select("doc_id", fingerprint.alias("f"))
    hist = fp.filter(F.col("doc_id") % 2 == 1).select("f").distinct()
    batch = (
        fp.filter(F.col("doc_id") % 2 == 0)
        .select("f")
        .distinct()
        .localCheckpoint(eager=False)
    )
    bloom = build_bloom_index(
        hist, "f", n_shards=_BLOOM_SHARDS, m_bits=_BLOOM_M, k=_BLOOM_K
    )
    maybe = bloom_maybe(
        batch, bloom, "f", n_shards=_BLOOM_SHARDS, m_bits=_BLOOM_M, k=_BLOOM_K
    ).localCheckpoint(eager=False)

    n_batch = batch.agg(F.count(F.lit(1)).alias("n_batch"))
    n_maybe = maybe.agg(F.count(F.lit(1)).alias("n_maybe"))
    n_dups = (
        batch.join(hist, "f", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_dups"))
    )
    n_dups_via_maybe = (
        maybe.join(hist, "f", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_dups_via_maybe"))
    )
    return (
        n_batch.crossJoin(F.broadcast(n_maybe))
        .crossJoin(F.broadcast(n_dups))
        .crossJoin(F.broadcast(n_dups_via_maybe))
        .select(
            F.col("n_batch").cast("bigint").alias("n_batch"),
            F.col("n_maybe").cast("bigint").alias("n_maybe"),
            F.col("n_dups").cast("bigint").alias("n_dups"),
            (F.col("n_maybe") - F.col("n_dups"))
            .cast("bigint")
            .alias("n_false_pos"),
            F.when(F.col("n_dups_via_maybe") == F.col("n_dups"), 1)
            .otherwise(0)
            .cast("int")
            .alias("fn_free"),
        )
    )


# ---------------------------------------------------------------------------
# X2k: LSH index health report (round 11) — the number the
# compact/rebuild decision needs, the x198 discipline applied to the
# near-dup index: round 11 shipped compact_lsh_index (drop replay
# debris, coalesce partitions) with an explicit-adoption contract;
# this row ships the per-band report that tells an operator WHEN to
# run it. The fixture index is built from `documents` (xxhash64 — the
# production family; the report never inspects hash values, only
# counts) with one clean append and one REPLAYED append, so the dup
# accounting is pure arithmetic: every doc mints exactly num_bands
# band rows, the replay duplicates exactly the batch's rows, and
# compaction would keep exactly base+batch per band. The
# hash-dependent health numbers (bucket fill, hottest group) are
# emitted as invariant verdict bits — true by construction, pinned so
# the computation provably ran. History = doc_id % 3 != 0,
# batch = doc_id % 3 = 0, default geometry (16 hashes / band_size 8
# -> bands 1 and 2).
#
# Round 13 (VERDICT r12 #7): the fixture build now also COMPACTS the
# debris index (compact_lsh_index into path/compact1), and the row
# hashes the maintenance loop's idempotence as arithmetic: per band,
# the compacted index must hold exactly n_rows_after_compact rows
# (compact_kept_ok = 1) and carry ZERO remaining duplicates
# (recompact_would_drop = 0 — n_dup_rows is BY CONTRACT exactly what a
# second compaction would drop, so the pinned 0 makes "re-compacting a
# clean index drops nothing" a driver-checked bit every rotation, not
# an e2e-test-only claim).
# ---------------------------------------------------------------------------
@query(
    "x204_lsh_index_health",
    oracle="""
    WITH c AS (
        SELECT COUNT(*) FILTER (WHERE doc_id % 3 <> 0) AS n_base,
               COUNT(*) FILTER (WHERE doc_id % 3 = 0) AS n_batch
        FROM documents
    )
    SELECT CAST(b.band_no AS INTEGER) AS band_no,
           CAST(n_base + 2 * n_batch AS BIGINT) AS n_rows,
           CAST(n_batch AS BIGINT) AS n_dup_rows,
           CAST(n_base + n_batch AS BIGINT) AS n_rows_after_compact,
           CAST(1 AS INTEGER) AS geometry_ok,
           CAST(1 AS INTEGER) AS hot_group_le_docs,
           CAST(0 AS BIGINT) AS recompact_would_drop,
           CAST(1 AS INTEGER) AS compact_kept_ok
    FROM c CROSS JOIN (VALUES (1), (2)) AS b(band_no)
    ORDER BY band_no
    """,
)
def x204_lsh_index_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Health report over a persisted LSH band index carrying replay
    debris: per band, total/dup/post-compaction row counts (arithmetic
    under the hash), bucket-geometry and hot-group invariants as
    verdict bits, plus the compaction-idempotence columns — the
    compacted twin's residual dup count (pinned 0) and kept-row
    agreement with the debris report's prediction."""
    from ua2sql_spark.operators.dedup import (
        LSH_INDEX_BUCKETS,
        append_lsh_index,
        compact_lsh_index,
        lsh_index_health,
        save_lsh_index,
    )
    from ua2sql_spark.queries.common import fixture_artifact

    d = load_table(spark, sf_dir, "documents")

    def build(path: str) -> None:
        save_lsh_index(d.filter(F.col("doc_id") % 3 != 0), path)
        batch = d.filter(F.col("doc_id") % 3 == 0).localCheckpoint(eager=False)
        append_lsh_index(batch, path)
        append_lsh_index(batch, path)  # at-least-once replay: exact dups
        # the maintenance verb under test: compact the debris into the
        # explicit-adoption twin (inside the fixture dir so the sweep
        # reclaims both together)
        compact_lsh_index(spark, path, path + "/compact1")

    path = fixture_artifact(spark, sf_dir, "x204idx", "documents", build)
    h = lsh_index_health(spark, path)
    hc = lsh_index_health(spark, path + "/compact1").select(
        "band_no",
        F.col("n_dup_rows").alias("__c_dups"),
        F.col("n_rows").alias("__c_rows"),
    )
    return (
        h.join(hc, "band_no")  # num_bands rows each side
        .select(
            F.col("band_no").cast("int").alias("band_no"),
            "n_rows",
            "n_dup_rows",
            F.col("n_distinct_rows").alias("n_rows_after_compact"),
            F.when(
                (F.col("n_buckets_used") <= F.lit(LSH_INDEX_BUCKETS))
                & (F.col("n_hash_groups") >= F.col("n_buckets_used")),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("geometry_ok"),
            F.when(F.col("max_hash_group") <= F.col("n_distinct_rows"), 1)
            .otherwise(0)
            .cast("int")
            .alias("hot_group_le_docs"),
            F.col("__c_dups").cast("bigint").alias("recompact_would_drop"),
            F.when(F.col("__c_rows") == F.col("n_distinct_rows"), 1)
            .otherwise(0)
            .cast("int")
            .alias("compact_kept_ok"),
        )
        .orderBy("band_no")
    )
