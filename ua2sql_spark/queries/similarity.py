"""Similarity search over embeddings: SURVEY.md §2.11 X4/X5.

Cosine math is pure higher-order-function composition
(``zip_with`` + ``aggregate``) — no UDF, fully JVM-side. Verified
bit-identical to DuckDB's list-fold on this data (sequential
left-to-right double accumulation in both engines).

Scale notes
-----------
* x45 is the brute-force baseline: a *bounded* probe set (10 query
  vectors) joined against all candidates — linear scan per query, the
  correct shape when the probe side is small enough to broadcast.
* x46 is the scale path: sign-bucket (random-hyperplane-style) LSH over
  the first 8 dimensions turns the scan into an equi-join on bucket id —
  candidates shrink ~256×; recall is the LSH's, deterministically
  mirrored in the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ua2sql_spark.catalog import load_table
from ua2sql_spark.functions.arrays import dot, sign_bucket, sq_norm
from ua2sql_spark.registry import query

N_PROBE = 10
TOP_K = 5
BUCKET_DIMS = 8
IVF_STRIDE = 25


def cosine(a: Column, b: Column) -> Column:
    """Unguarded cosine — matches the oracles' plain division exactly.
    Precondition: non-zero vectors (the fixtures guarantee it; x112's
    quantizer guards amax=0 separately). Pipelines that may see zero
    vectors should use functions/arrays.cosine, whose zero-norm branch
    returns NULL instead of NaN (NaN sorts FIRST under desc rank)."""
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))


_SQL_DOT = (
    "list_aggregate(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
)
_SQL_SQNORM = (
    "list_aggregate(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"
)


def _sql_cosine(a: str, b: str) -> str:
    return (
        f"({_SQL_DOT.format(a=a, b=b)}"
        f" / (SQRT({_SQL_SQNORM.format(a=a)}) * SQRT({_SQL_SQNORM.format(a=b)})))"
    )


# ---------------------------------------------------------------------------
# X5a: brute-force cosine top-k for a bounded probe set.
# ---------------------------------------------------------------------------
@query(
    "x45_cosine_topk",
    oracle=f"""
    WITH pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({_sql_cosine('q.embedding', 'c.embedding')}, 6) AS cos_sim
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {N_PROBE}
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM pairs
    ) WHERE rnk <= {TOP_K}
    """,
)
def x45_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", rebalance=True)
    q = emb.filter(F.col("vec_id") < N_PROBE).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    pairs = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return pairs.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= TOP_K)


# ---------------------------------------------------------------------------
# X5b: bucketed ANN — sign-LSH on the first 8 dims → equi-join on bucket.
# ---------------------------------------------------------------------------
_BUCKET_SQL = " + ".join(
    f"(CASE WHEN {{e}}[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)" for j in range(BUCKET_DIMS)
)


def _bucket(e: Column) -> Column:
    return sign_bucket(e, BUCKET_DIMS)


@query(
    "x46_ann_bucketed",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding,
               CAST({_BUCKET_SQL.format(e='embedding')} AS BIGINT) AS bucket
        FROM embeddings
    ),
    pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket,
               ROUND({_sql_cosine('q.embedding', 'c.embedding')}, 6) AS cos_sim
        FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id < {N_PROBE}
    )
    SELECT query_id, neighbor_id, bucket, cos_sim, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM pairs
    ) WHERE rnk <= 3
    """,
)
def x46_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    b = emb.select("vec_id", "embedding", _bucket(F.col("embedding")).alias("bucket"))
    q = b.filter(F.col("vec_id") < N_PROBE).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket"),
    )
    c = b.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
    )
    pairs = (
        F.broadcast(q)
        .join(c, (F.col("bucket") == F.col("c_bucket")) & (F.col("query_id") != F.col("neighbor_id")))
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return pairs.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)


# ---------------------------------------------------------------------------
# X5e: IVF retrieval-quality contract — recall of multi-probe IVF top-k
# against brute-force top-k on a bounded probe set, BOTH sides computed
# in BOTH engines. The oracle emits TRUE for recall_ok, so a Spark-side
# recall below the floor hash-mismatches and turns the driver row red —
# the contract is a hard gate, not an annotation (same convention as
# q15/q114).
#
# Config note: the synthetic embeddings are isotropic (no cluster
# structure — verified: top-1 neighbor same-label rate ≈ chance), so
# recall comes only from probe-*ranking* concentration, and clearing a
# 0.9 floor needs nprobe near the cell count (9 of 10 here; measured
# recall 0.95–0.97 at sf0.001/0.01/0.1). On a real corpus with cluster
# structure the same knob reaches the floor at much smaller nprobe —
# the composition under test (cell ranking → union scan → rank) is
# identical. The cell count is fixed at 10 via a count-derived stride
# so the contract is scale-invariant across SFs.
# ---------------------------------------------------------------------------
RECALL_NQ = 20
RECALL_K = 5
RECALL_CELLS = 10
RECALL_NPROBE = 9

_RECALL_STRIDE_SQL = f"(SELECT CAST(CEIL(COUNT(*) / {RECALL_CELLS}.0) AS BIGINT) FROM embeddings)"


@query(
    "x121_ivf_recall_contract",
    oracle=f"""
    WITH centroids AS (
        SELECT vec_id AS cid, embedding AS cemb FROM embeddings
        WHERE vec_id % {_RECALL_STRIDE_SQL} = 0
    ),
    cell_rank AS (
        SELECT e.vec_id, e.embedding, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY ROUND({_sql_cosine('e.embedding', 'c.cemb')}, 6) DESC,
                            c.cid) AS rn
        FROM embeddings e CROSS JOIN centroids c
    ),
    assign AS (
        SELECT vec_id, embedding, cid AS cell FROM cell_rank WHERE rn = 1
    ),
    qprobe AS (
        SELECT vec_id AS query_id, embedding AS qemb, cid AS cell
        FROM cell_rank WHERE vec_id < {RECALL_NQ} AND rn <= {RECALL_NPROBE}
    ),
    ivf_topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, n.vec_id AS neighbor_id,
                   ROUND({_sql_cosine('q.qemb', 'n.embedding')}, 6) AS cs
            FROM qprobe q JOIN assign n
              ON q.cell = n.cell AND q.query_id <> n.vec_id
        ) QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cs DESC, neighbor_id) <= {RECALL_K}
    ),
    bf_topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND({_sql_cosine('q.embedding', 'c.embedding')}, 6) AS cs
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {RECALL_NQ}
        ) QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cs DESC, neighbor_id) <= {RECALL_K}
    )
    SELECT CAST({RECALL_NQ} AS BIGINT) AS n_queries,
           CAST({RECALL_K} AS BIGINT) AS k,
           COUNT(*) AS ivf_hits,
           ROUND(COUNT(*) / {RECALL_NQ * RECALL_K}.0, 4) AS recall,
           TRUE AS recall_ok
    FROM ivf_topk i JOIN bf_topk b USING (query_id, neighbor_id)
    """,
)
def x121_ivf_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.operators.ivf import ivf_probe_topk

    emb = load_table(spark, sf_dir, "embeddings")
    # Driver-side scalar: sizes the coarse index off corpus cardinality
    # (parquet-metadata count; the one bounded action this query takes).
    n_corpus = emb.count()
    stride = -(-n_corpus // RECALL_CELLS)
    probe_ids = emb.filter(F.col("vec_id") < RECALL_NQ).select("vec_id")
    ivf = ivf_probe_topk(
        emb,
        probe_ids,
        centroid_stride=stride,
        nprobe=RECALL_NPROBE,
        k=RECALL_K,
    ).select("query_id", "neighbor_id")

    q = emb.filter(F.col("vec_id") < RECALL_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    bf_pairs = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cs"),
        )
    )
    wb = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    bf = (
        bf_pairs.withColumn("rnk", F.row_number().over(wb))
        .filter(F.col("rnk") <= RECALL_K)
        .select("query_id", "neighbor_id")
    )

    denom = RECALL_NQ * RECALL_K
    return (
        ivf.join(bf, ["query_id", "neighbor_id"])
        .agg(F.count(F.lit(1)).alias("ivf_hits"))
        .select(
            F.lit(RECALL_NQ).cast("long").alias("n_queries"),
            F.lit(RECALL_K).cast("long").alias("k"),
            F.col("ivf_hits"),
            F.round(F.col("ivf_hits") / F.lit(float(denom)), 4).alias("recall"),
            (F.col("ivf_hits") / F.lit(float(denom)) >= F.lit(0.9)).alias("recall_ok"),
        )
    )


# ---------------------------------------------------------------------------
# X4: embedding math surface — norms, dot with a constant reference
# vector, normalized-vector check. Pure higher-order functions.
# ---------------------------------------------------------------------------
@query(
    "x47_embedding_math",
    oracle=f"""
    SELECT vec_id, label,
           ROUND(SQRT({_SQL_SQNORM.format(a='embedding')}), 6) AS l2_norm,
           ROUND({_SQL_SQNORM.format(a='embedding')}, 6) AS sq_norm,
           ROUND(list_aggregate(list_transform(embedding, x -> ABS(CAST(x AS DOUBLE))), 'sum'), 6)
               AS l1_norm,
           ROUND(CAST(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'max')
               AS DOUBLE), 6) AS max_component
    FROM embeddings
    WHERE vec_id < 200
    """,
)
def x47_embedding_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    l1 = F.aggregate(
        F.transform(e, lambda x: F.abs(x.cast("double"))), F.lit(0.0), lambda a, x: a + x
    )
    return emb.filter(F.col("vec_id") < 200).select(
        "vec_id",
        "label",
        F.round(F.sqrt(sq_norm(e)), 6).alias("l2_norm"),
        F.round(sq_norm(e), 6).alias("sq_norm"),
        F.round(l1, 6).alias("l1_norm"),
        F.round(F.array_max(F.transform(e, lambda x: x.cast("double"))), 6).alias(
            "max_component"
        ),
    )


# ---------------------------------------------------------------------------
# X4b: per-label centroids — the "M step" / IVF-training primitive
# (class prototypes for embedding-based quality classifiers).
#
# Physical shape: posexplode fans each vector into (label, dim, x) rows;
# the groupBy then partial-aggregates map-side, so the shuffle carries at
# most |labels|·d rows per input partition regardless of corpus size —
# the canonical scalable shape for distributed centroid computation.
# The decimal interior makes the mean order-insensitive (common.py).
# ---------------------------------------------------------------------------
@query(
    "x88_label_centroids",
    oracle="""
    SELECT label, i - 1 AS dim,
           CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,8))) AS STRING) AS DOUBLE)
               / COUNT(*) AS centroid
    FROM (SELECT label, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings)
    GROUP BY label, i
    """,
)
def x88_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("dim", "x"))
    return ex.groupBy("label", "dim").agg(
        (
            F.sum(F.col("x").cast("double").cast("decimal(28,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("centroid")
    )


# ---------------------------------------------------------------------------
# X5c: kNN majority-vote classification — label a probe vector by the
# mode of its top-k neighbors' labels (embedding-based data labeling /
# quality scoring at pipeline scale). Brute-force candidate scan here;
# at 100 TB the candidate set comes from the IVF cells (operators/ivf.py)
# instead — the vote logic is identical.
# ---------------------------------------------------------------------------
@query(
    "x89_knn_classify",
    oracle=f"""
    WITH pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
               ROUND({_sql_cosine('q.embedding', 'c.embedding')}, 6) AS cos_sim
        FROM embeddings q
        JOIN embeddings c ON c.vec_id >= {N_PROBE}
        WHERE q.vec_id < {N_PROBE}
    ), topk AS (
        SELECT query_id, label FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM pairs
        ) WHERE rnk <= {TOP_K}
    ), votes AS (
        SELECT query_id, label, COUNT(*) AS n_votes
        FROM topk GROUP BY query_id, label
    )
    SELECT query_id, label AS predicted_label, n_votes FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY n_votes DESC, label) AS r
        FROM votes
    ) WHERE r = 1
    """,
)
def x89_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_PROBE).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.filter(F.col("vec_id") >= N_PROBE).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        "label",
    )
    pairs = F.broadcast(q).join(c).select(
        "query_id",
        "neighbor_id",
        "label",
        F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    topk = pairs.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )
    votes = topk.groupBy("query_id", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("label"))
    return (
        votes.withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "n_votes")
    )


# ---------------------------------------------------------------------------
# X5d: kNN classification over the IVF index — the 100 TB composition:
# candidates come from the query's own IVF cell (operators/ivf.py
# ivf_assign → ivf_topk, corpus never shuffles, centroids broadcast)
# instead of x89's brute-force scan; the majority vote is identical.
# Recall is the index's (nprobe=1), deterministically mirrored in the
# oracle — same cells, same candidates, same vote.
# ---------------------------------------------------------------------------
@query(
    "x100_ivf_knn_classify",
    oracle=f"""
    WITH centroids AS (
        SELECT vec_id AS cid, embedding AS cemb
        FROM embeddings WHERE vec_id % {IVF_STRIDE} = 0
    ),
    assign AS (
        SELECT vec_id, embedding, cid AS cell FROM (
            SELECT e.vec_id, e.embedding, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY ROUND({_sql_cosine('e.embedding', 'c.cemb')}, 6) DESC,
                                c.cid
                   ) AS rn
            FROM embeddings e CROSS JOIN centroids c
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               ROUND({_sql_cosine('q.embedding', 'n.embedding')}, 6) AS cos_sim
        FROM assign q JOIN assign n
          ON q.cell = n.cell AND q.vec_id <> n.vec_id
        WHERE q.vec_id < {N_PROBE}
    ),
    topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM pairs
        ) WHERE rnk <= {TOP_K}
    ),
    votes AS (
        SELECT t.query_id, e.label, COUNT(*) AS n_votes
        FROM topk t JOIN embeddings e ON t.neighbor_id = e.vec_id
        GROUP BY t.query_id, e.label
    )
    SELECT query_id, label AS predicted_label, n_votes FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY n_votes DESC, label) AS r
        FROM votes
    ) WHERE r = 1
    """,
)
def x100_ivf_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.operators.ivf import ivf_assign, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = ivf_assign(emb, centroid_stride=IVF_STRIDE)
    probe_ids = emb.filter(F.col("vec_id") < N_PROBE).select("vec_id")
    topk = ivf_topk(assigned, probe_ids, k=TOP_K)
    labels = emb.select(F.col("vec_id").alias("neighbor_id"), "label")
    votes = (
        topk.join(labels, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("label"))
    return (
        votes.withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "n_votes")
    )


# ---------------------------------------------------------------------------
# X5d: hybrid retrieval — lexical overlap + vector cosine fused by
# reciprocal-rank fusion (RRF), the production hybrid-search shape:
# each retriever returns its own top-N (TakeOrderedAndProject — never a
# global rank over the corpus), ranks exist only inside those tiny
# top-N sets, and fusion full-outer-joins them so a doc surfaced by one
# signal still scores. At 100 TB each retriever side is the already-
# proven scale path (inverted/LSH candidates for lexical, IVF for
# vectors); the fusion cost is |top-N|, independent of corpus size.
# Determinism: integer overlaps; cosine rounded to 6 before ranking;
# rank ties break on doc_id; RRF = sums of exact reciprocals of small
# ints — bit-identical across engines with no final rounding.
# ---------------------------------------------------------------------------
_HYBRID_TOPN = 50
_HYBRID_K = 10
_RRF_C = 60  # the standard RRF constant


@query(
    "x130_hybrid_search_rrf",
    oracle=f"""
    WITH probe_words AS (
        SELECT list_distinct(string_split(text, ' ')) AS pw
        FROM documents WHERE doc_id = 0
    ),
    probe_vec AS (
        SELECT embedding AS pv FROM embeddings WHERE vec_id = 0
    ),
    lex_top AS (
        SELECT doc_id,
               CAST(len(list_distinct(list_intersect(
                   string_split(text, ' '), pw))) AS BIGINT) AS overlap
        FROM documents CROSS JOIN probe_words
        WHERE doc_id <> 0
        ORDER BY overlap DESC, doc_id
        LIMIT {_HYBRID_TOPN}
    ),
    lex_rank AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY overlap DESC, doc_id) AS r_lex
        FROM lex_top
    ),
    vec_top AS (
        SELECT vec_id AS doc_id,
               ROUND({_sql_cosine('embedding', 'pv')}, 6) AS cs
        FROM embeddings CROSS JOIN probe_vec
        WHERE vec_id <> 0
        ORDER BY cs DESC, doc_id
        LIMIT {_HYBRID_TOPN}
    ),
    vec_rank AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cs DESC, doc_id) AS r_vec
        FROM vec_top
    )
    SELECT doc_id,
           COALESCE(1.0 / ({_RRF_C} + r_lex), 0.0)
             + COALESCE(1.0 / ({_RRF_C} + r_vec), 0.0) AS rrf
    FROM lex_rank FULL JOIN vec_rank USING (doc_id)
    ORDER BY rrf DESC, doc_id
    LIMIT {_HYBRID_K}
    """,
)
def x130_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")

    pw = d.filter(F.col("doc_id") == 0).select(
        F.array_distinct(F.split(F.col("text"), " ")).alias("pw")
    )
    lex_top = (
        d.filter(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(pw))
        .select(
            "doc_id",
            F.size(
                F.array_intersect(F.split(F.col("text"), " "), F.col("pw"))
            ).cast("bigint").alias("overlap"),
        )
        .orderBy(F.desc("overlap"), "doc_id")
        .limit(_HYBRID_TOPN)
    )
    w_lex = Window.orderBy(F.desc("overlap"), "doc_id")
    lex_rank = lex_top.select(
        "doc_id", F.row_number().over(w_lex).alias("r_lex")
    )

    pv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("pv"))
    vec_top = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(pv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), F.col("pv")), 6).alias("cs"),
        )
        .orderBy(F.desc("cs"), "doc_id")
        .limit(_HYBRID_TOPN)
    )
    w_vec = Window.orderBy(F.desc("cs"), "doc_id")
    vec_rank = vec_top.select(
        "doc_id", F.row_number().over(w_vec).alias("r_vec")
    )

    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_C) + F.col("r_lex")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(_RRF_C) + F.col("r_vec")), F.lit(0.0))
    return (
        lex_rank.join(vec_rank, "doc_id", "full_outer")
        .select("doc_id", rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(_HYBRID_K)
    )


# ---------------------------------------------------------------------------
# X4c: embedding outlier detection — the curation filter that drops
# mis-embedded / mislabeled vectors: distance to the OWN label's
# centroid, flagged beyond the label's 95th percentile. Composes the
# engine's proven primitives: x88's decimal-interior centroids (map-
# side partial aggregation, shuffle ≤ |labels|·d rows), a broadcast
# centroid join on (label, dim), one per-vector aggregate with the
# decimal interior (dim-order independent), and q18's exact-percentile
# parity for the threshold. At 100 TB everything is scan-shaped except
# two bounded aggregates; the percentile upgrades to the mergeable
# sketch under q114's contract.
# ---------------------------------------------------------------------------
@query(
    "x132_embedding_outliers",
    oracle="""
    WITH pts AS (
        SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    cent AS (
        SELECT label, i,
               CAST(CAST(SUM(CAST(x AS DECIMAL(28,8))) AS STRING) AS DOUBLE)
                   / COUNT(*) AS c
        FROM pts GROUP BY label, i
    ),
    dists AS (
        SELECT p.vec_id, p.label,
               ROUND(SQRT(CAST(CAST(SUM(CAST((p.x - c.c) * (p.x - c.c)
                   AS DECIMAL(28,8))) AS STRING) AS DOUBLE)), 6) AS dist
        FROM pts p JOIN cent c ON p.label = c.label AND p.i = c.i
        GROUP BY p.vec_id, p.label
    ),
    thr AS (
        SELECT label, QUANTILE_CONT(dist, 0.95) AS p95_dist
        FROM dists GROUP BY label
    )
    SELECT d.vec_id, d.label, d.dist, t.p95_dist,
           d.dist > t.p95_dist AS is_outlier
    FROM dists d JOIN thr t USING (label)
    """,
)
def x132_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    DEC = "decimal(28,8)"
    e = load_table(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("i0", "xr")
    ).select(
        "vec_id",
        "label",
        (F.col("i0") + 1).alias("i"),  # 1-based like the oracle
        F.col("xr").cast("double").alias("x"),
    )
    cent = pts.groupBy("label", "i").agg(
        (
            F.sum(F.col("x").cast(DEC)).cast("double") / F.count(F.lit(1))
        ).alias("c")
    )
    diff = F.col("x") - F.col("c")
    dists = (
        pts.join(F.broadcast(cent), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sqrt(F.sum((diff * diff).cast(DEC)).cast("double")), 6
            ).alias("dist")
        )
    )
    thr = dists.groupBy("label").agg(
        F.percentile("dist", F.lit(0.95)).alias("p95_dist")
    )
    return dists.join(F.broadcast(thr), "label").select(
        "vec_id",
        "label",
        "dist",
        "p95_dist",
        (F.col("dist") > F.col("p95_dist")).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# x133: int8-quantized ANN recall contract — asymmetric-distance ranking
# over the x112 symmetric per-vector int8 quantization. The production
# 100 TB retrieval path stores int8 codes (4× smaller than fp32, so 4×
# more vectors per executor page and 4× less shuffle when candidates
# move); ranking runs on DEQUANTIZED values (code * scale). This query
# pins the quality of that path: top-k under quantized cosine vs top-k
# under exact cosine, recall >= 0.9, same q15-style boolean contract as
# x121 (the oracle asserts TRUE, so a recall regression in either
# engine is a hash mismatch, not a silent drift).
# Determinism: quantize = round(x/scale, 0) — the exact expression
# hash-verified cross-engine by x112; dequantize/cosine are per-row
# IEEE folds in identical order; cosines rounded to 6 before ranking
# with a total tie-break order.
# Scale shape: probe side is bounded (NQ rows) and broadcast; the
# candidate side streams — same linear-scan-per-query shape as x45,
# with IVF (x71/x121) as the sub-linear composition.
# ---------------------------------------------------------------------------
_QREC_NQ = 20
_QREC_K = 5

_SQL_DEQUANT = (
    "list_transform({e}, x -> round(CAST(x AS DOUBLE) / {s}, 0) * {s})"
)


@query(
    "x133_quantized_recall_contract",
    oracle=f"""
    WITH dq AS (
        SELECT vec_id,
               {_SQL_DEQUANT.format(e='embedding', s='scale')} AS dqe,
               embedding
        FROM (
            SELECT vec_id, embedding,
                   CASE WHEN amax = 0 THEN 1.0 ELSE amax / 127.0 END AS scale
            FROM (
                SELECT vec_id, embedding,
                       list_max(list_transform(embedding,
                                               x -> abs(CAST(x AS DOUBLE)))) AS amax
                FROM embeddings
            )
        )
    ),
    approx_topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND({_sql_cosine('q.dqe', 'c.dqe')}, 6) AS cs
            FROM dq q JOIN dq c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {_QREC_NQ}
        ) QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cs DESC, neighbor_id) <= {_QREC_K}
    ),
    exact_topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND({_sql_cosine('q.embedding', 'c.embedding')}, 6) AS cs
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {_QREC_NQ}
        ) QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cs DESC, neighbor_id) <= {_QREC_K}
    )
    SELECT CAST({_QREC_NQ} AS BIGINT) AS n_queries,
           CAST({_QREC_K} AS BIGINT) AS k,
           COUNT(*) AS quant_hits,
           ROUND(COUNT(*) / {_QREC_NQ * _QREC_K}.0, 4) AS recall,
           TRUE AS recall_ok
    FROM approx_topk a JOIN exact_topk e USING (query_id, neighbor_id)
    """,
)
def x133_quantized_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    amax = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    with_scale = emb.select(
        "vec_id",
        "embedding",
        F.when(amax == 0, F.lit(1.0)).otherwise(amax / 127.0).alias("scale"),
    )
    dq = with_scale.select(
        "vec_id",
        "embedding",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") / F.col("scale"), 0) * F.col("scale"),
        ).alias("dqe"),
    )

    def topk(src: DataFrame, col: str) -> DataFrame:
        q = src.filter(F.col("vec_id") < _QREC_NQ).select(
            F.col("vec_id").alias("query_id"), F.col(col).alias("qv")
        )
        c = src.select(F.col("vec_id").alias("neighbor_id"), F.col(col).alias("cv"))
        pairs = (
            F.broadcast(q)
            .join(c, F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cs"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
        return (
            pairs.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _QREC_K)
            .select("query_id", "neighbor_id")
        )

    approx = topk(dq, "dqe")
    exact = topk(dq, "embedding")
    denom = _QREC_NQ * _QREC_K
    return (
        approx.join(exact, ["query_id", "neighbor_id"])
        .agg(F.count(F.lit(1)).alias("quant_hits"))
        .select(
            F.lit(_QREC_NQ).cast("long").alias("n_queries"),
            F.lit(_QREC_K).cast("long").alias("k"),
            F.col("quant_hits"),
            F.round(F.col("quant_hits") / F.lit(float(denom)), 4).alias("recall"),
            (F.col("quant_hits") / F.lit(float(denom)) >= F.lit(0.9)).alias("recall_ok"),
        )
    )


# ---------------------------------------------------------------------------
# x154: product-quantization retrieval (PQ-ADC shortlist + exact rerank)
# with a recall contract — completes the compression ladder fp32 →
# per-vector int8 (x112/x133) → PQ codes. PQ stores M=8 one-byte
# codeword ids per vector instead of 64 floats (32× smaller): each
# 8-dim subvector is replaced by its nearest codeword from a
# per-subvector codebook, and query scoring is asymmetric-distance
# computation (ADC) — the query precomputes a tiny (m, cid) → dot
# lookup table and every candidate's approximate cosine is M map
# lookups, no float vector touched. The production two-stage shape:
# ADC scans ALL candidates cheaply (8 lookups vs 64 multiplies, 32×
# less memory traffic), keeps a C=250 shortlist, and re-ranks ONLY the
# shortlist with exact cosines — at 100 TB the exact pass touches C
# vectors per query, not the corpus (and composes with IVF x71 cell
# pruning in front).
#
# Spark-first shape (zero UDF, zero corpus shuffle before ranking):
# * CODEBOOK: deterministic, SF-stable sample (vec_id % 10 == 0 AND
#   vec_id < 500 → K=50 codewords at every SF ≥ 0.01) — the ivf.py
#   discipline: oracle-checkable, seed-free; production swaps in
#   k-means codebooks without touching the query path.
# * ENCODING: the codebook is ONE broadcast row (sorted struct array);
#   codes are a pure per-row expression — transform over m of an
#   array_min argmin (round-6 L2², tie on cid) over the broadcast
#   array, inside whole-stage codegen. Map-only.
# * ADC: the per-query LUT ((m·100000+cid) → (dot, codeword-norm²)) is
#   NQ broadcast map rows; scoring folds m=1..M in index order over
#   element_at lookups — deterministic fold, mirrored in DuckDB via
#   list_aggregate(list(t ORDER BY m)). Approximate cosine =
#   Σ_m dot(q_m, c_m) / (|q| · sqrt(Σ_m |c_m|²)) — the reconstruction
#   cosine, rounded to 6 before ranking with total tie-break.
# * CONTRACT: recall@5 (reranked top-5 vs exact top-5, NQ=20 probes)
#   ≥ 0.85 — measured 0.97 at sf0.01 / 0.92 at sf0.1; the oracle pins
#   TRUE, so a recall regression in either engine is a hash mismatch
#   (the x121/x133 gated-quality pattern).
# ---------------------------------------------------------------------------
_PQ_M = 8
_PQ_SUB = 8  # 64-dim embeddings / 8 subvectors
_PQ_STRIDE = 10
_PQ_MAXCID = 500  # K = 50 codewords per subvector at every SF
_PQ_NQ = 20
_PQ_K = 5
_PQ_SHORTLIST = 250
_PQ_RECALL_MIN = 0.85

_SQL_L2SQ = (
    "list_aggregate(list_transform(list_zip({a}, {b}),"
    " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum')"
)


def _l2sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_slice(emb: Column, m) -> Column:
    # 1-based inclusive slice of subvector m (1..M); DuckDB mirror is
    # embedding[(m-1)*SUB+1 : (m-1)*SUB+SUB]
    return F.slice(emb, (m - 1) * _PQ_SUB + 1, _PQ_SUB)


@query(
    "x154_pq_recall_contract",
    oracle=f"""
    WITH cb AS (
        SELECT vec_id AS cid, embedding FROM embeddings
        WHERE vec_id % {_PQ_STRIDE} = 0 AND vec_id < {_PQ_MAXCID}
    ),
    cb_sub AS (
        SELECT cid, m,
               embedding[(m-1)*{_PQ_SUB}+1 : (m-1)*{_PQ_SUB}+{_PQ_SUB}] AS cvec
        FROM cb, unnest(range(1, {_PQ_M + 1})) AS t(m)
    ),
    vec_sub AS (
        SELECT vec_id, m,
               embedding[(m-1)*{_PQ_SUB}+1 : (m-1)*{_PQ_SUB}+{_PQ_SUB}] AS svec
        FROM embeddings, unnest(range(1, {_PQ_M + 1})) AS t(m)
    ),
    codes AS (
        SELECT vec_id, m, cid FROM (
            SELECT v.vec_id, v.m, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id, v.m
                       ORDER BY ROUND({_SQL_L2SQ.format(a='v.svec', b='c.cvec')}, 6),
                                c.cid
                   ) AS rn
            FROM vec_sub v JOIN cb_sub c ON c.m = v.m
        ) WHERE rn = 1
    ),
    q AS (
        SELECT vec_id AS query_id, embedding AS qemb,
               SQRT({_SQL_SQNORM.format(a='embedding')}) AS qn
        FROM embeddings WHERE vec_id < {_PQ_NQ}
    ),
    q_sub AS (
        SELECT vec_id AS query_id, m,
               embedding[(m-1)*{_PQ_SUB}+1 : (m-1)*{_PQ_SUB}+{_PQ_SUB}] AS qsub
        FROM embeddings, unnest(range(1, {_PQ_M + 1})) AS t(m)
        WHERE vec_id < {_PQ_NQ}
    ),
    terms AS (
        SELECT qs.query_id, co.vec_id, co.m,
               {_SQL_DOT.format(a='qs.qsub', b='cs.cvec')} AS t,
               {_SQL_SQNORM.format(a='cs.cvec')} AS n2
        FROM codes co
        JOIN cb_sub cs ON cs.m = co.m AND cs.cid = co.cid
        JOIN q_sub qs ON qs.m = co.m
        WHERE co.vec_id <> qs.query_id
    ),
    shortlist AS (
        SELECT query_id, vec_id FROM (
            SELECT t.query_id, t.vec_id,
                   ROUND(list_aggregate(list(t.t ORDER BY t.m), 'sum')
                         / (MAX(q.qn)
                            * SQRT(list_aggregate(list(t.n2 ORDER BY t.m),
                                                   'sum'))),
                         6) AS cs
            FROM terms t JOIN q ON q.query_id = t.query_id
            GROUP BY t.query_id, t.vec_id
        ) QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cs DESC, vec_id)
                  <= {_PQ_SHORTLIST}
    ),
    reranked AS (
        SELECT query_id, neighbor_id FROM (
            SELECT s.query_id, s.vec_id AS neighbor_id,
                   ROUND({_sql_cosine('q.qemb', 'e.embedding')}, 6) AS cs
            FROM shortlist s
            JOIN embeddings e ON e.vec_id = s.vec_id
            JOIN q ON q.query_id = s.query_id
        ) QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cs DESC, neighbor_id) <= {_PQ_K}
    ),
    exact_topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   ROUND({_sql_cosine('a.embedding', 'b.embedding')}, 6) AS cs
            FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
            WHERE a.vec_id < {_PQ_NQ}
        ) QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cs DESC, neighbor_id) <= {_PQ_K}
    )
    SELECT CAST({_PQ_NQ} AS BIGINT) AS n_queries,
           CAST({_PQ_K} AS BIGINT) AS k,
           COUNT(*) AS pq_hits,
           ROUND(COUNT(*) / {_PQ_NQ * _PQ_K}.0, 4) AS recall,
           TRUE AS recall_ok
    FROM reranked r JOIN exact_topk e USING (query_id, neighbor_id)
    """,
)
def x154_pq_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", rebalance=True)
    is_code = (F.col("vec_id") % _PQ_STRIDE == 0) & (F.col("vec_id") < _PQ_MAXCID)

    # codeword subvectors (also feeds the broadcast codebook row)
    mseq = F.explode(F.sequence(F.lit(1), F.lit(_PQ_M))).alias("m")
    cb_sub = (
        emb.filter(is_code)
        .select(F.col("vec_id").alias("cid"), "embedding", mseq)
        .select(
            "cid",
            "m",
            _pq_slice(F.col("embedding"), F.col("m")).alias("cvec"),
        )
    )
    # ONE broadcast row: __cbs[m] = cid-sorted list of that subvector's
    # PRE-SLICED codewords. Slicing happens K×M times total here, not
    # K×M times per corpus row — higher-order lambdas run interpreted
    # (outside whole-stage codegen), so hoisting the slices out of the
    # per-row argmin is the difference between ~1 s and ~11 s at sf0.1.
    cb_row = (
        cb_sub.groupBy("m")
        .agg(F.sort_array(F.collect_list(F.struct("cid", "cvec"))).alias("cl"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "cl"))),
                lambda s: s["cl"],
            ).alias("__cbs")
        )
    )

    # map-only encoding: codes[m] = argmin_cid round(L2²(sub_m, c_m), 6);
    # the row's own subvectors are sliced ONCE into __subs
    with_subs = emb.select(
        "vec_id",
        "embedding",
        F.transform(
            F.sequence(F.lit(1), F.lit(_PQ_M)),
            lambda m: _pq_slice(F.col("embedding"), m),
        ).alias("__subs"),
    )
    coded = (
        with_subs.crossJoin(F.broadcast(cb_row))
        .select(
            "vec_id",
            "embedding",
            F.transform(
                F.sequence(F.lit(1), F.lit(_PQ_M)),
                lambda m: F.array_min(
                    F.transform(
                        F.element_at(F.col("__cbs"), m),
                        lambda c: F.struct(
                            F.round(
                                _l2sq(F.element_at(F.col("__subs"), m), c["cvec"]),
                                6,
                            ).alias("d"),
                            c["cid"].alias("cid"),
                        ),
                    )
                )["cid"],
            ).alias("codes"),
        )
        # materialization barrier (the x138 discipline): without it,
        # Catalyst collapses this projection through the downstream
        # broadcast joins and re-evaluates the K·M argmin once per
        # (candidate, query) pair — NQ× the encode cost. Encoding runs
        # once; scoring reads codes.
        .localCheckpoint()
    )

    # per-query ADC lookup table: (m·100000 + cid) -> (dot, codeword n²)
    q_sub = (
        emb.filter(F.col("vec_id") < _PQ_NQ)
        .select(F.col("vec_id").alias("query_id"), "embedding", mseq)
        .select(
            "query_id",
            F.sqrt(sq_norm(F.col("embedding"))).alias("qn"),
            "m",
            _pq_slice(F.col("embedding"), F.col("m")).alias("qsub"),
        )
    )
    dt_map = (
        q_sub.join(F.broadcast(cb_sub), "m")
        .select(
            "query_id",
            "qn",
            (F.col("m") * 100000 + F.col("cid")).alias("k"),
            F.struct(
                dot(F.col("qsub"), F.col("cvec")).alias("t"),
                sq_norm(F.col("cvec")).alias("n2"),
            ).alias("v"),
        )
        .groupBy("query_id", "qn")
        .agg(F.map_from_entries(F.collect_list(F.struct("k", "v"))).alias("dt"))
    )

    # ADC scoring: M map lookups per (query, candidate), folded in m order
    def fold(field: str) -> Column:
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(_PQ_M)),
            F.lit(0.0),
            lambda acc, m: acc
            + F.element_at(
                F.col("dt"), m * 100000 + F.element_at(F.col("codes"), m)
            )[field],
        )

    scored = (
        coded.crossJoin(F.broadcast(dt_map))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "embedding",
            F.round(fold("t") / (F.col("qn") * F.sqrt(fold("n2"))), 6).alias("cs"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("vec_id"))
    shortlist = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _PQ_SHORTLIST)
        .select("query_id", "vec_id", "embedding")
    )

    # exact rerank of the shortlist only (C vectors per query, not N)
    qx = emb.filter(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    reranked = (
        shortlist.join(F.broadcast(qx), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("embedding")), 6).alias("cs"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cs"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("rnk") <= _PQ_K)
        .select("query_id", "neighbor_id")
    )

    cx = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    exact_pairs = (
        F.broadcast(qx)
        .join(cx, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cs"),
        )
    )
    we = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    exact_topk = (
        exact_pairs.withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") <= _PQ_K)
        .select("query_id", "neighbor_id")
    )

    denom = _PQ_NQ * _PQ_K
    return (
        reranked.join(exact_topk, ["query_id", "neighbor_id"])
        .agg(F.count(F.lit(1)).alias("pq_hits"))
        .select(
            F.lit(_PQ_NQ).cast("long").alias("n_queries"),
            F.lit(_PQ_K).cast("long").alias("k"),
            F.col("pq_hits"),
            F.round(F.col("pq_hits") / F.lit(float(denom)), 4).alias("recall"),
            (F.col("pq_hits") / F.lit(float(denom)) >= F.lit(_PQ_RECALL_MIN)).alias(
                "recall_ok"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X4j: Johnson–Lindenstrauss sketch — signed random projection of the
# 64-d embeddings down to 8 dims (Achlioptas 2003: ±1 entries preserve
# pairwise distances in expectation). The cheap-ANN/dedup front-end:
# an 8-d sketch makes candidate generation ~8x cheaper while the full
# vector stays available for exact re-ranking.
#
# Scale shape: the DISTRIBUTED MATMUL archetype — vectors posexplode to
# (vec, j, x), the M x d ±1 projection matrix (deterministic md5-parity
# entries, generated by expression, broadcast) joins on j, and ONE
# partial-aggregated groupBy(vec, out_dim) finishes. Because matrix
# entries are exactly ±1, each term is ±x (exact), so the
# decimal-interior sum is order-insensitive and the sketch is
# bit-identical across engines and partitionings.
# ---------------------------------------------------------------------------
_JL_OUT = 8
_JL_IN = 64


@query(
    "x169_jl_projection",
    oracle=f"""
    WITH mat AS (
        SELECT i, j,
               CASE WHEN ('0x' || substring(md5(CAST(i AS VARCHAR) || '|' || CAST(j AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END AS s
        FROM range(0, {_JL_OUT}) AS r1(i), range(0, {_JL_IN}) AS r2(j)
    ),
    ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
               unnest(embedding) AS x
        FROM embeddings WHERE vec_id < 100
    )
    SELECT ex.vec_id, mat.i AS out_dim,
           ROUND(CAST(SUM(CAST(CAST(ex.x AS DOUBLE) * mat.s AS DECIMAL(28, 8)))
                      AS DOUBLE) / SQRT({_JL_OUT}), 6) AS component
    FROM ex JOIN mat ON mat.j = ex.j
    GROUP BY ex.vec_id, mat.i
    """,
)
def x169_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    mat = (
        spark.range(_JL_OUT)
        .withColumnRenamed("id", "i")
        .crossJoin(spark.range(_JL_IN).withColumnRenamed("id", "j"))
        .select(
            "i",
            "j",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|", F.col("i").cast("string"), F.col("j").cast("string")
                            )
                        ),
                        1,
                        1,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2
                == 0,
                1,
            )
            .otherwise(-1)
            .alias("s"),
        )
    )
    ex = emb.select("vec_id", F.posexplode("embedding").alias("j", "x"))
    return (
        ex.join(F.broadcast(mat), "j")
        .groupBy("vec_id", F.col("i").alias("out_dim"))
        .agg(
            F.round(
                F.sum(
                    (F.col("x").cast("double") * F.col("s")).cast("decimal(28,8)")
                ).cast("double")
                / F.sqrt(F.lit(float(_JL_OUT))),
                6,
            ).alias("component")
        )
    )


# ---------------------------------------------------------------------------
# X5g: k-means refinement (Lloyd iterations) — the clustering family's
# iterative-dataflow row, completing the progression stride-init (IVF,
# x71) -> refined centroids: two unrolled assign/update rounds over the
# embedding corpus, then per-cell membership and inertia against the
# refined centroids. This is how production IVF indexes are actually
# trained (coarse quantizer = k-means over a sample); x174/x71 consume
# exactly such centroids.
#
# Scale shape: every step is key-bounded — assignment is pts x K
# broadcast-joined per dim then reduced by (vec, cid) with an exact
# DECIMAL(28,8) interior (dim-order independent, so map-side partials
# commute); the argmin is a partial-aggregable MIN over a (d2, cid)
# struct (ties to the lowest centroid id), never a per-vector window
# sort; centroid update is one |K|·d-bounded aggregate. K iterations =
# K statically-unrolled rounds of the same three bounded shuffles (the
# x138 discipline). At 100 TB the update runs on a sample — the plan
# shape is unchanged.
# ---------------------------------------------------------------------------
_KM_STRIDE = 20


def _km_sql_iter(prev_cent: str, tag: str) -> str:
    """One Lloyd round as oracle CTEs: distances vs ``prev_cent``,
    argmin assignment, decimal-interior centroid update."""
    return f"""
    d{tag} AS (
        SELECT p.vec_id, c.cid,
               SUM(CAST((p.x - c.c) * (p.x - c.c) AS DECIMAL(28,8))) AS d2
        FROM pts p JOIN {prev_cent} c ON p.i = c.i
        GROUP BY p.vec_id, c.cid
    ),
    a{tag} AS (
        SELECT vec_id, cid AS cell, d2 FROM (
            SELECT vec_id, cid, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM d{tag}) WHERE rn = 1
    ),
    c{tag} AS (
        SELECT a.cell AS cid, p.i,
               CAST(CAST(SUM(CAST(p.x AS DECIMAL(28,8))) AS STRING) AS DOUBLE)
                   / COUNT(*) AS c
        FROM pts p JOIN a{tag} a ON p.vec_id = a.vec_id
        GROUP BY a.cell, p.i
    )"""


@query(
    "x178_kmeans_lloyd",
    oracle=f"""
    WITH pts AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ),
    cinit AS (
        SELECT vec_id AS cid, i, x AS c FROM pts WHERE vec_id % {_KM_STRIDE} = 0
    ),
    {_km_sql_iter('cinit', '1')},
    {_km_sql_iter('c1', '2')},
    dfin AS (
        SELECT p.vec_id, c.cid,
               SUM(CAST((p.x - c.c) * (p.x - c.c) AS DECIMAL(28,8))) AS d2
        FROM pts p JOIN c2 c ON p.i = c.i
        GROUP BY p.vec_id, c.cid
    ),
    afin AS (
        SELECT vec_id, cid AS cell, d2 FROM (
            SELECT vec_id, cid, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM dfin) WHERE rn = 1
    )
    SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(CAST(CAST(SUM(d2) AS STRING) AS DOUBLE), 6) AS inertia
    FROM afin GROUP BY cell ORDER BY cell
    """,
)
def x178_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark realizes the SAME arithmetic as the oracle's per-dim
    # explode, but keeps vectors as arrays: the distance is a zip_with
    # fold whose per-dim squares are cast to DECIMAL(28,8) and summed
    # exactly — decimal addition is associative, so the fold equals the
    # oracle's order-free SUM bit-for-bit. That turns the distance pass
    # from a |V|·K·d-row shuffle into a |V|·K-row map against BROADCAST
    # centroid arrays (the ivf_assign shape); only the centroid UPDATE
    # explodes dims, and only |V|·d member rows, once per round.
    # fold accumulator stays DECIMAL(28,8): each addend is cast to
    # (18,8) (exact — per-dim squares are < 2^31) so the addition's
    # result type (29,8) keeps FULL 8-digit scale, then the re-cast to
    # (28,8) is scale-preserving and exact. (A wider accumulator would
    # make Spark type-infer the addition as DECIMAL(38,7) — a silent 7dp
    # rounding the oracle's SUM never performs.)
    DEC18 = "decimal(18,8)"
    DEC28 = "decimal(28,8)"
    e = load_table(spark, sf_dir, "embeddings")
    pts = (
        e.select(
            "vec_id",
            F.transform("embedding", lambda v: v.cast("double")).alias("emb"),
        )
        # the embeddings table is a handful of files — repartition for
        # executor parallelism before the 3 distance passes reuse it
        .repartition(32, "vec_id")
        .localCheckpoint(eager=False)
    )
    cent = pts.filter(F.col("vec_id") % _KM_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
    )

    def distances(cent_df):
        d2 = F.aggregate(
            F.zip_with(F.col("emb"), F.col("cemb"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast(DEC28),
            lambda acc, v: (acc + v.cast(DEC18)).cast(DEC28),
        )
        return pts.crossJoin(F.broadcast(cent_df)).select(
            "vec_id", F.col("cid"), d2.alias("d2")
        )

    def argmin(d2_df):
        # partial-aggregable MIN over (d2, cid): decimal d2 compares
        # exactly, ties break to the lowest centroid id — same row the
        # oracle's ROW_NUMBER picks, but map-side combinable.
        return d2_df.groupBy("vec_id").agg(
            F.min(F.struct(F.col("d2"), F.col("cid"))).alias("m")
        ).select("vec_id", F.col("m.cid").alias("cell"), F.col("m.d2").alias("d2"))

    def update(assign_df):
        # the one per-dim explode: |V|·d member rows -> |K|·d means ->
        # deterministic array rebuild (sort by dim index).
        # MEASURED (r9, VERDICT r8 optional #7): replacing this with a
        # d-wide decimal-sum aggregate (64 SUM(element_at(emb,i)) in
        # one groupBy(cell)) to "cut shuffled rows by the dimension
        # factor" ran 2.6x SLOWER at sf0.1 (9-11s vs 3.9s): the
        # exploded rows never hit the wire — map-side partial
        # aggregation already collapses them to |K|·d per partition —
        # while the wide-buffer decimal agg pays 64 imperative buffer
        # updates per row. The explode stays; the shuffle is
        # |K|·d·partitions either way.
        member_dims = (
            pts.join(assign_df.select("vec_id", "cell"), "vec_id")
            .select("cell", F.posexplode("emb").alias("i", "x"))
            .groupBy(F.col("cell").alias("cid"), "i")
            .agg(
                (F.sum(F.col("x").cast(DEC28)).cast("double") / F.count("x")).alias("c")
            )
        )
        return member_dims.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
            ).alias("cemb")
        )

    for _ in range(2):
        cent = update(argmin(distances(cent)))
    final = argmin(distances(cent))
    return (
        final.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.round(F.sum("d2").cast("double"), 6).alias("inertia"),
        )
        .orderBy("cell")
    )


# ---------------------------------------------------------------------------
# X5h: triplet mining for contrastive / metric learning (round 10) —
# for each anchor: its nearest SAME-label neighbor (the positive) and
# its nearest DIFFERENT-label neighbor (the hard negative), candidates
# confined to the anchor's IVF cell (the x100/x174 discipline: hard
# negatives are close by definition, so the cell IS the candidate set;
# corpus never shuffles, centroids broadcast, pairwise work is
# per-cell-bounded). Emits (anchor, pos, neg) plus the rounded sims and
# a margin bit (positive strictly closer than the hardest negative) —
# the health metric a metric-learning curriculum watches. Determinism:
# cosine rounded to 6 before every rank (the proven x45/x100 treatment),
# ties on neighbor id; the margin compare runs on the two
# hash-identical rounded doubles.
# ---------------------------------------------------------------------------
@query(
    "x197_triplet_mining",
    oracle=f"""
    WITH centroids AS (
        SELECT vec_id AS cid, embedding AS cemb
        FROM embeddings WHERE vec_id % {IVF_STRIDE} = 0
    ),
    assign AS (
        SELECT vec_id, embedding, label, cid AS cell FROM (
            SELECT e.vec_id, e.embedding, e.label, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY ROUND({_sql_cosine('e.embedding', 'c.cemb')}, 6) DESC,
                                c.cid
                   ) AS rn
            FROM embeddings e CROSS JOIN centroids c
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT q.vec_id AS anchor_id, q.label AS anchor_label,
               n.vec_id AS neighbor_id, n.label AS neighbor_label,
               ROUND({_sql_cosine('q.embedding', 'n.embedding')}, 6) AS cos_sim
        FROM assign q JOIN assign n
          ON q.cell = n.cell AND q.vec_id <> n.vec_id
        WHERE q.vec_id < {4 * N_PROBE}
    ),
    pos AS (
        SELECT anchor_id, neighbor_id AS pos_id, cos_sim AS pos_sim FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY cos_sim DESC, neighbor_id) AS r
            FROM pairs WHERE neighbor_label = anchor_label
        ) WHERE r = 1
    ),
    neg AS (
        SELECT anchor_id, neighbor_id AS neg_id, cos_sim AS neg_sim FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY cos_sim DESC, neighbor_id) AS r
            FROM pairs WHERE neighbor_label <> anchor_label
        ) WHERE r = 1
    )
    SELECT p.anchor_id, p.pos_id, n.neg_id, p.pos_sim, n.neg_sim,
           CAST(CASE WHEN p.pos_sim > n.neg_sim THEN 1 ELSE 0 END AS INT)
               AS margin_ok
    FROM pos p JOIN neg n USING (anchor_id)
    """,
)
def x197_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.operators.ivf import ivf_assign

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = ivf_assign(emb, centroid_stride=IVF_STRIDE).join(
        emb.select("vec_id", "label"), "vec_id"
    )
    anchors = assigned.filter(F.col("vec_id") < 4 * N_PROBE).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("__aemb"),
        F.col("label").alias("anchor_label"),
        "cell",
    )
    cand = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__nemb"),
        F.col("label").alias("neighbor_label"),
        "cell",
    )
    pairs = (
        anchors.join(cand, "cell")
        .filter(F.col("anchor_id") != F.col("neighbor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            "neighbor_id",
            "neighbor_label",
            F.round(cosine(F.col("__aemb"), F.col("__nemb")), 6).alias(
                "cos_sim"
            ),
        )
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    pos = (
        pairs.filter(F.col("neighbor_label") == F.col("anchor_label"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "anchor_id",
            F.col("neighbor_id").alias("pos_id"),
            F.col("cos_sim").alias("pos_sim"),
        )
    )
    neg = (
        pairs.filter(F.col("neighbor_label") != F.col("anchor_label"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "anchor_id",
            F.col("neighbor_id").alias("neg_id"),
            F.col("cos_sim").alias("neg_sim"),
        )
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "pos_id",
        "neg_id",
        "pos_sim",
        "neg_sim",
        F.when(F.col("pos_sim") > F.col("neg_sim"), 1)
        .otherwise(0)
        .cast("int")
        .alias("margin_ok"),
    )


# ---------------------------------------------------------------------------
# X5i: IVF index health report (VERDICT r10 #5) — the number the
# frozen-centroid rebuild decision needs. append_ivf_index deliberately
# never re-derives centroids (cell boundaries must not drift silently);
# the flip side is that a corpus whose distribution walks away from the
# build-time centroids degrades probe recall with no error anywhere.
# x198 drives operators/ivf.ivf_health_report through the hard gate:
# build the index over vec_id % 3 != 0, append vec_id % 3 == 0 under
# the frozen centroids, then report per cell the size skew
# (built vs appended counts, integer appended_pct) and the
# assignment-quality drift (mean rounded cosine of each population to
# its cell centroid — exact decimal sums, one final division — plus an
# engine-stable drift flag). The DuckDB oracle replays the whole
# thing arithmetically: same assignment (x197's ROW_NUMBER pattern over
# rounded cosines, ties on centroid id), same decimal-interior means.
# ---------------------------------------------------------------------------
@query(
    "x198_ivf_health_report",
    oracle=f"""
    WITH centroids AS (
        SELECT vec_id AS cid, embedding AS cemb
        FROM embeddings WHERE vec_id % {IVF_STRIDE} = 0 AND vec_id % 3 <> 0
    ),
    assign AS (
        SELECT vec_id, is_app, cell, c6 FROM (
            SELECT e.vec_id, (e.vec_id % 3 = 0) AS is_app, c.cid AS cell,
                   ROUND({_sql_cosine('e.embedding', 'c.cemb')}, 6) AS c6,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY ROUND({_sql_cosine('e.embedding', 'c.cemb')}, 6)
                                DESC, c.cid
                   ) AS rn
            FROM embeddings e CROSS JOIN centroids c
        ) WHERE rn = 1
    ),
    agg AS (
        SELECT cell,
               CAST(COUNT(*) FILTER (WHERE NOT is_app) AS BIGINT) AS n_built,
               CAST(COUNT(*) FILTER (WHERE is_app) AS BIGINT) AS n_appended,
               SUM(CAST(CASE WHEN NOT is_app THEN c6 ELSE 0 END
                        AS DECIMAL(28,8))) AS sb,
               SUM(CAST(CASE WHEN is_app THEN c6 ELSE 0 END
                        AS DECIMAL(28,8))) AS sa
        FROM assign GROUP BY cell
    )
    SELECT CAST(cell AS BIGINT) AS cell, n_built, n_appended,
           CAST((100 * n_appended) // GREATEST(n_built, 1) AS BIGINT)
               AS appended_pct,
           CASE WHEN n_built > 0
                THEN CAST(CAST(sb AS STRING) AS DOUBLE) / n_built END
               AS mean_cos_built,
           CASE WHEN n_appended > 0
                THEN CAST(CAST(sa AS STRING) AS DOUBLE) / n_appended END
               AS mean_cos_appended,
           CAST(CASE WHEN n_built > 0 AND n_appended > 0
                      AND CAST(CAST(sa AS STRING) AS DOUBLE) / n_appended
                          < CAST(CAST(sb AS STRING) AS DOUBLE) / n_built - 0.05
                     THEN 1 ELSE 0 END AS INT) AS drift_flag
    FROM agg ORDER BY cell
    """,
)
def x198_ivf_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.operators.ivf import (
        append_ivf_index,
        ivf_health_report,
        save_ivf_index,
    )
    from ua2sql_spark.queries.common import fixture_artifact

    emb = load_table(spark, sf_dir, "embeddings")
    built = emb.filter(F.col("vec_id") % 3 != 0)
    appended = emb.filter(F.col("vec_id") % 3 == 0)

    # The grown index is a pure function of `embeddings`: build + append
    # ride the shared fixture cache (the driver's fresh process still
    # does both exactly once).
    def build(path: str) -> None:
        save_ivf_index(built, path, centroid_stride=IVF_STRIDE)
        append_ivf_index(spark, appended, path)

    path = fixture_artifact(spark, sf_dir, "x198idx", "embeddings", build)
    return ivf_health_report(spark, path).orderBy("cell")
