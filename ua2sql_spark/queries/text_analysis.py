"""Text-analysis operators: SURVEY.md §2.11 X3 — language-ID heuristic,
quality scoring, token counting, document fingerprinting — over the
``documents`` table. All pure column expressions (no UDF): at 100 TB
these run inside whole-stage codegen on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ua2sql_spark.catalog import load_table
from ua2sql_spark.registry import query

STOPWORDS = ("the", "a")


# ---------------------------------------------------------------------------
# X3a: token counting — whitespace tokens, regex alpha tokens, distinct
# tokens, mean token length.
# ---------------------------------------------------------------------------
@query(
    "x48_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
           ROUND(CAST(list_aggregate(list_transform(string_split(text, ' '), w -> len(w)), 'sum')
                      AS DOUBLE) / len(string_split(text, ' ')), 6) AS mean_token_len
    FROM documents
    """,
)
def x48_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    total_len = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+")).cast("long").alias("n_alpha_tokens"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct_tokens"),
        F.round(total_len / F.size(words), 6).alias("mean_token_len"),
    )


# ---------------------------------------------------------------------------
# X3b: quality scoring — lexical-diversity / stopword / length heuristics
# composed into one score (the Gopher-rules-style filter shape).
# ---------------------------------------------------------------------------
@query(
    "x49_quality_score",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq,
               CAST(len(list_filter(string_split(text, ' '),
                    w -> w IN ({', '.join(repr(s) for s in STOPWORDS)}))) AS DOUBLE) AS n_stop
        FROM documents
    )
    SELECT doc_id, lang,
           ROUND(n_uniq / n_words, 6) AS uniq_ratio,
           ROUND(n_stop / n_words, 6) AS stop_ratio,
           ROUND(0.5 * (n_uniq / n_words) + 0.2 * (1 - n_stop / n_words)
                 + 0.3 * LEAST(n_words / 50, CAST(1 AS DOUBLE)), 6) AS quality,
           (n_words >= 20 AND n_uniq / n_words >= 0.2) AS passes_filter
    FROM feats
    """,
)
def x49_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words).cast("double")
    n_uniq = F.size(F.array_distinct(words)).cast("double")
    is_stop = lambda w: w.isin(*STOPWORDS)  # noqa: E731
    n_stop = F.size(F.filter(words, is_stop)).cast("double")
    uniq_ratio = n_uniq / n_words
    stop_ratio = n_stop / n_words
    quality = (
        F.lit(0.5) * uniq_ratio
        + F.lit(0.2) * (F.lit(1) - stop_ratio)
        + F.lit(0.3) * F.least(n_words / F.lit(50), F.lit(1.0))
    )
    return d.select(
        "doc_id",
        "lang",
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
        ((n_words >= 20) & (uniq_ratio >= 0.2)).alias("passes_filter"),
    )


# ---------------------------------------------------------------------------
# X3c: language-ID heuristic — marker-word scores per candidate language,
# argmax with fixed precedence. (The fixtures' vocabulary is English-ish
# word soup, so the heuristic's *mechanism* is what's under test; scores
# and the argmax rule are deterministic and mirrored in the oracle.)
# ---------------------------------------------------------------------------
_MARKERS = {
    "en": ("the", "a", "fast", "slow"),
    "es": ("la", "el", "que", "de"),
    "de": ("der", "die", "und", "nicht"),
}


def _marker_count_sql(lang: str) -> str:
    words = ", ".join(repr(w) for w in _MARKERS[lang])
    return f"CAST(len(list_filter(string_split(text, ' '), w -> w IN ({words}))) AS BIGINT)"


@query(
    "x50_langid",
    oracle=f"""
    WITH scores AS (
        SELECT doc_id, lang,
               {_marker_count_sql('en')} AS score_en,
               {_marker_count_sql('es')} AS score_es,
               {_marker_count_sql('de')} AS score_de
        FROM documents
    )
    SELECT doc_id, lang, score_en, score_es, score_de,
           CASE WHEN score_en >= score_es AND score_en >= score_de THEN 'en'
                WHEN score_es >= score_de THEN 'es'
                ELSE 'de' END AS predicted_lang,
           (CASE WHEN score_en >= score_es AND score_en >= score_de THEN 'en'
                 WHEN score_es >= score_de THEN 'es'
                 ELSE 'de' END = lang) AS is_correct
    FROM scores
    """,
)
def x50_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")

    def score(lang: str):
        return F.size(F.filter(words, lambda w: w.isin(*_MARKERS[lang]))).cast("long")

    scored = d.select(
        "doc_id",
        "lang",
        score("en").alias("score_en"),
        score("es").alias("score_es"),
        score("de").alias("score_de"),
    )
    predicted = (
        F.when(
            (F.col("score_en") >= F.col("score_es")) & (F.col("score_en") >= F.col("score_de")),
            "en",
        )
        .when(F.col("score_es") >= F.col("score_de"), "es")
        .otherwise("de")
    )
    return scored.select(
        "*",
        predicted.alias("predicted_lang"),
        (predicted == F.col("lang")).alias("is_correct"),
    )


# ---------------------------------------------------------------------------
# X3d: document fingerprinting — positional 3-word shingles hashed with
# md5; emit min/max shingle hash (winnowing-style anchors) + shingle
# cardinality. Shared shingle construction via 1-based sequence indexing.
# ---------------------------------------------------------------------------
@query(
    "x51_shingle_fingerprint",
    oracle="""
    SELECT doc_id,
           MIN(md5(sh)) AS min_shingle_hash,
           MAX(md5(sh)) AS max_shingle_hash,
           COUNT(DISTINCT sh) AS n_distinct_shingles
    FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        WHERE len(w) >= 3
    )
    GROUP BY doc_id
    """,
)
def x51_shingle_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.functions.arrays import let

    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    # let-bound: the per-position lambda touches only the bound word
    # array, never the split expression (which would re-run per shingle)
    shingles = let(
        w,
        lambda ws: F.transform(
            F.sequence(F.lit(1), F.size(ws) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(ws, i),
                F.element_at(ws, i + 1),
                F.element_at(ws, i + 2),
            ),
        ),
    )
    return (
        d.filter(F.size(w) >= 3)
        .select("doc_id", F.explode(shingles).alias("sh"))
        .groupBy("doc_id")
        .agg(
            F.min(F.md5("sh")).alias("min_shingle_hash"),
            F.max(F.md5("sh")).alias("max_shingle_hash"),
            F.countDistinct("sh").alias("n_distinct_shingles"),
        )
    )


# ---------------------------------------------------------------------------
# X3e: BPE-style pre-tokenization count — the GPT-2 pretokenizer regex
# shape (contraction suffixes | space-prefixed word | space-prefixed
# number | space-prefixed punctuation run | whitespace run), restricted
# to constructs Java regex and RE2 (DuckDB) treat identically (no
# lookahead, no unicode classes). The count of pre-tokens is the usual
# proxy for "token count" before a real BPE merge table is applied.
# ---------------------------------------------------------------------------
_BPE_RE = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"


@query(
    "x84_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens
    FROM documents
    """,
)
def x84_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_BPE_RE)).cast("long").alias("n_bpe_tokens"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_ws_tokens"),
    )


# ---------------------------------------------------------------------------
# X3f: deterministic stratified sampling — k docs per stratum (lang),
# selected by content-hash order. Unlike `df.sample`/`sampleBy` (whose
# per-partition RNG makes results depend on physical partitioning), the
# hash order is a pure function of content: stable under re-runs,
# repartitioning, and incremental corpus growth — the property that
# makes a training subset reproducible. Physically a WindowGroupLimit
# top-k per stratum: each task keeps k rows per group before the
# shuffle, so the exchange carries ≤ k·|strata| rows per partition.
# ---------------------------------------------------------------------------
_SAMPLE_K = 50


@query(
    "x90_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY sha256(text), doc_id) AS rn
        FROM documents
    ) WHERE rn <= {_SAMPLE_K}
    """,
)
def x90_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.sha2(F.col("text"), 256), F.asc("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SAMPLE_K)
        .select("doc_id", "lang", "source")
    )


# ---------------------------------------------------------------------------
# X3g: distinctive terms per document — the TF-IDF shape ranked by
# (tf DESC, df ASC) instead of tf·log(N/df), which keeps every compared
# value an exact integer (cross-engine log() can differ in the last
# ulp; ranks on ints cannot). Two aggregations: term frequency per
# (doc, term), document frequency per term — both hash aggs with
# map-side partials; the df relation (|vocab| rows) joins back on term.
# ---------------------------------------------------------------------------
_TOP_TERMS = 3
_TERM_DOCS = 100


@query(
    "x91_distinctive_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(
                   list_filter(string_split_regex(lower(text), '[^a-z]+'),
                               t -> len(t) >= 3))) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              t -> len(t) >= 3)) AS term
        FROM documents WHERE doc_id < {_TERM_DOCS}
    ),
    tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term),
    dfc AS (SELECT term, COUNT(*) AS df FROM toks GROUP BY term)
    SELECT doc_id, term, tf, df FROM (
        SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.df,
               ROW_NUMBER() OVER (PARTITION BY tfc.doc_id
                                  ORDER BY tfc.tf DESC, dfc.df ASC, tfc.term) AS rn
        FROM tfc JOIN dfc ON tfc.term = dfc.term
    ) WHERE rn <= {_TOP_TERMS}
    """,
)
def x91_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    terms = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"),
        lambda t: F.length(t) >= 3,
    )
    tf = (
        d.filter(F.col("doc_id") < _TERM_DOCS)
        .select("doc_id", F.explode(terms).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = (
        d.select(F.explode(F.array_distinct(terms)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(dfc, "term")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_TERMS)
        .select("doc_id", "term", "tf", "df")
    )


# ---------------------------------------------------------------------------
# X3g: corpus-trained unigram language-model scoring — the CCNet-style
# quality signal: train the model (word -> corpus frequency) with ONE
# aggregation over the corpus itself, then score every document by its
# words' mean and minimum log-probability. Improbable-word-heavy docs
# (garbled text, boilerplate, OCR noise) surface at the bottom.
#
# Scale: the "model" is a DataFrame, never collected — train is one
# word shuffle with map-side partial aggregation; scoring joins the
# exploded corpus to the model on word (AQE broadcast-converts the
# model side when the vocabulary is small); the corpus-total is a
# 1-row broadcast. Contrast x108_vocab_oov, which checks against a
# FIXED bounded vocabulary; this one trains on unbounded corpora.
#
# Determinism RE-KEY (VERDICT r11 #6, retiring the last local-only
# exception): the original hashed ROUND(LN(p), 4) — exactly the
# multi-op transcendental chain that made x155 red in r7/r8 (libm LN
# disagrees between engines at the .00005 rounding boundary). Scoring
# is now WHOLE-BIT surprisal via integer bit length:
# bits(n) = len(binary(n)) = floor(log2 n) + 1, computed by radix
# conversion (Spark CONV(n,10,2) / DuckDB BIN(n)) — pure integer
# arithmetic, zero libm anywhere — and
# surprisal_bits(word) = bits(total) - bits(cnt) ≈ log2(total/cnt),
# the LM surprisal at 1-bit resolution. Every hashed column is a
# BIGINT; the mean is the exact sum over the exact count in one IEEE
# division of identical operands (the davg pattern). Fractional
# resolution stays available through x189's rational rarity
# (total/cnt, a monotone twin of logprob at full precision).
# ---------------------------------------------------------------------------
@query(
    "x125_unigram_logprob",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    vocab AS (SELECT word, COUNT(*) AS cnt FROM words GROUP BY word),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
    scored AS (
        SELECT w.doc_id,
               CAST(LENGTH(BIN(t.total)) - LENGTH(BIN(v.cnt)) AS BIGINT)
                   AS sbits
        FROM words w JOIN vocab v USING (word) CROSS JOIN tot t
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM(sbits) AS BIGINT) AS sum_surprisal_bits,
           CAST(MIN(sbits) AS BIGINT) AS min_surprisal_bits,
           CAST(MAX(sbits) AS BIGINT) AS max_surprisal_bits,
           CAST(SUM(sbits) AS DOUBLE) / COUNT(*) AS avg_surprisal_bits
    FROM scored GROUP BY doc_id
    """,
)
def x125_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    bits = lambda c: F.length(F.conv(c.cast("string"), 10, 2))  # noqa: E731
    sbits = (bits(F.col("total")) - bits(F.col("cnt"))).cast("bigint")
    scored = (
        words.join(vocab, "word")
        .crossJoin(F.broadcast(total))
        .select("doc_id", sbits.alias("sbits"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        F.sum("sbits").cast("bigint").alias("sum_surprisal_bits"),
        F.min("sbits").cast("bigint").alias("min_surprisal_bits"),
        F.max("sbits").cast("bigint").alias("max_surprisal_bits"),
        (F.sum("sbits").cast("double") / F.count(F.lit(1))).alias(
            "avg_surprisal_bits"
        ),
    )


# ---------------------------------------------------------------------------
# X3h: BPE merge-pair counting — the inner statistic of a BPE tokenizer
# training round: for every adjacent character pair inside a word,
# count corpus-weighted occurrences; the arg-max pair is the next merge.
# The classic trainer trick (Sennrich et al. 2016; used by every
# production BPE implementation) makes this tractable at corpus scale:
# aggregate the corpus to its DISTINCT-WORD dictionary first (one
# shuffle, output |vocab| rows — millions, not billions), then explode
# character pairs over the dictionary only, weighting each pair by the
# word's corpus frequency. The pair explode — the quadratic-looking
# part — runs over the vocabulary, which is ~5 orders of magnitude
# smaller than a 100 TB corpus; the corpus-sized stage is a plain
# word-count. Top pairs are returned with a total (count DESC, pair)
# order so the merge choice is deterministic.
# ---------------------------------------------------------------------------
_MERGE_TOPK = 30


@query(
    "x134_bpe_merge_pairs",
    oracle=f"""
    WITH vocab AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        )
        WHERE len(word) >= 2
        GROUP BY word
    ),
    pairs AS (
        SELECT substring(word, i, 2) AS pair, freq
        FROM vocab, unnest(range(1, len(word))) AS t(i)
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {_MERGE_TOPK}
    """,
)
def x134_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    # Adjacent character pairs via substring over 1..len-1 — pure
    # codegen (sequence + transform + explode), no UDF.
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(_MERGE_TOPK)
    )


# ---------------------------------------------------------------------------
# X3i: tokenizer FERTILITY per language — subword tokens per whitespace
# word, the standard multilingual-tokenizer health metric (fertility
# >> 1 for a language means its text fragments into many subwords:
# under-allocated vocabulary, inflated sequence lengths, higher
# training cost per byte of that language). Corpus-level ratio from
# exact integer token/word counts (one agg shuffle, deterministic
# division), using the same GPT-2-style pretokenizer regex as x84.
# ---------------------------------------------------------------------------
@query(
    "x151_tokenizer_fertility",
    oracle=f"""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}'))) AS BIGINT)
               AS n_subword_tokens,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
           ROUND(CAST(SUM(len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}'))) AS DOUBLE)
                 / SUM(len(string_split(text, ' '))), 6) AS fertility
    FROM documents
    GROUP BY lang
    """,
)
def x151_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sub = F.regexp_count(F.col("text"), F.lit(_BPE_RE)).cast("bigint")
    words = F.size(F.split(F.col("text"), " ")).cast("bigint")
    agg = d.groupBy("lang").agg(
        F.sum(sub).alias("n_subword_tokens"),
        F.sum(words).alias("n_words"),
    )
    return agg.select(
        "lang",
        "n_subword_tokens",
        "n_words",
        F.round(
            F.col("n_subword_tokens").cast("double") / F.col("n_words"), 6
        ).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# X3i: BM25 relevance search — the standard lexical retrieval scorer
# (Robertson/Sparck-Jones; the Lucene-default `k1=1.2, b=0.75` variant
# with the +1 idf floor). Complements the embedding-based retrieval
# family (x45/x71/x130): production corpus search is hybrid, and the
# lexical leg is BM25.
#
# Scale shape: one corpus-sized word explode feeds (a) per-doc length
# and (b) term frequencies FILTERED to the query terms before the
# shuffle — the grouped state is |query terms| x |matching docs|, not
# the corpus vocabulary. Document frequencies and the corpus totals are
# tiny aggregates broadcast back; the final top-k is TakeOrderedAndProject,
# never a global sort. Determinism: idf and the tf-factor are rounded
# at fixed points and summed through a decimal interior (the x125
# pattern), so Spark and DuckDB hash-match bit-exactly.
# ---------------------------------------------------------------------------
_BM25_TERMS = ("hash", "join", "merge")
_BM25_TOPK = 20


@query(
    "x158_bm25_search",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    dl AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM words GROUP BY doc_id
    ),
    totals AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS total_dl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
        FROM words WHERE w IN ('hash', 'join', 'merge')
        GROUP BY doc_id, w
    ),
    idf AS (
        SELECT w,
               ROUND(LN(((n_docs - df) + 0.5) / (df + 0.5) + 1.0), 4) AS idf
        FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
             totals
    ),
    scored AS (
        SELECT tf.doc_id,
               ROUND(idf.idf * ROUND(
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (0.25 + 0.75 *
                       (CAST(d.dl * totals.n_docs AS DOUBLE) / totals.total_dl))),
                   4), 4) AS s
        FROM tf
        JOIN idf USING (w)
        JOIN dl AS d USING (doc_id), totals
    )
    SELECT doc_id,
           CAST(SUM(CAST(s AS DECIMAL(28, 8))) AS DOUBLE) AS bm25,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM scored
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT {_BM25_TOPK}
    """,
)
def x158_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    # ONE corpus explode + ONE doc-level shuffle: document length and
    # the per-query-term tfs come out of the same aggregate (conditional
    # sums), instead of exploding the corpus once for dl and again for
    # tf — at 100 TB the explode is the dominant cost, so pay it once.
    # localCheckpoint realizes the single-explode claim: stats feeds
    # dl, totals, AND tf below, and without materialization Spark
    # re-executes the corpus explode + doc-level shuffle per consumer
    # (measured: 25 stages / 0 ReusedExchange → 17 stages).
    stats = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("w") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    ).localCheckpoint(eager=False)
    dl = stats.select("doc_id", "dl")
    totals = stats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    stack_args = ", ".join(
        f"'{t}', tf_{i}" for i, t in enumerate(_BM25_TERMS)
    )
    tf = (
        stats.selectExpr(
            "doc_id", f"stack({len(_BM25_TERMS)}, {stack_args}) AS (w, tf)"
        )
        .filter(F.col("tf") > 0)
        .select("doc_id", "w", F.col("tf").cast("bigint").alias("tf"))
    )
    df_ = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.crossJoin(F.broadcast(totals)).select(
        "w",
        F.round(
            F.log(
                ((F.col("n_docs") - F.col("df")) + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
            4,
        ).alias("idf"),
    )
    tff = F.round(
        (F.col("tf") * F.lit(2.2))
        / (
            F.col("tf")
            + F.lit(1.2)
            * (
                F.lit(0.25)
                + F.lit(0.75)
                * (
                    (F.col("dl") * F.col("n_docs")).cast("double")
                    / F.col("total_dl")
                )
            )
        ),
        4,
    )
    scored = (
        tf.join(F.broadcast(idf), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", F.round(F.col("idf") * tff, 4).alias("s"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum(F.col("s").cast("decimal(28,8)")).cast("double").alias("bm25"),
        F.count(F.lit(1)).alias("n_terms"),
    )
    return agg.orderBy(F.desc("bm25"), "doc_id").limit(_BM25_TOPK)


# ---------------------------------------------------------------------------
# X3j: inverted-index construction — positional posting lists for the
# query-term vocabulary: (term, doc, tf, sorted positions). The
# retrieval-infra build step BM25 (x158) queries against; positions
# enable phrase/proximity matching. Restricted here to the x158 query
# terms so the output is demonstrably bounded; production builds run
# the identical plan over the full vocabulary, sharded by term.
#
# Scale shape: posexplode + an early term filter (pushed below the
# shuffle), ONE groupBy(term, doc) packing positions map-side into a
# sorted array — posting lists build in a single shuffle, and no
# posting ever crosses docs (the per-row array is bounded by one doc's
# term frequency).
# ---------------------------------------------------------------------------


@query(
    "x170_inverted_index",
    oracle="""
    WITH pos AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS p
        FROM documents
    )
    SELECT w AS term, doc_id,
           CAST(COUNT(*) AS BIGINT) AS tf,
           ARRAY_TO_STRING(list_sort(list(p)), ',') AS positions
    FROM pos
    WHERE w IN ('hash', 'join', 'merge')
    GROUP BY w, doc_id
    """,
)
def x170_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("p0", "w")
    ).select("doc_id", "w", (F.col("p0") + 1).cast("bigint").alias("p"))
    return (
        pos.filter(F.col("w").isin("hash", "join", "merge"))
        .groupBy(F.col("w").alias("term"), F.col("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("tf"),
            # joined string, not a raw array: the registry's policy for
            # collection outputs (see q20) — deterministic AND hashable
            # under the driver's order-insensitive value compare
            F.concat_ws(",", F.sort_array(F.collect_list("p"))).alias(
                "positions"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X3k: positional phrase match — docs where 'hash' is IMMEDIATELY
# followed by 'join', resolved from the x170 posting lists alone (the
# reason positional indexes exist): join the two terms' postings on
# doc, then one higher-order overlap test — shift the first term's
# positions by +1 and intersect. No text re-scan, no regex; phrase
# semantics at index speed.
#
# Scale shape: postings for exactly two terms join on doc_id (both
# sides pre-shrunk by the term filter), the overlap test is per-row
# array math bounded by tf, and n_matches counts the phrase
# occurrences exactly.
# ---------------------------------------------------------------------------


@query(
    "x171_phrase_match",
    oracle="""
    WITH pos AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS p
        FROM documents
    ),
    postings AS (
        SELECT w, doc_id, list_sort(list(p)) AS ps
        FROM pos WHERE w IN ('hash', 'join')
        GROUP BY w, doc_id
    )
    SELECT a.doc_id,
           CAST(len(list_intersect(list_transform(a.ps, x -> x + 1), b.ps))
                AS BIGINT) AS n_matches
    FROM postings a JOIN postings b USING (doc_id)
    WHERE a.w = 'hash' AND b.w = 'join'
      AND len(list_intersect(list_transform(a.ps, x -> x + 1), b.ps)) > 0
    ORDER BY doc_id
    """,
)
def x171_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("p0", "w")
    ).select("doc_id", "w", (F.col("p0") + 1).cast("bigint").alias("p"))
    postings = (
        pos.filter(F.col("w").isin("hash", "join"))
        .groupBy("w", "doc_id")
        .agg(F.sort_array(F.collect_list("p")).alias("ps"))
        .localCheckpoint()  # both phrase sides reuse it — one explode
    )
    a = postings.filter(F.col("w") == "hash").select(
        "doc_id", F.col("ps").alias("pa")
    )
    b = postings.filter(F.col("w") == "join").select(
        "doc_id", F.col("ps").alias("pb")
    )
    shifted = F.transform(F.col("pa"), lambda x: x + 1)
    n = F.size(F.array_intersect(shifted, F.col("pb")))
    return (
        a.join(b, "doc_id")
        .select("doc_id", n.cast("bigint").alias("n_matches"))
        .filter(F.col("n_matches") > 0)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# X3h: Gopher-style repetition signals (Rae et al. 2021 §A1.1 — the
# quality-filter family every production corpus build runs alongside
# x49's ratio gate): per document, the most-frequent word-bigram's
# share of all bigram slots and the duplicated word-trigram fraction.
# Pages that fail either are listy/boilerplate/SEO-spun text that the
# simple length/stopword gate misses.
#
# SCALE SHAPE: trigram duplication is PURE EXPRESSION work
# (size(arr) - size(array_distinct(arr)) — map-only, whole-stage
# codegen); the bigram mode needs a per-(doc, gram) count, one
# explode + two doc-keyed shuffles, no joins. DETERMINISM: hashed
# columns are integer counts and ROUND(ratio-of-integers, 6); the
# pass/fail gates are INTEGER cross-multiplications (top*5 <= n2,
# dup*10 <= n3*3), never float compares — the x133/x155 policy.
# ---------------------------------------------------------------------------
@query(
    "x188_repetition_signals",
    oracle="""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS ws
        FROM documents WHERE len(string_split(text, ' ')) >= 3
    ),
    expr_side AS (
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(len(ws) - 1 AS BIGINT) AS n_2grams,
               CAST(len(ws) - 2 AS BIGINT) AS n_3grams,
               CAST(len(ws) - 2
                    - len(list_distinct(list_transform(
                          range(0, len(ws) - 2),
                          i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3])))
                    AS BIGINT) AS n_dup_3grams
        FROM base
    ),
    g2 AS (
        SELECT doc_id,
               unnest(list_transform(range(0, len(ws) - 1),
                      i -> ws[i + 1] || ' ' || ws[i + 2])) AS gram
        FROM base
    ),
    counts AS (
        SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram
    ),
    top2 AS (
        SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_2gram_n
        FROM counts GROUP BY doc_id
    )
    SELECT e.doc_id, e.n_words, e.n_2grams, t.top_2gram_n,
           e.n_3grams, e.n_dup_3grams,
           ROUND(CAST(t.top_2gram_n AS DOUBLE) / e.n_2grams, 6)
               AS top_2gram_frac,
           ROUND(CAST(e.n_dup_3grams AS DOUBLE) / e.n_3grams, 6)
               AS dup_3gram_frac,
           (t.top_2gram_n * 5 <= e.n_2grams
            AND e.n_dup_3grams * 10 <= e.n_3grams * 3) AS gopher_pass
    FROM expr_side e JOIN top2 t USING (doc_id)
    """,
)
def x188_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    ws = F.split(F.col("text"), " ")
    base = d.select("doc_id", ws.alias("ws")).filter(F.size("ws") >= 3)
    g2 = F.transform(
        F.sequence(F.lit(0), F.size("ws") - 2),
        lambda i: F.concat_ws(" ", F.get("ws", i), F.get("ws", i + 1)),
    )
    g3 = F.transform(
        F.sequence(F.lit(0), F.size("ws") - 3),
        lambda i: F.concat_ws(
            " ", F.get("ws", i), F.get("ws", i + 1), F.get("ws", i + 2)
        ),
    )
    # Two doc-keyed sides, joined (the oracle's CTE structure): the
    # trigram metrics are EXPRESSION-ONLY (map-side codegen, no
    # shuffle), the bigram mode is one explode + two tiny aggregates.
    # Deliberately NOT one select: carrying the non-cheap array
    # expressions through the same projection as the explode makes
    # codegen re-evaluate them per exploded row — a measured 10x
    # slowdown (15.4 s -> 1.5 s at sf0.1). The join is |docs|-sized on
    # both sides; AQE broadcasts it.
    metrics = base.select(
        "doc_id",
        F.size("ws").cast("bigint").alias("n_words"),
        (F.size("ws") - 1).cast("bigint").alias("n_2grams"),
        (F.size("ws") - 2).cast("bigint").alias("n_3grams"),
        (F.size(g3) - F.size(F.array_distinct(g3))).cast("bigint").alias(
            "n_dup_3grams"
        ),
    )
    top2 = (
        base.select("doc_id", F.explode(g2).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("bigint").alias("top_2gram_n"))
    )
    per_doc = metrics.join(top2, "doc_id")
    return per_doc.select(
        "doc_id",
        "n_words",
        "n_2grams",
        "top_2gram_n",
        "n_3grams",
        "n_dup_3grams",
        F.round(F.col("top_2gram_n").cast("double") / F.col("n_2grams"), 6).alias(
            "top_2gram_frac"
        ),
        F.round(F.col("n_dup_3grams").cast("double") / F.col("n_3grams"), 6).alias(
            "dup_3gram_frac"
        ),
        (
            (F.col("top_2gram_n") * 5 <= F.col("n_2grams"))
            & (F.col("n_dup_3grams") * 10 <= F.col("n_3grams") * 3)
        ).alias("gopher_pass"),
    )


# ---------------------------------------------------------------------------
# X3i: corpus-trained word-rarity scoring — the driver-gateable twin of
# x125's unigram-LM log-probability. Same plan shape (one vocab shuffle
# trains the model, a word join scores every doc) and a monotone-
# equivalent signal, but every hashed column is transcendental-free:
# the per-word surprisal proxy is the RATIONAL inverse relative
# frequency total/cnt (ln(total/cnt) is a strictly increasing function
# of it, so rankings and threshold gates agree), quantized to 4
# decimals and summed through the decimal interior. x125 keeps the true
# log-prob semantics for local use; this row carries the family's
# cross-engine hash gate (the x155 lesson: never hash EXP/LN output —
# PLANS.md / VERDICT r7 wrong-#1).
# SCALE SHAPE: vocab is one word shuffle; `total` is a 1-row broadcast;
# scoring is the word join + one doc-keyed aggregate — no Python.
# ---------------------------------------------------------------------------
@query(
    "x189_word_rarity",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    vocab AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM words GROUP BY word),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
    scored AS (
        SELECT w.doc_id, v.cnt,
               ROUND(CAST(t.total AS DOUBLE) / v.cnt, 4) AS rarity
        FROM words w JOIN vocab v USING (word) CROSS JOIN tot t
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(MIN(cnt) AS BIGINT) AS rarest_cnt,
           CAST(MAX(rarity) AS DOUBLE) AS max_rarity,
           CAST(CAST(SUM(CAST(rarity AS DECIMAL(28,8))) AS STRING) AS DOUBLE)
                 / COUNT(*) AS avg_rarity
    FROM scored GROUP BY doc_id
    """,
)
def x189_word_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    rarity = F.round(F.col("total").cast("double") / F.col("cnt"), 4)
    scored = (
        words.join(vocab, "word")
        .crossJoin(F.broadcast(total))
        .select("doc_id", "cnt", rarity.alias("rarity"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        F.min("cnt").cast("bigint").alias("rarest_cnt"),
        F.max("rarity").cast("double").alias("max_rarity"),
        (
            F.sum(F.col("rarity").cast("decimal(28,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_rarity"),
    )


# ---------------------------------------------------------------------------
# x191: iterative BPE TRAINER (VERDICT r8 #6) — the full Sennrich et
# al. 2016 merge loop whose output merge table x84's tokenizer
# presumes, extending x134's single merge-pair round: K rounds of
# (count adjacent symbol pairs over the distinct-word dictionary,
# corpus-frequency-weighted) -> (argmax pair, count DESC / pair ASC
# deterministic tiebreak) -> (greedy left-to-right non-overlapping
# merge rewrite of every word's symbol sequence) -> repeat on the
# rewritten vocabulary. Reference scale shape (the x134 discipline):
# the corpus-sized stage is ONE word-count shuffle; every iteration
# then runs over the |vocab|-sized dictionary (~5 orders of magnitude
# smaller than a 100 TB corpus), localCheckpoint-materialized per
# round so round k+1 reads rewritten symbols instead of replaying k
# rounds of lineage. The rewrite is a pure fold (F.aggregate) whose
# lambda touches ONLY its accumulator/element variables — no outer
# expression can inline into it (the r9 tripwire class), and the
# greedy semantics ("aaa" + (a,a) -> ["aa","a"]) are mirrored
# bit-exactly by the oracle's list_reduce. Output is strings and
# exact integers only: engine-proof under the hash.
# ---------------------------------------------------------------------------
_BPE_TRAIN_ROUNDS = 6


def _bpe_trainer_oracle(k: int) -> str:
    parts = [
        """
    WITH vocab AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE len(word) >= 2
        GROUP BY word
    ),
    v0 AS (
        SELECT list_transform(range(1, len(word) + 1),
                              i -> substring(word, i, 1)) AS syms, freq
        FROM vocab
    )"""
    ]
    for i in range(1, k + 1):
        parts.append(f""",
    p{i} AS (
        SELECT syms[i] AS l, syms[i + 1] AS r, CAST(SUM(freq) AS BIGINT) AS n
        FROM v{i - 1}, unnest(range(1, len(syms))) AS t(i)
        GROUP BY l, r
    ),
    b{i} AS (SELECT l, r, n FROM p{i} ORDER BY n DESC, l, r LIMIT 1)""")
        if i < k:
            parts.append(f""",
    v{i} AS (
        SELECT list_reduce(list_transform(syms, s -> [s]),
            (acc, x) -> CASE WHEN acc[-1] = b{i}.l AND x[1] = b{i}.r
                             THEN array_slice(acc, 1, len(acc) - 1)
                                  || [b{i}.l || b{i}.r]
                             ELSE acc || x END) AS syms, freq
        FROM v{i - 1} CROSS JOIN b{i}
    )""")
    union = "\n    UNION ALL ".join(
        f"SELECT {i} AS merge_rank, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, n FROM b{i}"
        for i in range(1, k + 1)
    )
    parts.append(f"\n    SELECT * FROM ({union}) ORDER BY merge_rank")
    return "".join(parts)


def _bpe_merge_fold(left: str, right: str):
    """Greedy left-to-right non-overlapping merge of (left, right) as a
    pure fold over a symbol array — the lambda touches only its own
    accumulator/element variables (tripwire-clean by construction)."""

    def rewrite(syms_col):
        return F.aggregate(
            syms_col,
            F.expr("CAST(array() AS array<string>)"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (s == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(left + right)),
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )

    return rewrite


def _train_bpe(spark: SparkSession, sf_dir: str, rounds: int):
    """Run the BPE merge loop; returns (merge_rows, encoded_vocab)
    where merge_rows = [(rank, left, right, merged, n), ...] and
    encoded_vocab carries (word, freq, syms) with ALL ``rounds`` merges
    applied — the trained tokenizer's vocabulary mapping."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    cur = vocab.select("word", chars.alias("syms"), "freq").localCheckpoint(
        eager=True
    )
    merges = []
    for rank in range(1, rounds + 1):
        pairs = cur.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            "freq",
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .first()
        )
        if best is None:  # corpus exhausted (empty input / all 1-symbol)
            break
        left, right, n = best["l"], best["r"], best["n"]
        merges.append((rank, left, right, left + right, n))
        rewrite = _bpe_merge_fold(left, right)
        cur = cur.select(
            "word", rewrite(F.col("syms")).alias("syms"), "freq"
        ).localCheckpoint(eager=True)
    return merges, cur


@query("x191_bpe_trainer", oracle=_bpe_trainer_oracle(_BPE_TRAIN_ROUNDS))
def x191_bpe_trainer(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _vocab = _train_bpe(spark, sf_dir, _BPE_TRAIN_ROUNDS)
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, n bigint",
    )


# ---------------------------------------------------------------------------
# x192: BPE ENCODER — the composition x191 trains for: apply the
# learned merge table (all K merges, in rank order) to tokenize the
# corpus, reporting per-language encoded-token statistics and the
# compression each language actually achieves (tokens-per-char, ppm).
# This is the trainer→encoder round trip a tokenizer pipeline ships:
# x134 counts candidate pairs, x191 learns the merges, x192 measures
# what they buy — the per-language twin of x151's fertility metric,
# but against the engine's OWN trained subwords instead of a fixed
# regex. Scale shape: encoding runs over the distinct-word VOCABULARY
# (K sequential fold rewrites, each localCheckpoint-materialized);
# the corpus pays one word explode + a word-keyed join against the
# encoded vocab (broadcast-eligible: |vocab| ≪ corpus) + one lang
# aggregate. Stats are restricted to the trained domain (words of
# length ≥ 2, the trainer's own filter) in BOTH engines. Output is
# exact integers only — compression is ppm via integer division.
# ---------------------------------------------------------------------------


def _bpe_encode_oracle(k: int) -> str:
    parts = [
        """
    WITH vocab AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE len(word) >= 2
        GROUP BY word
    ),
    v0 AS (
        SELECT word, list_transform(range(1, len(word) + 1),
                                    i -> substring(word, i, 1)) AS syms, freq
        FROM vocab
    )"""
    ]
    for i in range(1, k + 1):
        parts.append(f""",
    p{i} AS (
        SELECT syms[i] AS l, syms[i + 1] AS r, CAST(SUM(freq) AS BIGINT) AS n
        FROM v{i - 1}, unnest(range(1, len(syms))) AS t(i)
        GROUP BY l, r
    ),
    b{i} AS (SELECT l, r, n FROM p{i} ORDER BY n DESC, l, r LIMIT 1),
    v{i} AS (
        SELECT word, list_reduce(list_transform(syms, s -> [s]),
            (acc, x) -> CASE WHEN acc[-1] = b{i}.l AND x[1] = b{i}.r
                             THEN array_slice(acc, 1, len(acc) - 1)
                                  || [b{i}.l || b{i}.r]
                             ELSE acc || x END) AS syms, freq
        FROM v{i - 1} CROSS JOIN b{i}
    )""")
    parts.append(f""",
    enc AS (SELECT word, CAST(len(syms) AS BIGINT) AS n_toks FROM v{k}),
    occ AS (
        SELECT lang, word FROM (
            SELECT lang, unnest(string_split(text, ' ')) AS word
            FROM documents
        ) WHERE len(word) >= 2
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(word)) AS BIGINT) AS n_chars,
           CAST(SUM(e.n_toks) AS BIGINT) AS n_tokens,
           CAST((1000000 * CAST(SUM(e.n_toks) AS BIGINT))
                // CAST(SUM(len(word)) AS BIGINT) AS BIGINT)
               AS compression_ppm
    FROM occ JOIN enc e USING (word)
    GROUP BY lang""")
    return "".join(parts)


@query("x192_bpe_encode", oracle=_bpe_encode_oracle(_BPE_TRAIN_ROUNDS))
def x192_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    _merges, vocab = _train_bpe(spark, sf_dir, _BPE_TRAIN_ROUNDS)
    enc = vocab.select("word", F.size("syms").cast("long").alias("n_toks"))
    d = load_table(spark, sf_dir, "documents")
    occ = d.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.length("word") >= 2)
    return (
        occ.join(enc, "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
        .select(
            "lang",
            "n_words",
            "n_chars",
            "n_tokens",
            F.expr("(1000000 * n_tokens) DIV n_chars").alias(
                "compression_ppm"
            ),
        )
    )
