"""Generic dedup operators (SURVEY §2.11 X1/X2) over caller tables.

``exact_dedup`` — content-hash dedup with deterministic survivor pick.
``minhash_lsh_pairs`` — near-duplicate pair detection (tokenizer-
pluggable: word sets by default, character n-grams via
``functions.text.char_shingles``): md5-minhash →
banded LSH candidates via equi-join → exact Jaccard verify with an
adaptive set representation (64-bit bitmask popcount when the
dictionary fits, array intersection otherwise).

No cross join anywhere; candidate volume is governed by bands×rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ua2sql_spark.functions.text import minhash_columns, word_set


def exact_dedup(
    df: DataFrame,
    content_cols: list[str],
    id_col: str,
    keep: str = "min",
) -> DataFrame:
    """One survivor row per distinct content (sha256 over the
    ``content_cols``); deterministic via min/max id. Returns the original
    columns of the surviving rows."""
    pick = F.min(id_col) if keep == "min" else F.max(id_col)
    hashed = df.withColumn(
        "__sha", F.sha2(F.concat_ws("\x1f", *content_cols), 256)
    )
    survivors = hashed.groupBy("__sha").agg(pick.alias(id_col)).select(id_col)
    return df.join(survivors, id_col, "left_semi")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    band_size: int = 8,
    threshold: float = 0.9,
    bitmask_max_vocab: int = 64,
    tokenizer=None,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, jaccard ≥ threshold) among documents,
    candidates from banded md5-minhash LSH."""
    assert num_hashes % band_size == 0
    tokenizer = tokenizer or word_set
    tokens = df.select(
        F.col(id_col), F.explode(tokenizer(F.col(text_col))).alias("__tok")
    )
    mh = tokens.groupBy(id_col).agg(*minhash_columns(F.col("__tok"), num_hashes))

    bands = None
    for b in range(num_hashes // band_size):
        js = range(b * band_size, (b + 1) * band_size)
        band = mh.select(
            F.col(id_col),
            F.lit(b + 1).alias("__band_no"),
            F.md5(F.concat_ws("|", *[f"h{j}" for j in js])).alias("__band_hash"),
        )
        bands = band if bands is None else bands.unionByName(band)

    left = bands.select(
        F.col(id_col).alias("id_a"), "__band_no", "__band_hash"
    )
    right = bands.select(
        F.col(id_col).alias("id_b"),
        F.col("__band_no").alias("__band_no_r"),
        F.col("__band_hash").alias("__band_hash_r"),
    )
    cand = (
        left.join(
            right,
            (F.col("__band_no") == F.col("__band_no_r"))
            & (F.col("__band_hash") == F.col("__band_hash_r"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )

    # Verify stage: adaptive set representation (AQE-style runtime
    # choice). Jaccard is invariant under dictionary encoding, so either
    # path yields identical results.
    # Bounded probe: we only need to know whether the vocabulary exceeds
    # the bitmask capacity, so cap the distinct scan at max_vocab+1 rows
    # instead of paying a full-corpus distinct aggregation (at 100 TB the
    # exact vocabulary count would be a wasted shuffle — the limit makes
    # the job terminate as soon as enough distinct tokens are seen).
    vocab = tokens.select("__tok").distinct()
    if vocab.limit(bitmask_max_vocab + 1).count() <= bitmask_max_vocab:
        vocab_ids = vocab.select(
            "__tok", (F.row_number().over(Window.orderBy("__tok")) - 1).alias("__wid")
        )
        masks = (
            tokens.join(F.broadcast(vocab_ids), "__tok")
            .groupBy(id_col)
            .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), __wid)")).alias("__mask"))
        )
        x = masks.select(F.col(id_col).alias("__xid"), F.col("__mask").alias("__mask_a"))
        y = masks.select(F.col(id_col).alias("__yid"), F.col("__mask").alias("__mask_b"))
        inter = F.bit_count(F.col("__mask_a").bitwiseAND(F.col("__mask_b")))
        union = F.bit_count(F.col("__mask_a").bitwiseOR(F.col("__mask_b")))
        jaccard = inter.cast("double") / union
    else:
        sets = df.select(
            F.col(id_col), tokenizer(F.col(text_col)).alias("__ws")
        )
        x = sets.select(F.col(id_col).alias("__xid"), F.col("__ws").alias("__ws_a"))
        y = sets.select(F.col(id_col).alias("__yid"), F.col("__ws").alias("__ws_b"))
        jaccard = F.size(F.array_intersect("__ws_a", "__ws_b")).cast("double") / F.size(
            F.array_union("__ws_a", "__ws_b")
        )
    return (
        cand.join(F.broadcast(x), F.col("id_a") == F.col("__xid"))
        .join(F.broadcast(y), F.col("id_b") == F.col("__yid"))
        .select("id_a", "id_b", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def neardup_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    band_size: int = 8,
    threshold: float = 0.9,
    tokenizer=None,
) -> DataFrame:
    """Near-dup *deduplication* (vs. pair listing): greedy min-id
    survivorship — a row is dropped iff a verified near-duplicate with a
    smaller id exists. This is the 100 TB default (SCALE.md §2): the
    pair list is quadratic in cluster size, the dropped-id set is
    linear. Not a transitive closure (A~B~C with A≁C keeps A and C's
    fate independent of each other) — same greedy contract as most
    production MinHash dedup passes."""
    pairs = minhash_lsh_pairs(
        df,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        band_size=band_size,
        threshold=threshold,
        tokenizer=tokenizer,
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dropped, id_col, "left_anti")
