"""Generic dedup operators (SURVEY §2.11 X1/X2) over caller tables.

``exact_dedup`` — content-hash dedup with deterministic survivor pick.
``minhash_lsh_pairs`` — near-duplicate pair detection (tokenizer-
pluggable: word sets by default, character n-grams via
``functions.text.char_shingles``): md5-minhash →
banded LSH candidates via bucket grouping → exact Jaccard verify with
an adaptive set representation (64-bit bitmask popcount when the
dictionary fits, array intersection otherwise).

Physical shape (the 100 TB argument): minhash signatures, band hashes
and verify bitmasks are all **pure projections** (array higher-order
functions — no explode, no shuffle, no self-join). The only shuffles
are (1) the groupBy on (band_no, band_hash) that buckets candidates
and (2) the pair ``distinct``. Candidate pairs are generated inside
each bucket from a sorted id list, so there is no join at all on the
LSH side; candidate volume is governed by bands×rows and the optional
``max_bucket_size`` guard (degenerate mega-buckets — boilerplate spam
clusters — are the classic quadratic blowup at scale).

In the small-vocabulary (bitmask) verify branch the doc's 64-bit set
mask rides through the bucket shuffle (8 bytes/doc), so verification
is a projection on the pair rows themselves — no join, no second
corpus scan — and the jaccard filter runs *before* the pair distinct,
shrinking that shuffle to the surviving pairs. The general branch
joins the candidate pairs against the word-set table (never shuffling
raw text through the LSH side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ua2sql_spark.functions.text import (
    minhash_array_columns,
    token_hash_int,
    token_hash_int_fast,
    word_set,
)


def exact_dedup(
    df: DataFrame,
    content_cols: list[str],
    id_col: str,
    keep: str = "min",
) -> DataFrame:
    """One survivor row per distinct content (sha256 over the
    ``content_cols``); deterministic via min/max id. Returns the original
    columns of the surviving rows.

    The hash input is an INJECTIVE encoding: each column is rendered as
    ``length ':' value`` with an explicit NULL token. Plain concat_ws
    would be lossy twice over — it SKIPS null columns (so ('x', NULL)
    and (NULL, 'x') collide) and a value containing the separator
    shifts column boundaries (('a\\x1fb', NULL) vs ('a','b')) — and a
    hash collision here silently DELETES a genuinely distinct row."""
    pick = F.min(id_col) if keep == "min" else F.max(id_col)

    def enc(c: str) -> F.Column:
        v = F.col(c).cast("string")
        return F.when(v.isNull(), F.lit("\x00N")).otherwise(
            F.concat(F.length(v).cast("string"), F.lit(":"), v)
        )

    hashed = df.withColumn(
        "__sha", F.sha2(F.concat_ws("\x1f", *[enc(c) for c in content_cols]), 256)
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
    max_bucket_size: int | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, jaccard ≥ threshold) among documents,
    candidates from banded minhash LSH.

    ``max_bucket_size``: optional scale guard — LSH buckets larger than
    this are skipped (their pairs are quadratic in bucket size; at
    100 TB a boilerplate cluster of 10^6 docs would otherwise emit
    5·10^11 pairs). ``None`` (default) keeps exact LSH semantics for
    oracle parity.

    ``hash_family``: ``"xxhash64"`` (default — single codegen'd mixing
    pass per token/band, the production choice) or ``"md5"`` (an order
    of magnitude more per-row work, but reproducible in DuckDB — the
    oracle-checked queries pin this). The exact-Jaccard verify stage is
    hash-independent, so false positives are impossible under either
    family; only which true pairs LSH *surfaces* varies, and only for
    jaccard < 1 (identical token sets collide in every band under any
    hash)."""
    assert num_hashes % band_size == 0
    assert hash_family in ("md5", "xxhash64")
    tokenizer = tokenizer or word_set
    num_bands = num_hashes // band_size
    th_fn = token_hash_int if hash_family == "md5" else token_hash_int_fast

    # Verify-representation probe (AQE-style runtime choice). Jaccard is
    # invariant under dictionary encoding, so either branch yields
    # identical results — which also means the *probe* that picks the
    # branch may be arbitrarily cheap without risking correctness.
    # Two-tier probe: (1) the vocabulary of a small document sample is a
    # lower bound on the corpus vocabulary, so if the sample alone
    # exceeds the bitmask capacity the corpus-wide distinct is skipped
    # entirely — at 100 TB (vocab ≫ capacity, always) the probe costs
    # one 256-document scan, not a full-corpus explode+distinct.
    # (2) Only when the sample stays within capacity do we pay the exact
    # corpus-wide distinct — still capped at max_vocab+1 rows — because
    # the bitmask map must cover *every* token to be correct.
    sample_vocab = df.select(
        F.explode(tokenizer(F.col(text_col))).alias("__tok")
    ).limit(4096).distinct().limit(bitmask_max_vocab + 1).collect()
    if len(sample_vocab) > bitmask_max_vocab:
        vocab = [None] * (bitmask_max_vocab + 1)  # force the array branch
    else:
        tokens = df.select(F.explode(tokenizer(F.col(text_col))).alias("__tok"))
        vocab = [
            r["__tok"]
            for r in tokens.distinct().limit(bitmask_max_vocab + 1).collect()
        ]
    # empty vocab (empty or all-null corpus) must take the generic
    # branch: F.create_map() with zero args types as map<void,void> and
    # fails analysis — and there is nothing to bitmask anyway
    use_bitmask = 0 < len(vocab) <= bitmask_max_vocab

    # Signatures as a pure projection: one md5 per distinct token
    # (CollapseProject keeps the 16-reference __th alias un-inlined
    # because it is non-cheap and multiply referenced — plan-pinned in
    # tests/test_plans.py), then num_hashes xor'd array_mins. In the
    # bitmask branch the doc's 64-bit set mask rides along from the same
    # scan-side projection: 8 bytes per doc through the bucket shuffle
    # buys a join-free verify stage.
    proj = [
        F.col(id_col),
        F.transform(tokenizer(F.col(text_col)), th_fn).alias("__th"),
    ]
    if use_bitmask:
        bit_of = F.create_map(
            *[
                x
                for i, t in enumerate(sorted(vocab))
                for x in (F.lit(t), F.lit(1 << i).cast("bigint"))
            ]
        )
        mask = F.aggregate(
            tokenizer(F.col(text_col)),
            F.lit(0).cast("bigint"),
            lambda acc, t: acc.bitwiseOR(bit_of[t]),
        )
        proj.append(mask.alias("__mask"))
    hashed = df.select(*proj)
    carry = [F.col(id_col)] + ([F.col("__mask")] if use_bitmask else [])
    mh = hashed.select(*carry, *minhash_array_columns(F.col("__th"), num_hashes))
    if hash_family == "md5":
        band_hash = [
            F.md5(
                F.concat_ws(
                    "|", *[f"h{j}" for j in range(b * band_size, (b + 1) * band_size)]
                )
            )
            for b in range(num_bands)
        ]
    else:
        # One codegen'd multi-column xxhash64 per band — no hex string
        # ever materializes. 8-byte band keys also halve the bucket
        # shuffle's key width vs 32-char md5 hex.
        band_hash = [
            F.xxhash64(*[F.col(f"h{j}") for j in range(b * band_size, (b + 1) * band_size)])
            for b in range(num_bands)
        ]
    member = (
        F.struct(F.col(id_col).alias("i"), F.col("__mask").alias("m"))
        if use_bitmask
        else F.struct(F.col(id_col).alias("i"))
    )
    bands = mh.select(
        member.alias("__member"),
        F.posexplode(F.array(*band_hash)).alias("__band_no", "__band_hash"),
    )

    # Bucket-local pair generation: ONE shuffle on the band key, then
    # sorted-id pair expansion inside each bucket — no self-join.
    # sort_array over the member structs orders by id (ids are unique),
    # preserving the id_a < id_b invariant.
    buckets = (
        bands.groupBy("__band_no", "__band_hash")
        .agg(F.sort_array(F.collect_set("__member")).alias("__ids"))
        .filter(F.size("__ids") > 1)
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("__ids") <= max_bucket_size)
    # Two-step expansion defeats bucket skew: first explode one row per
    # (member, later-members-slice) — linear in bucket size — then
    # round-robin repartition so the quadratic partner explosion of a
    # mega-bucket is spread across the cluster instead of landing in the
    # single task that owns the bucket's shuffle partition.
    ids = F.col("__ids")
    members = (
        buckets.select(F.posexplode(ids).alias("__i", "__a"), ids.alias("__all"))
        .select(
            F.col("__a"),
            F.slice(
                F.col("__all"), F.col("__i") + F.lit(2), F.size("__all")
            ).alias("__partners"),
        )
        .repartition(F.col("__a.i"))
    )
    pairs = members.select(
        F.col("__a.i").alias("id_a"),
        *([F.col("__a.m").alias("__mask_a")] if use_bitmask else []),
        F.explode("__partners").alias("__b"),
    )

    if use_bitmask:
        # Join-free verify: Jaccard = popcount arithmetic over the two
        # masks already present on the pair row. Filtering BEFORE the
        # distinct shrinks that shuffle to the surviving pairs only.
        inter = F.bit_count(F.col("__mask_a").bitwiseAND(F.col("__b.m")))
        union = F.bit_count(F.col("__mask_a").bitwiseOR(F.col("__b.m")))
        jaccard = inter.cast("double") / union
        return (
            pairs.select(
                "id_a", F.col("__b.i").alias("id_b"), jaccard.alias("jaccard")
            )
            .filter(F.col("jaccard") >= threshold)
            .distinct()
        )

    # General (large-vocabulary) branch: candidates join the word-set
    # table twice. No join-strategy hint on purpose: the set table spans
    # the corpus (a static broadcast of it would OOM at scale), while
    # the pair side's size is only known at runtime (bounded output, but
    # a plan-time estimate can't see that). Unhinted, Catalyst
    # broadcasts the sets when their estimate is genuinely small (test
    # scale), and at corpus scale AQE's runtime stats broadcast-convert
    # the small candidate side instead — the decision this join needs is
    # exactly the one AQE makes from real sizes.
    cand = pairs.select("id_a", F.col("__b.i").alias("id_b")).distinct()
    sets = df.select(F.col(id_col), tokenizer(F.col(text_col)).alias("__ws"))
    x = sets.select(F.col(id_col).alias("__xid"), F.col("__ws").alias("__ws_a"))
    y = sets.select(F.col(id_col).alias("__yid"), F.col("__ws").alias("__ws_b"))
    jaccard = F.size(F.array_intersect("__ws_a", "__ws_b")).cast("double") / F.size(
        F.array_union("__ws_a", "__ws_b")
    )
    return (
        cand.join(x, F.col("id_a") == F.col("__xid"))
        .join(y, F.col("id_b") == F.col("__yid"))
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
    hash_family: str = "xxhash64",
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
        hash_family=hash_family,
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dropped, id_col, "left_anti")
