"""Fuzzy string-match join (edit distance ≤ k) with q-gram prefix
blocking — the entity-resolution archetype: matching near-identical
titles, names, or URLs across feeds without an all-pairs Levenshtein.

Reference scope: the reference (ua2sql.py) has no fuzzy matching; this
is SURVEY §2.11 territory (X2's near-dup family at string rather than
document granularity — the record-linkage need of a training-data
pipeline merging crawls/catalogs).

Physical shape (the 100 TB argument)
------------------------------------
All-pairs Levenshtein is O(|A|·|B|) DP fills — a non-starter. The join
runs two candidate tiers, both provably recall-1.0, then one exact
verify:

* **rarest-gram prefix tier** (the x179 PPJoin discipline adapted to
  edit distance): one edit destroys at most ``q`` of a string's
  positional q-grams, and every untouched positional gram of ``a``
  survives contiguously in ``b`` — so a pair within distance ``k``
  shares at least ``g_a − k·q`` of a's grams [Gravano et al.,
  VLDB 2001]. Whenever ``a`` has ``≥ k·q + 1`` grams, at least one of
  its ``k·q + 1`` globally-RAREST grams (ties broken by gram value)
  must therefore appear in ``b``. Candidates = equi-join of a's prefix
  grams against ALL of b's grams, with the ``|len_a − len_b| ≤ k``
  band inside the join condition. Join traffic is bounded by
  rare-gram frequencies — never |A|·|B|, and never the frequency of
  stop-grams like ``"e "`` (a plain any-shared-gram join degenerates
  to all-pairs on those).
* **short-string tier**: when ``a`` has ``≤ k·q`` grams
  (``len_a ≤ k·q + q − 1``) every gram can be destroyed, so the prefix
  proves nothing — those a-rows instead join the length band alone,
  against the (equally bounded) slice of b with
  ``len_b ≤ len_a + k``. A constant-bounded subpopulation (strings
  ≤ 5 chars at k=2, q=2); at scale it broadcasts.
* **verify**: ``F.levenshtein(a, b) ≤ k`` exactly once per distinct
  candidate. Spark and DuckDB both implement classical Levenshtein, so
  a DuckDB brute-force oracle doubles as a recall-1.0 proof of the
  blocking (the x179 pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grams(s: F.Column, q: int) -> F.Column:
    """Positional q-grams of ``s`` as an array (length len−q+1; empty
    for shorter strings)."""
    idx = F.sequence(F.lit(1), F.length(s) - (q - 1))
    return F.when(
        F.length(s) >= q, F.transform(idx, lambda i: F.substring(s, i, q))
    ).otherwise(F.array().cast("array<string>"))


def fuzzy_join_editdist(
    a: DataFrame,
    b: DataFrame,
    a_id: str,
    a_col: str,
    b_id: str,
    b_col: str,
    k: int = 2,
    q: int = 2,
) -> DataFrame:
    """All pairs (a_id, b_id, dist) with ``levenshtein(a_col, b_col)
    ≤ k``, found via rarest-gram prefix + length blocking (recall 1.0 —
    see module docstring). ``a_id``/``b_id`` must be unique within
    their side."""
    short_max = k * q + q - 1  # len_a ≤ this -> gram prefix proves nothing
    prefix_n = k * q + 1

    base_a = a.select(
        F.col(a_id).alias("a_id"),
        F.col(a_col).alias("__sa"),
        F.length(a_col).alias("__la"),
    )
    base_b = b.select(
        F.col(b_id).alias("b_id"),
        F.col(b_col).alias("__sb"),
        F.length(b_col).alias("__lb"),
    )
    grams_a = base_a.select(
        "a_id", "__la", F.explode(_grams(F.col("__sa"), q)).alias("__g")
    ).distinct()  # prefix selection is per distinct gram; survival of ANY
    # occurrence of a rare gram in b is what the argument needs
    grams_b = base_b.select(
        "b_id", "__lb", F.explode(_grams(F.col("__sb"), q)).alias("__gb")
    ).distinct()

    # Global gram document-frequency (both sides) -> deterministic
    # rare-first order (freq asc, gram asc). Frequencies are corpus
    # statistics: one groupBy, broadcast back onto a's grams.
    freq = (
        grams_a.select(F.col("__g").alias("__gram"))
        .unionByName(grams_b.select(F.col("__gb").alias("__gram")))
        .groupBy("__gram")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    w = Window.partitionBy("a_id").orderBy(F.asc("__df"), F.asc("__g"))
    prefix_a = (
        grams_a.join(freq, grams_a["__g"] == freq["__gram"])
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= prefix_n)
        .select("a_id", "__la", "__g")
    )

    pairs_gram = (
        prefix_a.filter(F.col("__la") > short_max)
        .join(
            grams_b,
            (F.col("__g") == F.col("__gb"))
            & (F.abs(F.col("__la") - F.col("__lb")) <= F.lit(k)),
        )
        .select("a_id", "b_id")
    )

    shorts_a = base_a.filter(F.col("__la") <= short_max).select("a_id", "__la")
    shorts_b = base_b.filter(F.col("__lb") <= short_max + k).select(
        "b_id", "__lb"
    )
    pairs_short = shorts_a.join(
        shorts_b, F.abs(F.col("__la") - F.col("__lb")) <= F.lit(k)
    ).select("a_id", "b_id")

    cand = pairs_gram.unionByName(pairs_short).distinct()
    return (
        cand.join(base_a, "a_id")
        .join(base_b, "b_id")
        .select(
            "a_id",
            "b_id",
            F.levenshtein("__sa", "__sb").alias("dist"),
        )
        .filter(F.col("dist") <= k)
    )
