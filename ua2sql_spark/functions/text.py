"""Text feature expressions: tokenization, shingles, MinHash columns
(SURVEY §2.11 X2/X3). Pure column expressions over a text column.

The MinHash family is md5-based: h_j(S) = MIN over s∈S of
md5('<j>|' || s). Lexicographic min over uniformly-distributed hex
digests is a valid min-hash permutation, and md5 is identical across
engines — which is what lets the DuckDB oracle run the same algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(text: Column, sep: str = " ") -> Column:
    """Whitespace tokens (positional, with repeats)."""
    return F.split(text, sep)


def word_set(text: Column, sep: str = " ") -> Column:
    """Distinct tokens."""
    return F.array_distinct(F.split(text, sep))


def word_shingles(text: Column, n: int = 3, sep: str = " ") -> Column:
    """Positional n-word shingles as strings; empty array when the text
    has fewer than ``n`` tokens (guard against sequence() descending)."""
    w = words(text, sep)
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    mk = lambda i: F.concat_ws(" ", *[F.element_at(w, i + k) for k in range(n)])  # noqa: E731
    return F.when(F.size(w) >= n, F.transform(idx, mk)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_columns(token: Column, num_hashes: int) -> list[Column]:
    """Aggregate expressions: one MIN(md5(seed|token)) per hash function.
    Use after exploding tokens, inside a groupBy(doc_id).agg(*these)."""
    return [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), token))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
