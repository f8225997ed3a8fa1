"""Shared helpers for query/oracle pairs.

Determinism policy
------------------
The driver gate hashes values order-insensitively, so every number we
emit must be **bit-identical** between Spark and DuckDB regardless of
partitioning / summation order. Plain ``SUM(double)`` is order-dependent
in the last bits; instead we:

* cast each addend to ``DECIMAL(28,8)`` (exact, deterministic — the
  binary double has no exact .5 ULP ties at scale 8), sum exactly, and
  cast the exact decimal result to double (a single deterministic
  rounding); both engines produce the same 64-bit float.
* the DuckDB side of that final cast goes **via VARCHAR**: DuckDB's
  direct DECIMAL→DOUBLE converts the scaled int128 first, which loses
  correct rounding once the scaled value passes 2^53 (sum > ~9e7 at
  scale 8 — routinely hit at sf0.1), while Spark's BigDecimal→double
  is correctly rounded. Formatting the exact decimal and parsing with
  strtod is correctly rounded too, so VARCHAR-mediated casts agree
  with Spark at every magnitude.
* averages = exact decimal sum cast to double, divided by the count —
  one double division, identical operands → identical result.
* variance/stddev are derived from exact sums (sum, sum of squares)
  rather than streaming moment aggregates.

Per-row arithmetic (e.g. ``x*(1-y)``) is already deterministic — IEEE
ops on identical operands in the same order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,8)"


def dsum(c: Column | str) -> Column:
    """Order-independent SUM of a double column (exact decimal interior)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(DEC)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-independent AVG of a double column."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(DEC)).cast("double") / F.count(col)


def sql_dsum(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(28,8))) AS STRING) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / COUNT({expr}))"
