"""Top-k per group (SURVEY §2.5 W4).

row_number over (group, order) filtered to ≤ k — Catalyst rewrites this
to WindowGroupLimit (per-partition top-k before the shuffle), so no
group ever fully sorts. Always pass a total order (include a unique
tie-break column) or results are partition-order dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
