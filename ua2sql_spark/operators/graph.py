"""Graph cohesion primitives over edge-list DataFrames.

``triangle_stats`` is the m^1.5 degree-orientation triangle counter
(reference algorithm: Schank & Wagner 2005 / the standard "forward"
method): every undirected edge is directed from its (degree, id)-
smaller endpoint to the larger, which bounds every out-degree at
O(sqrt m) REGARDLESS of raw degree skew — a degree-10^6 hub keeps only
its higher-ordered neighbors. Wedges are then ONE self-join of the
directed edge list on source (sum C(outdeg, 2) = O(m^1.5) rows, the
information-theoretic floor for exact counting), and each triangle is
counted exactly once — no /3 or /6 correction.

Used by ``x176_copurchase_triangles`` (queries/tpch_style.py) and
property-tested against brute-force enumeration on arbitrary graphs
(tests/test_operators_property.py), so the query and the property pin
the SAME implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Exact triangle statistics for an undirected simple graph.

    ``edges``: DataFrame with integer columns ``u``, ``v`` — one row
    per undirected edge, already deduplicated with ``u < v``.

    Returns a single row ``(n_nodes, n_edges, n_wedges, n_triangles)``
    where ``n_wedges`` counts all open-or-closed wedges
    (sum deg·(deg-1)/2, the transitivity denominator).

    Plan shape: the edge list and its directed orientation are each
    materialized once (both feed multiple consumers); the
    |nodes|-bounded degree table is aggregated once and broadcast onto
    the edge list.
    """
    edges = edges.localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=False)
    )
    du = F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("du")))
    dv = F.broadcast(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")))
    fwd = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    de = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("dd"),
        )
        .localCheckpoint(eager=False)
    )
    wedges = (
        de.alias("e1")
        .join(
            de.alias("e2"),
            (F.col("e1.src") == F.col("e2.src"))
            & (
                F.struct(F.col("e1.dd"), F.col("e1.dst"))
                < F.struct(F.col("e2.dd"), F.col("e2.dst"))
            ),
        )
        .select(F.col("e1.dst").alias("b"), F.col("e2.dst").alias("c"))
    )
    tri = wedges.join(
        de.select(F.col("src").alias("b"), F.col("dst").alias("c")),
        ["b", "c"],
        "left_semi",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    tot = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges"),
    )
    ne = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        tot.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles")
    )
