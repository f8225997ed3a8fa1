"""Distributed connected components over an edge list.

The missing piece between near-dup PAIRS (x43) and corpus-level dedup:
near-duplication is not transitive, but dedup clusters must be — if
A~B and B~C, keeping both A and C double-counts the family. Production
LLM-corpus dedup therefore runs connected components over the verified
pair graph and keeps one survivor per component.

Algorithm: iterative min-label propagation. Every vertex starts
labelled with itself; each round every vertex takes the min label among
itself and its neighbours; fixpoint = components labelled by their
minimum vertex id (deterministic — no tie-breaking needed, min is
total on ids).

Scale notes:
* Per round: one shuffle to join labels onto edges + one label-min
  groupBy. Rounds needed = graph diameter. Near-dup cluster graphs are
  dense blobs (diameter 2-4 in practice), so the round count is small
  and independent of corpus size; for adversarial long-chain graphs the
  Kiveris large-star/small-star variant converges in O(log n) rounds —
  same building blocks, swap the propagation rule.
* ``localCheckpoint(eager=True)`` after every round truncates the plan
  lineage — without it round k replans (and re-executes) rounds 1..k-1
  and the job is quadratic in rounds.
* Convergence test is ``isEmpty`` on the changed-label set — a
  short-circuit probe, not a full count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
) -> DataFrame:
    """Labels every vertex of the undirected edge list with its
    component's minimum vertex id. Returns (vertex, component)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint(eager=True)  # edges reused every round

    labels = (
        e.select(F.col("a").alias("v")).distinct().withColumn("comp", F.col("v"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = e.join(labels, e.b == labels.v).select(
            F.col("a").alias("v"), F.col("comp")
        )
        new_labels = (
            labels.union(nbr_min).groupBy("v").agg(F.min("comp").alias("comp"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.comp") != F.col("o.comp"))
        )
        labels = new_labels
        if changed.isEmpty():
            break
    return labels.select(F.col("v").alias("vertex"), F.col("comp").alias("component"))
