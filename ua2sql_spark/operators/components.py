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
* The upstream edge list is materialized ONCE (``localCheckpoint``
  immediately — every later consumer would otherwise re-execute the
  whole producing pipeline, e.g. the full MinHash-LSH pass).
* Edges stay UNDOUBLED throughout: the per-vertex neighbour-min is
  computed from both endpoint directions of the canonical pair list
  (a union feeding one partial-aggregated groupBy — no 2× distinct
  materialization of the symmetric closure).
* Each round **contracts** the edge graph through the current labels
  (edge (a,b) → (comp(a), comp(b)), self-loops dropped): dense near-dup
  blobs — the common case — collapse after the first round, so later
  rounds shuffle a tiny fraction of the original edges instead of the
  full list every time.
* **Pointer doubling** (comp ← comp(comp)) each round halves chain
  depth, so adversarial long-chain graphs converge in O(log n) rounds
  rather than O(diameter).
* ``localCheckpoint(eager=True)`` after every round truncates the plan
  lineage — without it round k replans (and re-executes) rounds 1..k-1
  and the job is quadratic in rounds.
* Convergence test is ``isEmpty`` on the contracted edge set — all
  edges internal ⇒ labels constant per component, and the component's
  minimum vertex always keeps its own label, so the constant is the
  minimum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_int_dtype(series) -> bool:
    import pandas.api.types as ptypes

    return ptypes.is_integer_dtype(series)


def _numpy_cc(a, b):
    """Vectorized min-label components over integer endpoint arrays.

    Returns ``(verts, labels)``: the sorted unique vertex array and, per
    vertex, its component's minimum vertex id. Same fixpoint as the
    distributed rounds (min-label propagation + pointer doubling), but
    every step is one C-speed numpy pass over the edge remnant — the
    Python-dict union-find this replaces walked ~2 dict ops per edge
    per find and dominated x96's driver finish once the corpus's pair
    graph grew to ~6·10^5 edges (OPTIMIZATION_r14.md §components).
    Propagation over indices of the SORTED vertex array is exact:
    min index == min vertex id."""
    import numpy as np

    verts = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(verts, a)
    ib = np.searchsorted(verts, b)
    comp = np.arange(len(verts), dtype=np.int64)
    while True:
        np.minimum.at(comp, ia, comp[ib])
        np.minimum.at(comp, ib, comp[ia])
        while True:  # pointer doubling to per-round fixpoint
            nxt = comp[comp]
            if np.array_equal(nxt, comp):
                break
            comp = nxt
        if np.array_equal(comp[ia], comp[ib]):
            break
    return verts, verts[comp]


def _union_find_min(pairs) -> dict[int, int]:
    """Driver-side union-find with min-root union over a bounded edge
    remnant (an iterable of (a, b) pairs); returns the non-identity
    root map with plain-Python keys/values (safe to feed
    ``createDataFrame`` regardless of the Arrow dtypes that produced
    the pairs)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {
        c.item() if hasattr(c, "item") else c: (
            r.item() if hasattr(r, "item") else r
        )
        for c in parent
        if (r := find(c)) != c
    }


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
    driver_finish_max_edges: int = 1 << 20,
) -> DataFrame:
    """Labels every vertex of the undirected edge list with its
    component's minimum vertex id. Returns (vertex, component).

    ``driver_finish_max_edges``: whenever the current edge set —
    original or contracted — fits under this bound (checked at round
    entry against the *measured* count of an already-materialized
    checkpoint — an AQE-style runtime decision), the remaining rounds
    collapse into one driver-side union-find plus a broadcast fix-up
    join. Small graphs skip the distributed rounds entirely; at corpus
    scale the contracted graph (one vertex per still-unmerged
    component) hits the bound after a handful of rounds. The collect is
    explicitly bounded (default 1M edges ≈ 16 MB of long pairs over
    Arrow — far under any sane ``spark.driver.maxResultSize``), and a
    driver union-find over it runs in well under a second, cheaper than
    even one distributed propagate/double/contract round."""
    from pyspark.sql.types import StructType

    base = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    vtype = base.schema["a"].dataType

    # Whole-graph driver finish: when the ENTIRE edge list already fits
    # the bound (one metadata-cheap count over the checkpoint — an
    # AQE-style runtime decision), the full (vertex, component) answer
    # is computed driver-side and returned as a local relation: no
    # distinct, no checkpointed label frame, no fix-up join — for the
    # common contracted-corpus / small-remnant case this replaces four
    # distributed jobs with one Arrow collect.
    if base.count() <= driver_finish_max_edges:
        pdf = base.toPandas()
        schema = StructType().add("vertex", vtype).add("component", vtype)
        a_s, b_s = pdf.iloc[:, 0], pdf.iloc[:, 1]
        if len(pdf) and _is_int_dtype(a_s) and _is_int_dtype(b_s):
            # Vectorized finish + Arrow-path createDataFrame: both the
            # union-find and the row materialization ran as Python
            # loops before (~1 s at 6·10^5 edges); now one numpy pass
            # and one pandas frame.
            import pandas as pd

            verts, labels = _numpy_cc(a_s.to_numpy(), b_s.to_numpy())
            out_pdf = pd.DataFrame({"vertex": verts, "component": labels})
            return base.sparkSession.createDataFrame(out_pdf, schema=schema)
        a, b = a_s.tolist(), b_s.tolist()
        root = _union_find_min(
            (p, q) for p, q in zip(a, b) if p != q
        )
        # Every endpoint is a vertex (self-loops keep their vertex
        # alive even though the loop edge carries no merge).
        verts = set(a) | set(b)
        rows = [
            (v.item() if hasattr(v, "item") else v,) for v in verts
        ]
        out = base.sparkSession.createDataFrame(
            [(v, root.get(v, v)) for (v,) in rows],
            schema=schema,
        )
        return out

    labels = (
        base.select(F.explode(F.array("a", "b")).alias("v"))
        .distinct()
        .withColumn("comp", F.col("v"))
        .localCheckpoint(eager=True)
    )
    e = base.filter(F.col("a") != F.col("b")).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # Bounded driver finish at ROUND ENTRY against the measured
        # count of the already-materialized contracted remnant: at
        # corpus scale the component-level graph shrinks geometrically,
        # so this triggers after a handful of rounds and the remaining
        # rounds collapse into one driver-side union-find plus a
        # broadcast fix-up join.
        n_edges = e.count()
        if n_edges == 0:
            break
        if n_edges <= driver_finish_max_edges:
            # Arrow path: a 2-column long frame transfers ~20× cheaper
            # than a collect() of Row objects at the 1M-edge bound.
            pdf = e.toPandas()
            a_s, b_s = pdf.iloc[:, 0], pdf.iloc[:, 1]
            if _is_int_dtype(a_s) and _is_int_dtype(b_s):
                verts, labels = _numpy_cc(a_s.to_numpy(), b_s.to_numpy())
                root = {
                    int(v): int(r) for v, r in zip(verts, labels) if v != r
                }
            else:
                root = _union_find_min(zip(a_s.tolist(), b_s.tolist()))
            if root:
                fix = labels.sparkSession.createDataFrame(
                    list(root.items()),
                    schema=StructType().add("__fc", vtype).add("__fr", vtype),
                )
                labels = labels.join(
                    F.broadcast(fix), labels["comp"] == fix["__fc"], "left"
                ).select("v", F.coalesce("__fr", F.col("comp")).alias("comp"))
            break
        # 1. Min-propagation on the contracted (component-level) graph:
        #    each component label takes the min of its neighbours when
        #    that improves it. Both directions of each undoubled edge
        #    feed one groupBy (map-side partial agg keeps the shuffle
        #    at one row per surviving component). The update map is
        #    comp-level — small once the graph has contracted — so the
        #    label join broadcasts.
        upd = (
            e.select(F.col("a").alias("c"), F.col("b").alias("n"))
            .union(e.select(F.col("b").alias("c"), F.col("a").alias("n")))
            .groupBy("c")
            .agg(F.min("n").alias("__nbr_min"))
            .filter(F.col("__nbr_min") < F.col("c"))
            .withColumnRenamed("c", "comp")
        )
        labels = labels.join(upd, "comp", "left").select(
            "v",
            F.coalesce(F.least("comp", "__nbr_min"), F.col("comp")).alias("comp"),
        )
        # 2. Pointer doubling: comp ← comp(comp). Labels only ever
        #    point at vertices of the same component, so the lookup is
        #    total (left join guards the already-converged rows).
        m = labels.select(F.col("v").alias("__mv"), F.col("comp").alias("__mc"))
        labels = (
            labels.join(m, labels["comp"] == m["__mv"], "left")
            .select(
                "v",
                F.coalesce(F.least("comp", "__mc"), F.col("comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        # 3. Contract edges through the new labels; intra-component
        #    edges become self-loops and vanish. Canonicalize the
        #    surviving pair order (least, greatest) so the undoubled
        #    invariant holds for the distinct.
        la = labels.select(F.col("v").alias("__va"), F.col("comp").alias("__ca"))
        lb = labels.select(F.col("v").alias("__vb"), F.col("comp").alias("__cb"))
        e = (
            e.join(la, e["a"] == la["__va"])
            .join(lb, e["b"] == lb["__vb"])
            .select(
                F.least("__ca", "__cb").alias("a"),
                F.greatest("__ca", "__cb").alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    return labels.select(F.col("v").alias("vertex"), F.col("comp").alias("component"))
