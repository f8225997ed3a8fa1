"""Property-based tests (hypothesis) for the generic operators: each is
checked against a brute-force pandas reference on randomized inputs —
the operators must hold for *any* data, not just the fixtures.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

BASE = datetime(2024, 1, 1)

# Small, replay-friendly event frames: (key, ts_offset_seconds, value)
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # key
        st.integers(min_value=0, max_value=10_000),   # ts offset (s)
        st.integers(min_value=0, max_value=100),      # value
    ),
    min_size=1,
    max_size=25,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def to_sdf(spark, rows, with_id=True):
    pdf = pd.DataFrame(
        {
            "key": [r[0] for r in rows],
            "ts": [BASE + timedelta(seconds=r[1]) for r in rows],
            "value": [float(r[2]) for r in rows],
        }
    )
    if with_id:
        pdf["event_id"] = range(len(pdf))
    return spark.createDataFrame(pdf), pdf


@given(probe=events_strategy, ref=events_strategy)
@SETTINGS
def test_asof_join_matches_bruteforce(spark, probe, ref):
    from ua2sql_spark.operators.asof import asof_join

    p_sdf, p_pdf = to_sdf(spark, probe)
    r_sdf, r_pdf = to_sdf(spark, ref, with_id=False)
    r_sdf = r_sdf.select("key", "ts", F.col("value").alias("refval"))

    got = {
        r["event_id"]: r["refval_asof"]
        for r in asof_join(
            p_sdf, r_sdf, on="key", probe_ts="ts", ref_ts="ts", value_cols=["refval"]
        ).collect()
    }

    for _, prow in p_pdf.iterrows():
        cand = r_pdf[(r_pdf["key"] == prow["key"]) & (r_pdf["ts"] <= prow["ts"])]
        if cand.empty:
            expected = None
        else:
            # nearest-earlier; among equal ts the operator carries the
            # last row in (ts, input-order) — match on ts only and allow
            # any value holding that max ts
            max_ts = cand["ts"].max()
            allowed = set(cand[cand["ts"] == max_ts]["value"])
            assert got[prow["event_id"]] in allowed
            continue
        assert got[prow["event_id"]] == expected


@given(rows=events_strategy)
@SETTINGS
def test_sessionize_matches_bruteforce(spark, rows):
    from ua2sql_spark.operators.sessionize import sessionize

    sdf, pdf = to_sdf(spark, rows)
    gap = 600
    out = sessionize(
        sdf, key_col="key", ts_col="ts", order_tiebreak="event_id", gap_seconds=gap
    )
    got = {r["event_id"]: r["session_no"] for r in out.collect()}

    for key, grp in pdf.sort_values(["ts", "event_id"]).groupby("key"):
        session = 0
        prev_ts = None
        for _, row in grp.iterrows():
            if prev_ts is None or (row["ts"] - prev_ts).total_seconds() > gap:
                session += 1
            prev_ts = row["ts"]
            assert got[row["event_id"]] == session


@given(rows=events_strategy, k=st.integers(min_value=1, max_value=4))
@SETTINGS
def test_topk_per_group_matches_bruteforce(spark, rows, k):
    from ua2sql_spark.operators.topk import top_k_per_group

    sdf, pdf = to_sdf(spark, rows)
    out = top_k_per_group(
        sdf, ["key"], [F.desc("value"), F.asc("event_id")], k
    ).collect()
    got = {(r["key"], r["event_id"]): r["rn"] for r in out}

    for key, grp in pdf.groupby("key"):
        ordered = grp.sort_values(["value", "event_id"], ascending=[False, True])
        expect = {
            (key, row["event_id"]): i + 1
            for i, (_, row) in enumerate(ordered.iterrows())
            if i < k
        }
        assert {kk: v for kk, v in got.items() if kk[0] == key} == expect


@given(rows=events_strategy)
@SETTINGS
def test_exact_dedup_survivors(spark, rows):
    from ua2sql_spark.operators.dedup import exact_dedup

    sdf, pdf = to_sdf(spark, rows)
    out = exact_dedup(sdf, content_cols=["key", "value"], id_col="event_id").collect()
    got_ids = sorted(r["event_id"] for r in out)
    expect_ids = sorted(
        pdf.groupby(["key", "value"])["event_id"].min().tolist()
    )
    assert got_ids == expect_ids


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40),
    nparts=st.integers(min_value=1, max_value=7),
)
@SETTINGS
def test_hash_split_stable_under_repartition(spark, keys, nparts):
    """The split assignment is a pure function of the key: identical for
    any partitioning, duplicate keys always agree, and every row lands
    in exactly one of train/val/test."""
    from ua2sql_spark.operators.split import hash_split

    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    a = hash_split(df, key_col="k").toPandas()
    b = hash_split(df.repartition(nparts), key_col="k").toPandas()
    assert set(a["split"]) <= {"train", "val", "test"}
    ma = dict(zip(a["k"], a["split"]))
    mb = dict(zip(b["k"], b["split"]))
    assert ma == mb


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=30), min_size=2, max_size=12
    )
)
@SETTINGS
def test_neardup_dedup_consistent_with_pairs(spark, texts):
    """Survivor set = all ids minus ids appearing as the larger side of
    a verified pair — for any corpus."""
    from ua2sql_spark.operators.dedup import minhash_lsh_pairs, neardup_dedup

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    pairs = minhash_lsh_pairs(df, id_col="doc_id", text_col="text").toPandas()
    survivors = set(
        neardup_dedup(df, id_col="doc_id", text_col="text").toPandas()["doc_id"]
    )
    expected = set(pdf["doc_id"]) - set(pairs["id_b"])
    assert survivors == expected


@given(
    texts=st.lists(
        st.text(alphabet="abc xyz", min_size=1, max_size=40), min_size=2, max_size=12
    )
)
@SETTINGS
def test_minhash_verify_branches_agree(spark, texts):
    """The join-free bitmask verify and the general array-set verify are
    the same function: identical (id_a, id_b, jaccard) for any corpus.
    (bitmask_max_vocab=0 forces the array branch.)"""
    from ua2sql_spark.operators.dedup import minhash_lsh_pairs

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)

    def rows(res):
        return sorted(map(tuple, res.toPandas().values.tolist()))

    # 0.5 exercises the r15 size gate's double bound (least/greatest ≥ t
    # must drop ONLY pairs the exact verify rejects); 1.0 exercises its
    # degenerate |A| == |B| form (the x101/x115 exact tier).
    for t in (0.5, 1.0):
        a = rows(minhash_lsh_pairs(df, id_col="doc_id", text_col="text", threshold=t))
        b = rows(
            minhash_lsh_pairs(
                df, id_col="doc_id", text_col="text", threshold=t, bitmask_max_vocab=0
            )
        )
        assert a == b, f"threshold {t}"


def test_ivf_assignment_deterministic_and_total(spark):
    """Every vector gets exactly one cell; assignment is identical under
    repartitioning (round-before-rank determinism)."""
    import numpy as np

    from ua2sql_spark.operators.ivf import ivf_assign

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "vec_id": range(60),
            "embedding": [rng.standard_normal(8).tolist() for _ in range(60)],
        }
    )
    df = spark.createDataFrame(pdf)
    a = ivf_assign(df, centroid_stride=10).toPandas()
    b = ivf_assign(df.repartition(5), centroid_stride=10).toPandas()
    assert len(a) == 60 and a["vec_id"].is_unique
    assert dict(zip(a["vec_id"], a["cell"])) == dict(zip(b["vec_id"], b["cell"]))


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=30,
    ),
    n_salts=st.integers(min_value=1, max_value=8),
)
@SETTINGS
def test_salted_agg_equals_direct(spark, rows, n_salts):
    """Salted two-phase aggregation is exactly the direct aggregation
    for any data and any salt count (decimal-interior partials commute)."""
    from ua2sql_spark.operators.salt import salted_agg

    pdf = pd.DataFrame({"k": [r[0] for r in rows], "v": [float(r[1]) for r in rows]})
    pdf["rid"] = range(len(pdf))
    df = spark.createDataFrame(pdf)
    got = salted_agg(
        df,
        keys=["k"],
        aggs={
            "total": ("sum", "v"),
            "n": ("count", F.lit(1)),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
        },
        salt_from="rid",
        n_salts=n_salts,
    ).toPandas().set_index("k").sort_index()
    want = (
        df.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(28,8)")).cast("double").alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .toPandas().set_index("k").sort_index()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label CC == driver-side union-find, including
    long chains (diameter > 1 iteration) and self-loops."""
    from ua2sql_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(df, "src", "dst").collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    verts = {v for e in edges for v in e}
    comp_of = {}
    for v in verts:
        r = find(v)
        comp_of.setdefault(r, []).append(v)
    want = {}
    for members in comp_of.values():
        m = min(members)
        for v in members:
            want[v] = m
    assert got == want


def test_connected_components_chain_converges(spark):
    """A 12-vertex path graph needs ~12 propagation rounds — pins the
    fixpoint loop + lineage truncation, not just one iteration."""
    from ua2sql_spark.operators.components import connected_components

    edges = [(i, i + 1) for i in range(11)] + [(100, 101)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["vertex"]: r["component"] for r in connected_components(df, "src", "dst").collect()}
    assert got == {**{i: 0 for i in range(12)}, 100: 100, 101: 100}


@given(
    vals=st.lists(st.integers(0, 40), min_size=1, max_size=60),
    nparts=st.integers(1, 7),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_distributed_cumsum_matches_sequential(spark, vals, nparts):
    """Two-phase parallel scan == driver-side running sum, for any
    partition count (incl. partitions the range sampler leaves empty)."""
    from ua2sql_spark.operators.pack import distributed_cumsum

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r["k"]: r["cumsum_excl"]
        for r in distributed_cumsum(df, "k", "v", num_partitions=nparts).collect()
    }
    acc, want = 0, {}
    for i, v in enumerate(vals):
        want[i] = acc
        acc += v
    assert got == want


@given(
    vals=st.lists(st.integers(0, 90), min_size=1, max_size=50),
    max_len=st.integers(1, 64),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_pack_sequences_partitions_every_token(spark, vals, max_len):
    """Packing invariants: per-doc segment sizes sum to the doc's token
    count; every sequence but the last holds exactly max_len tokens;
    segments start where `cumsum mod max_len` says they must."""
    from ua2sql_spark.operators.pack import pack_sequences

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "n"])
    out = pack_sequences(df, "k", "n", max_len).collect()

    per_doc: dict[int, int] = {}
    per_seq: dict[int, int] = {}
    for r in out:
        assert 0 <= r["seq_offset"] < max_len
        assert 1 <= r["n_tokens"] <= max_len
        per_doc[r["k"]] = per_doc.get(r["k"], 0) + r["n_tokens"]
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["n_tokens"]
    assert per_doc == {i: v for i, v in enumerate(vals) if v > 0}
    total = sum(vals)
    if total:
        last = max(per_seq)
        for sid, n in per_seq.items():
            assert n == (max_len if sid != last else total - max_len * last)


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
    parts=st.integers(1, 7),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_hash_ordered_matches_global_rank(spark, ids, parts):
    """hash_ordered invariants vs a driver-side ground truth: pos is the
    exact 1..n rank in md5('s|'||id) order, cum_weight the inclusive
    prefix sum in that order — and both are invariant to how the input
    happens to be partitioned."""
    import hashlib

    from ua2sql_spark.operators.ordering import hash_ordered

    rows = [(i, (i % 13) + 1) for i in ids]
    df = spark.createDataFrame(rows, ["id", "w"]).repartition(parts)
    got = {
        r["id"]: (r["pos"], r["cw"])
        for r in hash_ordered(
            df, "id", weight_col="w", seed="s", cum_col="cw"
        ).collect()
    }

    order = sorted(rows, key=lambda r: (hashlib.md5(f"s|{r[0]}".encode()).hexdigest(), r[0]))
    run = 0
    for pos, (i, w) in enumerate(order, start=1):
        run += w
        assert got[i] == (pos, run), (i, got[i], (pos, run))


@given(
    ids=st.lists(st.integers(0, 100_000), min_size=1, max_size=80, unique=True),
    weights=st.data(),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_hash_ordered_invariant_to_prefix_len(spark, ids, weights):
    """The scale dial is safe to turn: because the bucket key is a
    *prefix* of the sort hash, (bucket, hash, id) order is identical for
    every prefix_len — so pos and cum_weight must match bit-for-bit
    between prefix_len=1 (16 buckets) and prefix_len=2 (256 buckets) on
    random positive weights (VERDICT r4 next-round #8)."""
    from ua2sql_spark.operators.ordering import hash_ordered

    rows = [
        (i, weights.draw(st.integers(1, 1_000), label=f"w{i}")) for i in ids
    ]
    df = spark.createDataFrame(rows, ["id", "w"]).repartition(5)

    def run(prefix_len: int) -> dict[int, tuple[int, int]]:
        out = hash_ordered(df, "id", weight_col="w", seed="s", prefix_len=prefix_len)
        return {r["id"]: (r["pos"], r["cum_weight"]) for r in out.collect()}

    assert run(1) == run(2)


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1)),
        min_size=1,
        max_size=40,
    ),
    tri=st.lists(
        st.tuples(
            st.integers(0, 2**21 - 1),
            st.integers(0, 2**21 - 1),
            st.integers(0, 2**21 - 1),
        ),
        min_size=1,
        max_size=20,
    ),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_zorder_column_matches_reference_morton(spark, pts, tri):
    """The JVM bit-spreading schedule equals a bit-by-bit reference
    Morton interleave for full-domain 2-D (31-bit) and 3-D (21-bit)
    inputs."""
    from ua2sql_spark.operators.layout import zorder_column

    def morton(vals, bits):
        z = 0
        for b in range(bits):
            for i, v in enumerate(vals):
                z |= ((v >> b) & 1) << (b * len(vals) + i)
        return z

    df2 = spark.createDataFrame(pts, ["a", "b"])
    got2 = [r["z"] for r in df2.select(zorder_column("a", "b").alias("z")).collect()]
    assert sorted(got2) == sorted(morton(p, 31) for p in pts)

    df3 = spark.createDataFrame(tri, ["a", "b", "c"])
    got3 = [
        r["z"] for r in df3.select(zorder_column("a", "b", "c").alias("z")).collect()
    ]
    assert sorted(got3) == sorted(morton(p, 21) for p in tri)


@given(
    ops=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 9),        # key
                st.integers(0, 1_000),    # value
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_upsert_parquet_matches_dict_semantics(spark, ops, tmp_path_factory):
    """Applying a sequence of random batches through upsert_parquet
    equals last-writer-wins dict semantics keyed on id. The partition is
    a pure function of the key (day = id % 3) per the operator's
    stable-partition precondition — an earlier draft of this test let
    keys migrate partitions and correctly caught the stale-copy hazard
    the docstring now documents."""
    from ua2sql_spark.operators.merge import upsert_parquet

    path = str(tmp_path_factory.mktemp("upsert") / "tbl")
    expect: dict[int, tuple[str, int]] = {}
    for batch_rows in ops:
        uniq = {k: (f"d{k % 3}", v) for k, v in batch_rows}
        rows = [(k, day, val) for k, (day, val) in uniq.items()]
        batch = spark.createDataFrame(rows, "id bigint, day string, val bigint")
        upsert_parquet(batch, path, key_cols=["id"], partition_col="day")
        expect.update(uniq)
    got = {
        r["id"]: (r["day"], r["val"]) for r in spark.read.parquet(path).collect()
    }
    assert got == expect


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1)),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_zorder_sql_matches_reference_in_duckdb(pts):
    """The SQL twin (zorder_sql) computes the identical Morton code in
    DuckDB for full-domain 31-bit inputs — x124 exercises it only on
    8-bit dims, this covers the whole schedule. No Spark involved."""
    import duckdb

    from ua2sql_spark.operators.layout import zorder_sql

    def morton(a, b):
        z = 0
        for i in range(31):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    con = duckdb.connect()
    con.execute("CREATE TABLE pts (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    got = [r[0] for r in con.execute(
        f"SELECT {zorder_sql('a', 'b')} FROM pts ORDER BY rowid"
    ).fetchall()]
    con.close()
    assert got == [morton(a, b) for a, b in pts]


def test_salted_join_equals_plain_join(spark):
    """salted_join == plain join on a Zipf-skewed fact (70% of rows on
    one key) with duplicate keys on BOTH sides, for inner and left —
    including the null-extension rows of the left join."""
    from ua2sql_spark.operators.salt import salted_join

    big = spark.range(2000).selectExpr(
        "id",
        # 70% hot key 0, the rest spread over 1..49; key 999 unmatched
        "CASE WHEN id % 10 < 7 THEN 0 WHEN id % 97 = 0 THEN 999 "
        "ELSE CAST(id % 49 + 1 AS BIGINT) END AS k",
        "id * 2 AS payload",
    )
    small = spark.range(300).selectExpr(
        "CAST(id % 50 AS BIGINT) AS k",  # duplicate small-side keys (6 each)
        "id AS attr",
    )

    for how in ("inner", "left"):
        got = salted_join(big, small, ["k"], n_salts=8, salt_from="id", how=how)
        want = big.join(small, ["k"], how)
        gs = sorted(map(tuple, got.select("k", "id", "payload", "attr").collect()))
        ws = sorted(map(tuple, want.select("k", "id", "payload", "attr").collect()))
        assert gs == ws, f"{how}: {len(gs)} vs {len(ws)} rows"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    text=st.text(alphabet="abcdefgh ", min_size=40, max_size=300),
    ins_pos=st.data(),
)
def test_cdc_chunking_is_insertion_robust(text, ins_pos):
    """The x142 claim, proven as a property: inserting one character
    changes at most the chunks AROUND the edit — the chunk multisets
    before/after differ by a bounded count, while fixed-size blocks
    would shift EVERY downstream block. Pure-Python replay of the
    shared md5-boundary rule (identical to both engines' SQL)."""
    import hashlib

    W, PAT = 4, ("00", "40", "80", "c0")

    def chunks(s: str) -> list[str]:
        cuts = [
            i for i in range(1, len(s) - (W - 2))
            if hashlib.md5(s[i - 1 : i - 1 + W].encode()).hexdigest()[:2] in PAT
        ]
        bounds = [0, *cuts, len(s)]
        return [
            s[a:b] for a, b in zip(bounds, bounds[1:]) if b > a
        ]

    pos = ins_pos.draw(st.integers(0, len(text)))
    edited = text[:pos] + "X" + text[pos:]
    before, after = chunks(text), chunks(edited)
    # sanity: chunking is a partition of the text
    assert "".join(before) == text and "".join(after) == edited
    from collections import Counter
    cb, ca = Counter(before), Counter(after)
    changed = sum((cb - ca).values()) + sum((ca - cb).values())
    # the edit can split/merge only chunks overlapping the W-char
    # window around the insertion (the 4 windows touching the new char
    # can each flip one boundary) — a small CONSTANT, independent of
    # how much text follows the edit; fixed-size blocks would change
    # every downstream block
    assert changed <= 9, (changed, before, after)
    # and chunks far from the edit survive verbatim (content-defined!)
    assert sum((cb & ca).values()) >= max(0, len(before) - 5)


def test_source_diversity_monolingual_source_yields_null_evenness(spark, tmp_path):
    """Regression (round-6 review): a monolingual source has ln(1)=0 in
    the evenness denominator — under ANSI mode the 0/0 used to THROW
    DIVIDE_BY_ZERO (killing every source's row), and the oracle said
    NULL. Both engines now emit NULL for the undefined k=1 case."""
    import os

    from pyspark.sql import functions as F

    from ua2sql_spark.registry import all_queries

    mono = spark.createDataFrame(
        [("s1", "en")] * 3 + [("s2", "en"), ("s2", "de")],
        "source string, lang string",
    )
    (
        mono.withColumn("doc_id", F.monotonically_increasing_id())
        .withColumn("text", F.lit("t"))
        .withColumn("n_chars", F.lit(1))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    )
    rows = all_queries()["x161_source_diversity"].fn(spark, str(tmp_path)).collect()
    ev = {r["source"]: (r["evenness"], r["entropy"]) for r in rows}
    assert ev["s1"][0] is None and ev["s1"][1] == 0.0
    assert ev["s2"][0] == 1.0


# ---------------------------------------------------------------------------
# x176's degree-orientation triangle count (operators/graph.py) vs a
# brute-force reference: the m^1.5 plan must count EXACTLY the
# brute-force triangles (each once, no /3 correction) on arbitrary
# small graphs, including skewed hubs and tie-heavy degree
# distributions. The test calls the SAME triangle_stats the registered
# query uses.
# ---------------------------------------------------------------------------
edges_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(raw=edges_strategy)
def test_degree_oriented_triangles_match_bruteforce(spark, raw):
    from itertools import combinations

    from ua2sql_spark.operators.graph import triangle_stats

    edges = {(min(u, v), max(u, v)) for u, v in raw}
    nodes = sorted({n for e in edges for n in e})
    expected_tri = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if {(a, b), (a, c), (b, c)} <= edges
    )
    deg = {n: sum(1 for e in edges if n in e) for n in nodes}
    expected_wedges = sum(d * (d - 1) // 2 for d in deg.values())

    e = spark.createDataFrame(sorted(edges), "u int, v int")
    row = triangle_stats(e).collect()[0]
    assert row["n_triangles"] == expected_tri
    assert row["n_wedges"] == expected_wedges
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(edges)


# ---------------------------------------------------------------------------
# x179's production pipeline (queries/dedup.py:_prefix_sim_pairs) is
# EXACT: its verified output must equal brute-force Jaccard >= 19/20
# enumeration. The generator mixes near-copies of a 25-token base set
# (base minus one element has J = 24/25 = 0.96, so NON-IDENTICAL
# qualifying pairs exist — a 15-token universe would make the property
# vacuous, since 20i >= 19u with u <= 15 forces i = u) with fully
# random sets that exercise the size filter and rare-token prefixes.
# ---------------------------------------------------------------------------
_PFX_BASE = frozenset(range(25))
docsets_strategy = st.lists(
    st.one_of(
        # near-copy: base minus at most one element
        st.integers(-1, 24).map(
            lambda k: _PFX_BASE if k < 0 else _PFX_BASE - {k}
        ),
        # unrelated random set
        st.sets(st.integers(0, 39), min_size=1, max_size=30),
    ),
    min_size=2,
    max_size=10,
)


@SETTINGS
@given(docs=docsets_strategy)
def test_prefix_simjoin_is_exact(spark, docs):
    from itertools import combinations

    from ua2sql_spark.queries.dedup import _PSJ_DEN, _PSJ_NUM, _prefix_sim_pairs

    truth = {
        (i, j): (len(a & b), len(a | b))
        for (i, a), (j, b) in combinations(enumerate(docs), 2)
        if _PSJ_DEN * len(a & b) >= _PSJ_NUM * len(a | b)
    }

    rows = [(i, " ".join(str(t) for t in sorted(s))) for i, s in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["i"], r["u"])
        for r in _prefix_sim_pairs(d).collect()
    }
    assert got == truth, (sorted(truth.items()), sorted(got.items()))


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    channels=st.sampled_from([1, 3]),
    ori=st.integers(min_value=1, max_value=8),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_exif_orientation_group_properties(w, h, channels, ori, data):
    """apply_exif_orientation implements the dihedral-group transforms:
    every orientation is a bijection (pixel multiset preserved), 2/3/4/
    5/7 are involutions, 6 and 8 are mutual inverses, and dims swap
    exactly for 5-8. Pure Python — no Spark."""
    from ua2sql_spark.functions.media import apply_exif_orientation

    raster = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * h * channels,
                max_size=w * h * channels,
            )
        )
    )
    ow, oh, out = apply_exif_orientation(w, h, channels, raster, ori)
    assert (ow, oh) == ((h, w) if ori >= 5 else (w, h))
    assert len(out) == len(raster)
    # bijection: the multiset of PIXELS (channel tuples) is preserved
    px = lambda b, width, height: sorted(  # noqa: E731
        b[i * channels : (i + 1) * channels] for i in range(width * height)
    )
    assert px(out, ow, oh) == px(raster, w, h)
    # inverse: applying the inverse orientation restores the original
    inverse = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}[ori]
    rw, rh, back = apply_exif_orientation(ow, oh, channels, out, inverse)
    assert (rw, rh, back) == (w, h, raster)


def test_operators_tolerate_empty_input(spark):
    """Empty-DataFrame smoke across the operator library: every
    operator must ANALYZE and EXECUTE on zero rows (foreachBatch idle
    triggers, fully-filtered inputs, empty partitions of a backfill all
    produce them). Two real bugs hid here (F.create_map() with zero
    args in minhash's bitmask and cumsum's offset map) — this pins the
    whole library."""
    from ua2sql_spark.operators.asof import asof_join
    from ua2sql_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        neardup_dedup,
    )
    from ua2sql_spark.operators.ordering import hash_ordered
    from ua2sql_spark.operators.pack import distributed_cumsum, pack_sequences
    from ua2sql_spark.operators.salt import salted_agg
    from ua2sql_spark.operators.sessionize import sessionize
    from ua2sql_spark.operators.split import hash_split
    from ua2sql_spark.operators.topk import top_k_per_group

    docs = spark.createDataFrame([], "doc_id bigint, text string")
    events = spark.createDataFrame(
        [], "event_id bigint, user_id bigint, ts timestamp, value double"
    )
    toks = spark.createDataFrame([], "doc_id bigint, n_tokens bigint")

    assert exact_dedup(docs, ["text"], "doc_id").count() == 0
    assert minhash_lsh_pairs(docs, id_col="doc_id", text_col="text").count() == 0
    assert neardup_dedup(docs, id_col="doc_id", text_col="text").count() == 0
    assert distributed_cumsum(toks, "doc_id", "n_tokens").count() == 0
    assert pack_sequences(toks, "doc_id", "n_tokens", 128).count() == 0
    assert top_k_per_group(events, ["user_id"], [F.desc("value")], 3).count() == 0
    assert sessionize(events).count() == 0
    assert hash_ordered(docs, "doc_id").count() == 0
    assert hash_split(docs, "doc_id").count() == 0
    assert (
        salted_agg(events, ["user_id"], {"n": ("count", F.lit(1))}).count() == 0
    )
    assert asof_join(events, events, on="user_id").count() == 0


def test_bpe_trainer_tolerates_empty_and_degenerate_corpus(spark, tmp_path):
    """x191/x192 drive a driver-side merge-argmax loop; an empty corpus
    (or one with no mergeable pair) must yield an empty merge table and
    empty encode stats, not a None-subscript crash."""
    from ua2sql_spark.queries.text_analysis import (
        x191_bpe_trainer,
        x192_bpe_encode,
    )

    sf = str(tmp_path / "sf_empty")
    import os

    os.makedirs(sf)
    spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    assert x191_bpe_trainer(spark, sf).count() == 0
    assert x192_bpe_encode(spark, sf).count() == 0

    # degenerate: single repeated 2-char word -> exactly one merge
    # possible; later rounds find no pair and stop early
    sf2 = str(tmp_path / "sf_tiny")
    os.makedirs(sf2)
    spark.createDataFrame(
        [(1, "ab ab", "en", "s", 5)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(os.path.join(sf2, "documents.parquet"))
    merges = x191_bpe_trainer(spark, sf2).collect()
    assert [(m["merge_rank"], m["merged"], m["n"]) for m in merges] == [(1, "ab", 2)]
    enc = x192_bpe_encode(spark, sf2).collect()
    assert len(enc) == 1 and enc[0]["n_tokens"] == 2 and enc[0]["n_chars"] == 4


def test_let_binding_semantics(spark):
    """functions.arrays.let must be value-transparent: same results as
    the inlined expression for arrays, scalars, multi-reference bodies,
    and NULL inputs — the plan-shape guarantee (single evaluation) is
    pinned separately by the reeval tripwire tests."""
    from ua2sql_spark.functions.arrays import let

    df = spark.createDataFrame(
        [(1, "a b b c"), (2, ""), (3, None)], "id bigint, text string"
    )
    ws = F.split(F.col("text"), " ")
    direct = df.select(
        "id",
        F.size(ws).alias("n"),
        F.size(F.array_distinct(ws)).alias("u"),
    )
    bound = df.select(
        "id",
        let(ws, lambda w: F.size(w)).alias("n"),
        let(ws, lambda w: F.size(F.array_distinct(w))).alias("u"),
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, bound.collect())
    )
    # multi-reference body evaluates the SAME bound value everywhere
    m = df.select(
        let(ws, lambda w: F.size(w) - F.size(w)).alias("z")
    ).collect()
    assert {r["z"] for r in m} == {0, None}
    # scalar binding
    s = df.select(
        let(F.length("text"), lambda n: n * 2 + n).alias("t")
    ).collect()
    assert {r["t"] for r in s} == {21, 0, None}


def test_lsh_index_probe_matches_inline_pairs(spark, tmp_path_factory):
    """The persisted band index is a LAYOUT, not a different algorithm:
    probing a saved index with a batch must surface exactly the cross
    (history x batch) candidate pairs the inline banded tier computes
    over the union — bucket partitioning may drop nothing."""
    from ua2sql_spark.operators.dedup import (
        lsh_band_rows,
        probe_lsh_index,
        save_lsh_index,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    words = base.split()
    texts = [" ".join(words[i:] + words[:i]) for i in range(8)]  # rotations: J=1 sets
    texts += [" ".join(w.upper() for w in words[: 4 + i]) for i in range(8)]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    history = df.filter(F.col("doc_id") % 2 == 0)
    batch = df.filter(F.col("doc_id") % 2 == 1)

    path = str(tmp_path_factory.mktemp("lshidx"))
    save_lsh_index(history, path, num_hashes=8, band_size=4, num_buckets=7)
    got = {
        (r["index_id"], r["batch_id"])
        for r in probe_lsh_index(spark, path, batch).collect()
    }

    hb = lsh_band_rows(history, "doc_id", "text", 8, 4)
    bb = lsh_band_rows(batch, "doc_id", "text", 8, 4)
    expected = {
        (r["index_id"], r["batch_id"])
        for r in hb.select(
            F.col("doc_id").alias("index_id"), "band_no", "band_hash"
        )
        .join(
            bb.select(F.col("doc_id").alias("batch_id"), "band_no", "band_hash"),
            ["band_no", "band_hash"],
        )
        .select("index_id", "batch_id")
        .distinct()
        .collect()
    }
    assert got == expected and len(expected) > 0


def test_lsh_index_probe_rejects_tokenizer_mismatch(spark, tmp_path_factory):
    from ua2sql_spark.functions.text import char_shingles
    from ua2sql_spark.operators.dedup import probe_lsh_index, save_lsh_index

    df = spark.createDataFrame([(1, "a b c"), (2, "a b d")], "doc_id bigint, text string")
    path = str(tmp_path_factory.mktemp("lshidx2"))
    save_lsh_index(df, path, num_hashes=8, band_size=4)
    with pytest.raises(ValueError, match="tokenizer"):
        probe_lsh_index(spark, path, df, tokenizer=char_shingles)


def test_lsh_index_append_equals_rebuild(spark, tmp_path_factory):
    """append(build(A), B) must hold exactly the band rows of
    build(A ∪ B) — appended rows land in the same (band_no,
    band_bucket) partitions probes prune to, so an incrementally-grown
    index and a from-scratch index are indistinguishable to a probe."""
    from ua2sql_spark.operators.dedup import append_lsh_index, save_lsh_index

    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    a = mk([(1, "alpha beta gamma"), (2, "delta epsilon zeta")])
    b = mk([(3, "alpha beta gamma"), (4, "eta theta iota kappa")])

    inc = str(tmp_path_factory.mktemp("inc"))
    full = str(tmp_path_factory.mktemp("full"))
    save_lsh_index(a, inc, num_hashes=8, band_size=4, num_buckets=5)
    append_lsh_index(b, inc)
    save_lsh_index(a.unionByName(b), full, num_hashes=8, band_size=4, num_buckets=5)

    cols = ["doc_id", "band_no", "band_bucket", "band_hash", "sig"]
    read = lambda p: {
        tuple(
            tuple(v) if isinstance(v, list) else v for v in (r[c] for c in cols)
        )
        for r in spark.read.parquet(p + "/lists").select(cols).collect()
    }
    assert read(inc) == read(full)


@given(
    st.lists(
        st.text(alphabet="abcx ", min_size=0, max_size=9),
        min_size=1, max_size=8, unique=True,
    ),
    st.lists(
        st.text(alphabet="abcx ", min_size=0, max_size=9),
        min_size=1, max_size=8, unique=True,
    ),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzzy_join_matches_bruteforce(spark, xs, ys):
    """Recall-1.0 contract of the q-gram prefix + length blocking: the
    blocked join must return EXACTLY the brute-force Levenshtein ≤ k
    pairs — tiny alphabet + short/repetitive strings adversarially
    target the short-string tier and the distinct-gram prefix bound."""
    from ua2sql_spark.operators.fuzzy import fuzzy_join_editdist

    def lev(s, t):
        if len(s) < len(t):
            s, t = t, s
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    k = 2
    a = spark.createDataFrame(list(enumerate(xs)), "a_id bigint, s string")
    b = spark.createDataFrame(list(enumerate(ys)), "b_id bigint, s string")
    got = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in fuzzy_join_editdist(a, b, "a_id", "s", "b_id", "s", k=k).collect()
    }
    expected = {
        (i, j, lev(x, y))
        for i, x in enumerate(xs)
        for j, y in enumerate(ys)
        if lev(x, y) <= k
    }
    assert got == expected


def test_ivf_index_append_routes_through_frozen_centroids(spark, tmp_path_factory):
    """append_ivf_index must assign new vectors with the index's SAVED
    centroids (never re-derive), so the grown lists equal
    assign-to-frozen-centroids of the union — and a probe over the
    grown index finds appended neighbors through the same partition
    pruning."""
    from ua2sql_spark.operators.ivf import (
        append_ivf_index,
        assign_to_centroids,
        probe_ivf_index,
        save_ivf_index,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    a = mk([(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)])
            for i in range(12)])
    b = mk([(100 + i, [1.0, float(i) / 10.0, 0.0]) for i in range(4)])

    path = str(tmp_path_factory.mktemp("ivfinc"))
    save_ivf_index(a, path, centroid_stride=4)  # centroids: ids 0,4,8
    append_ivf_index(spark, b, path)

    cent = spark.read.parquet(path + "/centroids").select(
        F.col("cid").alias("__cid"), F.col("cemb").alias("__cemb")
    )
    expected = {
        (r["vec_id"], r["cell"])
        for r in assign_to_centroids(a.unionByName(b), cent).collect()
    }
    got = {
        (r["neighbor_id"], r["cell"])
        for r in spark.read.parquet(path + "/lists").collect()
    }
    assert got == expected
    # centroids untouched by the append
    assert {r["cid"] for r in spark.read.parquet(path + "/centroids").collect()} == {0, 4, 8}

    # a probe finds the appended vectors as neighbors
    q = mk([(999, [1.0, 0.05, 0.0])])
    top = probe_ivf_index(spark, path, q, id_col="vec_id", nprobe=1, k=3).collect()
    assert any(r["neighbor_id"] >= 100 for r in top)


def test_bloom_index_append_or_merges(spark, tmp_path_factory):
    """Blooms are OR-mergeable: an append-grown bloom loads to exactly
    the words of a from-scratch build over the union, and membership
    has zero false negatives for every inserted fingerprint."""
    from ua2sql_spark.operators.bloom import (
        append_bloom_index,
        bloom_maybe,
        build_bloom_index,
        load_bloom_words,
        save_bloom_index,
    )

    mk = lambda vals: spark.createDataFrame([(v,) for v in vals], "f string")
    a = [f"fp{i}" for i in range(20)]
    b = [f"fp{i}" for i in range(15, 35)]  # overlaps a

    path = str(tmp_path_factory.mktemp("bloom"))
    save_bloom_index(mk(a), path, "f", n_shards=3, m_bits=256, k=3)
    append_bloom_index(mk(b), path, "f")

    words, p = load_bloom_words(spark, path)
    direct = build_bloom_index(
        mk(sorted(set(a) | set(b))), "f", n_shards=3, m_bits=256, k=3
    )
    assert {tuple(r) for r in words.collect()} == {tuple(r) for r in direct.collect()}

    # zero false negatives: every inserted fp is flagged — probed with
    # DUPLICATE fp rows, which must not double the per-fp hit sum and
    # flip a true member to "definitely new"
    probe = sorted(set(a) | set(b)) + a[:5] + a[:5]
    flagged = {
        r["f"]
        for r in bloom_maybe(
            mk(probe), words, "f", n_shards=3, m_bits=256, k=3
        ).collect()
    }
    assert flagged == set(a) | set(b)


def test_lsh_index_roundtrip_with_custom_tokenizer(spark, tmp_path_factory):
    """save/append/probe with a NON-default tokenizer (char shingles):
    the params sidecar records it, a matching probe passes the
    fail-fast and finds cross-side candidates whose shingle sets
    collide — the word tokenizer would see these single-'word' strings
    as all-distinct, so a hit here proves the tokenizer actually
    flowed through build and probe."""
    from ua2sql_spark.functions.text import char_shingles
    from ua2sql_spark.operators.dedup import (
        append_lsh_index,
        probe_lsh_index,
        save_lsh_index,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    hist = mk([(1, "abcdefghij"), (2, "zzzzyyyyxxxx")])
    more = mk([(3, "qqqqrrrrssss")])
    batch = mk([(10, "abcdefghij"), (11, "qqqqrrrrssss"), (12, "totally-other")])

    path = str(tmp_path_factory.mktemp("lshtok"))
    save_lsh_index(hist, path, num_hashes=8, band_size=4, tokenizer=char_shingles)
    append_lsh_index(more, path, tokenizer=char_shingles)
    got = {
        (r["index_id"], r["batch_id"])
        for r in probe_lsh_index(spark, path, batch, tokenizer=char_shingles).collect()
    }
    # identical texts share every shingle -> collide in every band
    assert (1, 10) in got and (3, 11) in got
    assert all(b != 12 for _, b in got)


def test_lsh_index_probe_large_batch_unhinted_identical(spark, tmp_path_factory):
    """VERDICT r10 #4: the probe's broadcast hint is GUARDED — a
    backfill-sized batch (over broadcast_max_rows band rows) takes the
    unhinted join path and must return exactly the same candidates.
    broadcast_max_rows=0 forces that path deterministically."""
    from ua2sql_spark.operators.dedup import probe_lsh_index, save_lsh_index

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    words = base.split()
    texts = [" ".join(words[i:] + words[:i]) for i in range(10)]
    texts += [" ".join(w.upper() for w in words[: 4 + i]) for i in range(10)]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    history = df.filter(F.col("doc_id") % 4 == 0)  # large-fraction batch
    batch = df.filter(F.col("doc_id") % 4 != 0)

    path = str(tmp_path_factory.mktemp("lshidx_lb"))
    save_lsh_index(history, path, num_hashes=8, band_size=4, num_buckets=7)
    rows = lambda df_: {
        (r["index_id"], r["batch_id"], r["sig_agree"]) for r in df_.collect()
    }
    hinted = rows(probe_lsh_index(spark, path, batch))
    unhinted = rows(probe_lsh_index(spark, path, batch, broadcast_max_rows=0))
    assert hinted == unhinted and len(hinted) > 0


def test_lsh_index_probe_rejects_same_named_different_tokenizer(
    spark, tmp_path_factory
):
    """ADVICE r10: the tokenizer fail-fast compared only __name__, so two
    different functions both named 'word_set' (or two lambdas) silently
    mixed tokenizations in one index. The persisted canonical-sample
    digest must catch them."""
    from ua2sql_spark.operators.dedup import probe_lsh_index, save_lsh_index

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id bigint, text string"
    )
    path = str(tmp_path_factory.mktemp("lshidx_tok"))
    save_lsh_index(df, path, num_hashes=8, band_size=4)

    def impostor(c):
        return F.array_distinct(F.split(F.upper(c), " "))

    impostor.__name__ = "word_set"
    with pytest.raises(ValueError, match="digest"):
        probe_lsh_index(spark, path, df, tokenizer=impostor)

    # an index saved WITHOUT the digest column (pre-r11 layout) still
    # probes fine with the true tokenizer (name check only)
    import shutil

    legacy = str(tmp_path_factory.mktemp("lshidx_legacy"))
    save_lsh_index(df, legacy, num_hashes=8, band_size=4)
    stripped = spark.read.parquet(legacy + "/params").drop("tok_digest").collect()
    shutil.rmtree(legacy + "/params")
    spark.createDataFrame(stripped).coalesce(1).write.parquet(legacy + "/params")
    assert probe_lsh_index(spark, legacy, df).count() > 0


def test_compact_lsh_index_drops_replay_duplicates(spark, tmp_path_factory):
    """Replayed appends re-add band rows verbatim; compaction into a
    fresh path must drop exactly those full-row duplicates, keep the
    hive layout (probes still prune), and leave probe candidates
    identical."""
    from ua2sql_spark.operators.dedup import (
        append_lsh_index,
        compact_lsh_index,
        probe_lsh_index,
        save_lsh_index,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    hist = mk([(1, "alpha beta gamma"), (2, "delta epsilon zeta")])
    more = mk([(3, "alpha beta gamma"), (4, "eta theta iota")])
    batch = mk([(10, "alpha beta gamma"), (11, "mu nu xi")])

    src = str(tmp_path_factory.mktemp("cls")) + "/idx"
    dst = str(tmp_path_factory.mktemp("cls")) + "/compact"
    save_lsh_index(hist, src, num_hashes=8, band_size=4, num_buckets=5)
    append_lsh_index(more, src)
    append_lsh_index(more, src)  # replay: verbatim duplicates

    m = compact_lsh_index(spark, src, dst)
    assert m["n_duplicates_dropped"] == m["n_rows"] - m["n_kept"] > 0
    rows = lambda p: sorted(
        (r["doc_id"], r["band_no"], r["band_bucket"], r["band_hash"], tuple(r["sig"]))
        for r in spark.read.parquet(p + "/lists").collect()
    )
    assert rows(dst) == sorted(set(rows(src)))
    cands = lambda p: {
        (r["index_id"], r["batch_id"], r["sig_agree"])
        for r in probe_lsh_index(spark, p, batch).collect()
    }
    assert cands(dst) == cands(src) and len(cands(dst)) > 0
    # params carried verbatim -> append keeps working against dst
    append_lsh_index(mk([(20, "pi rho sigma")]), dst)
    with pytest.raises(ValueError, match="exists"):
        compact_lsh_index(spark, src, dst)


# ---------------------------------------------------------------------------
# reconcile_tables (operators/reconcile.py, round 11)
# ---------------------------------------------------------------------------


def test_reconcile_statuses_and_changed_cols(spark):
    from ua2sql_spark.operators.reconcile import reconcile_tables

    left = spark.createDataFrame(
        [(1, "a", 10, "s1"), (2, "b", 20, "s1"), (3, None, 30, "s2"),
         (4, "d", 40, "s2")],
        "k bigint, t string, n bigint, src string",
    )
    right = spark.createDataFrame(
        # 1 unchanged; 2 t changed; 3 NULL->value (null-safe change);
        # 4 absent (only_left); 5 new (only_right)
        [(1, "a", 10, "s1"), (2, "B", 20, "s1"), (3, "c", 30, "s2"),
         (5, "e", 50, "s3")],
        "k bigint, t string, n bigint, src string",
    )
    out = {
        r["k"]: r
        for r in reconcile_tables(
            left, right, ["k"], compare_cols=["t", "n"], carry_cols=["src"]
        ).collect()
    }
    assert {k: r["status"] for k, r in out.items()} == {
        1: "unchanged", 2: "changed", 3: "changed", 4: "only_left",
        5: "only_right",
    }
    assert out[2]["changed_cols"] == ["t"]
    assert out[3]["changed_cols"] == ["t"]  # NULL -> 'c' counts
    # presence-only rows pin changed_cols empty, carry coalesces sides
    assert out[4]["changed_cols"] == [] and out[4]["src"] == "s2"
    assert out[5]["changed_cols"] == [] and out[5]["src"] == "s3"


def test_reconcile_defaults_to_shared_noncompare_columns(spark):
    from ua2sql_spark.operators.reconcile import reconcile_tables

    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k bigint, t string, extra double"
    )
    right = spark.createDataFrame(
        [(1, "a", 9), (2, "x", 9)], "k bigint, t string, other bigint"
    )
    # only `t` is shared beyond the key -> default compare set = {t}
    rows = {r["k"]: r for r in reconcile_tables(left, right, ["k"]).collect()}
    assert rows[1]["status"] == "unchanged"
    assert rows[2]["status"] == "changed" and rows[2]["changed_cols"] == ["t"]


def test_reconcile_key_only_tables_never_report_changed(spark):
    from ua2sql_spark.operators.reconcile import reconcile_tables

    left = spark.createDataFrame([(1,), (2,)], "k bigint")
    right = spark.createDataFrame([(2,), (3,)], "k bigint")
    rows = {
        r["k"]: r["status"]
        for r in reconcile_tables(left, right, ["k"], compare_cols=[]).collect()
    }
    assert rows == {1: "only_left", 2: "unchanged", 3: "only_right"}


def test_reconcile_validate_keys_rejects_duplicates(spark):
    """ADVICE r11 #1: duplicate keys silently explode the full-outer
    join; validate_keys=True must fail fast naming the side, and clean
    inputs must pass the guard unchanged."""
    import pytest

    from ua2sql_spark.operators.reconcile import reconcile_tables

    clean = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    duped = spark.createDataFrame(
        [(1, "a"), (1, "a2"), (2, "b")], "k bigint, v string"
    )
    with pytest.raises(ValueError, match="duplicate key on right"):
        reconcile_tables(clean, duped, ["k"], validate_keys=True)
    with pytest.raises(ValueError, match="duplicate key on left"):
        reconcile_tables(duped, clean, ["k"], validate_keys=True)
    rows = {
        r["k"]: r["status"]
        for r in reconcile_tables(
            clean, clean, ["k"], validate_keys=True
        ).collect()
    }
    assert rows == {1: "unchanged", 2: "unchanged"}
    # default stays guard-free (the documented expects-unique contract)
    assert reconcile_tables(duped, clean, ["k"]).count() >= 3


def test_repair_from_reference_rejects_duplicate_reference_keys(spark, tmp_path):
    """The write path always guards: a duplicated reference key would
    multiply the upsert batch, so repair raises before writing."""
    import pytest

    from ua2sql_spark.operators.reconcile import repair_from_reference
    from ua2sql_spark.operators.snapshot import upsert_cow

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a", "p"), (2, "b", "p")], "k bigint, v string, part string")
    upsert_cow(base, path, ["k"], "part")
    bad_ref = spark.createDataFrame(
        [(1, "a", "p"), (3, "c", "p"), (3, "c2", "p")], "k bigint, v string, part string"
    )
    with pytest.raises(ValueError, match="upsert batch"):
        repair_from_reference(spark, path, bad_ref, ["k"], "part")


def test_lsh_index_health_agrees_with_compaction(spark, tmp_path):
    """n_dup_rows is the compaction trigger: it must equal exactly what
    compact_lsh_index drops, and n_distinct_rows what it keeps."""
    from ua2sql_spark.operators.dedup import (
        append_lsh_index,
        compact_lsh_index,
        lsh_index_health,
        save_lsh_index,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    src = str(tmp_path / "idx")
    save_lsh_index(mk([(1, "alpha beta gamma"), (2, "delta epsilon zeta")]), src)
    batch = mk([(3, "eta theta iota"), (4, "alpha beta gamma")])
    append_lsh_index(batch, src)
    append_lsh_index(batch, src)  # replay
    append_lsh_index(batch, src)  # second replay

    h = {r["band_no"]: r for r in lsh_index_health(spark, src).collect()}
    stats = compact_lsh_index(spark, src, str(tmp_path / "idx2"))
    assert sum(r["n_dup_rows"] for r in h.values()) == stats["n_duplicates_dropped"]
    assert sum(r["n_distinct_rows"] for r in h.values()) == stats["n_kept"]
    assert sum(r["n_rows"] for r in h.values()) == stats["n_rows"]
    for r in h.values():
        # 2 base docs + 2 batch docs, batch rows tripled -> 8 per band
        assert r["n_rows"] == 8 and r["n_distinct_rows"] == 4
        assert r["n_dup_rows"] == 4
        assert 1 <= r["n_buckets_used"] <= r["n_hash_groups"] <= 4
        assert r["max_hash_group"] <= r["n_distinct_rows"]


def test_reconcile_snapshot_changes_audits_only_touched_keys(spark, tmp_path):
    """Incremental reconcile: churn keys from the change feed only —
    an untouched key that disagrees with the reference is NOT audited
    (by contract), deletes read only_right, updates compare values."""
    from ua2sql_spark.operators.reconcile import reconcile_snapshot_changes
    from ua2sql_spark.operators.snapshot import delete_cow, upsert_cow

    path = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(1, "a", "p"), (2, "b", "p"), (3, "c", "q"), (4, "d", "q")],
        "k bigint, t string, part string",
    )
    upsert_cow(base, path, ["k"], "part")                      # v0
    upd = spark.createDataFrame([(2, "B2", "p")], "k bigint, t string, part string")
    upsert_cow(upd, path, ["k"], "part")                       # v1: update k=2
    delete_cow(spark, path, F.col("k") == 3, "part")           # v2: delete k=3

    reference = spark.createDataFrame(
        # k=2 matches the update; k=3 still present (reads only_right);
        # k=4 DISAGREES but was never touched -> must not appear
        [(1, "a", "p"), (2, "B2", "p"), (3, "c", "q"), (4, "XX", "q")],
        "k bigint, t string, part string",
    )
    rows = {
        r["k"]: r
        for r in reconcile_snapshot_changes(
            spark, path, reference, ["k"], from_version=0,
            compare_cols=["t"], carry_cols=["part"],
        ).collect()
    }
    assert set(rows) == {2, 3}, f"only touched keys audited, got {set(rows)}"
    assert rows[2]["status"] == "unchanged"
    assert rows[3]["status"] == "only_right" and rows[3]["part"] == "q"
    # from the very beginning (-1): v0 inserts make EVERY key touched,
    # so the untouched-divergence k=4 now surfaces as changed
    rows_all = {
        r["k"]: r["status"]
        for r in reconcile_snapshot_changes(
            spark, path, reference, ["k"], from_version=-1, compare_cols=["t"]
        ).collect()
    }
    assert rows_all == {
        1: "unchanged", 2: "unchanged", 3: "only_right", 4: "changed",
    }


def test_repair_from_reference_converges_and_bounds_rewrite(spark, tmp_path):
    """diff -> repair: the table converges onto the reference in at
    most two CoW commits, and partitions with no diverged keys keep
    their exact files (the churn-proportional rewrite claim, checked
    via manifest file reuse)."""
    from ua2sql_spark.operators.reconcile import repair_from_reference
    from ua2sql_spark.operators.snapshot import (
        latest_version,
        read_manifest,
        read_snapshot,
        upsert_cow,
    )

    path = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(1, "a", "p"), (2, "b", "q"), (3, "c", "q")],
        "k bigint, t string, part string",
    )
    upsert_cow(base, path, ["k"], "part")  # v0
    reference = spark.createDataFrame(
        # k=1 untouched (partition p diverges nowhere); k=2 changed;
        # k=3 absent (extra in table); k=5 new
        [(1, "a", "p"), (2, "B", "q"), (5, "e", "q")],
        "k bigint, t string, part string",
    )
    stats = repair_from_reference(
        spark, path, reference, ["k"], "part", delete_extra=True
    )
    assert stats == {"upserted": 2, "deleted": 1}

    vN = latest_version(spark, path)
    assert vN == 2  # exactly two commits: upsert + delete
    final = {
        (r["k"], r["t"], r["part"])
        for r in read_snapshot(spark, path, vN).collect()
    }
    assert final == {(1, "a", "p"), (2, "B", "q"), (5, "e", "q")}
    # the un-diverged partition p carries the SAME file through every
    # version — repair never rewrote it
    files = lambda v: {  # noqa: E731
        r["file"]
        for r in read_manifest(spark, path, v).collect()
        if r["partition"].startswith("part=p")
    }
    assert files(0) == files(1) == files(2) and len(files(0)) > 0
    # idempotent: a second repair finds nothing to fix
    assert repair_from_reference(
        spark, path, reference, ["k"], "part", delete_extra=True
    ) == {"upserted": 0, "deleted": 0}
    assert latest_version(spark, path) == 2


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=st.dictionaries(
        st.integers(min_value=0, max_value=12),
        st.tuples(st.one_of(st.none(), st.sampled_from(["a", "b"])),
                  st.integers(min_value=0, max_value=3)),
        max_size=10,
    ),
    right=st.dictionaries(
        st.integers(min_value=0, max_value=12),
        st.tuples(st.one_of(st.none(), st.sampled_from(["a", "b"])),
                  st.integers(min_value=0, max_value=3)),
        max_size=10,
    ),
)
def test_reconcile_matches_bruteforce(spark, left, right):
    """reconcile_tables vs a dict-based reference diff, including NULL
    values on either side of a compare column."""
    from ua2sql_spark.operators.reconcile import reconcile_tables

    def mk(d):
        rows = [(k, t, n) for k, (t, n) in sorted(d.items())]
        return spark.createDataFrame(rows, "k bigint, t string, n bigint") \
            if rows else spark.createDataFrame([], "k bigint, t string, n bigint")

    out = {
        r["k"]: (r["status"], tuple(r["changed_cols"]))
        for r in reconcile_tables(mk(left), mk(right), ["k"]).collect()
    }
    expect = {}
    for k in set(left) | set(right):
        if k not in right:
            expect[k] = ("only_left", ())
        elif k not in left:
            expect[k] = ("only_right", ())
        else:
            diffs = tuple(
                name for name, i in (("n", 1), ("t", 0))
                if left[k][i] != right[k][i]
            )
            # operator reports changed_cols in compare-col order (t, n)
            diffs = tuple(sorted(diffs, key=lambda c: ("n", "t").index(c)))
            expect[k] = (("changed", diffs) if diffs else ("unchanged", ()))
    assert out == expect


def test_schema_drift_report(spark):
    from ua2sql_spark.operators.reconcile import schema_drift_report

    left = spark.createDataFrame([], "k bigint, t string, gone double")
    right = spark.createDataFrame([], "k bigint, t int, added date")
    rows = {
        r["column"]: (r["status"], r["left_type"], r["right_type"])
        for r in schema_drift_report(spark, left, right).collect()
    }
    assert rows == {
        "k": ("match", "bigint", "bigint"),
        "t": ("type_mismatch", "string", "int"),
        "gone": ("only_left", "double", None),
        "added": ("only_right", None, "date"),
    }


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pts=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5),
                  st.integers(min_value=0, max_value=4)),
        min_size=2, max_size=40,
    )
)
def test_kendall_tau_cell_fold_matches_bruteforce(spark, pts):
    """x209's cell-pair fold vs the O(n²) textbook pair count: the
    doubled concordant/discordant/tie statistics must agree exactly on
    arbitrary tied integer data (the whole point of the cell collapse
    is that it is an identity, not an approximation)."""
    import itertools

    from ua2sql_spark.queries.aggregates import x209_kendall_tau  # noqa: F401
    # drive the same math through a minimal inline twin of the cell
    # fold (the registered query is lineitem-bound; the operator's
    # arithmetic is what we pin here)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pts, "x bigint, y bigint")
    cells = df.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    a = cells.select(F.col("x").alias("ax"), F.col("y").alias("ay"),
                     F.col("c").alias("ac"))
    b = cells.select(F.col("x").alias("bx"), F.col("y").alias("by"),
                     F.col("c").alias("bc"))
    prod = F.col("ac").cast("decimal(19,0)") * F.col("bc").cast("decimal(19,0)")
    conc = (F.col("ax") < F.col("bx")) & (F.col("ay") < F.col("by")) | (
        (F.col("ax") > F.col("bx")) & (F.col("ay") > F.col("by")))
    disc = (F.col("ax") < F.col("bx")) & (F.col("ay") > F.col("by")) | (
        (F.col("ax") > F.col("bx")) & (F.col("ay") < F.col("by")))
    row = (
        a.crossJoin(F.broadcast(b))
        .agg(
            F.coalesce(F.sum(F.when(conc, prod)), F.lit(0)).alias("nc2"),
            F.coalesce(F.sum(F.when(disc, prod)), F.lit(0)).alias("nd2"),
        )
        .collect()[0]
    )
    nc = nd = 0
    for (x1, y1), (x2, y2) in itertools.combinations(pts, 2):
        if (x1 < x2 and y1 < y2) or (x1 > x2 and y1 > y2):
            nc += 1
        elif (x1 < x2 and y1 > y2) or (x1 > x2 and y1 < y2):
            nd += 1
    assert (int(row["nc2"]), int(row["nd2"])) == (2 * nc, 2 * nd)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    base=st.dictionaries(st.integers(min_value=0, max_value=9),
                         st.sampled_from(["a", "b", "c"]),
                         min_size=1, max_size=8),
    ref=st.dictionaries(st.integers(min_value=0, max_value=9),
                        st.sampled_from(["a", "b", "c"]),
                        min_size=1, max_size=8),
)
def test_repair_converges_for_arbitrary_divergence(spark, tmp_path_factory, base, ref):
    """Random table/reference pairs: repair_from_reference(delete_extra)
    must always leave the table exactly equal to the reference, with a
    residual reconcile reading all-unchanged — convergence as a
    property, not an example."""
    from ua2sql_spark.operators.reconcile import (
        reconcile_tables,
        repair_from_reference,
    )
    from ua2sql_spark.operators.snapshot import read_snapshot, upsert_cow

    path = str(tmp_path_factory.mktemp("conv") / "tbl")
    mk = lambda d: spark.createDataFrame(  # noqa: E731
        [(k, v, str(k % 2)) for k, v in sorted(d.items())],
        "k bigint, v string, part string",
    )
    upsert_cow(mk(base), path, ["k"], "part")
    repair_from_reference(
        spark, path, mk(ref), ["k"], "part", delete_extra=True
    )
    final = {(r["k"], r["v"]) for r in read_snapshot(spark, path).collect()}
    assert final == set(ref.items())
    statuses = {
        r["status"]
        for r in reconcile_tables(
            read_snapshot(spark, path), mk(ref), ["k"]
        ).collect()
    }
    assert statuses <= {"unchanged"}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    series=st.lists(st.integers(min_value=0, max_value=6),
                    min_size=3, max_size=20),
)
def test_mann_kendall_statistics_match_bruteforce(spark, series):
    """x213's S / tie-term / Theil-Sen arithmetic vs the textbook O(n²)
    definitions on arbitrary tied integer series — the same inline-twin
    discipline as the Kendall cell-fold pin (the registered query is
    orders-bound; the arithmetic is what we pin)."""
    import itertools
    import statistics

    from pyspark.sql import Window

    pts = list(enumerate(series))  # (time index, value)
    df = spark.createDataFrame(pts, "mi int, v bigint").localCheckpoint()
    sgn = (
        F.when(F.col("b.v") > F.col("a.v"), 1)
        .when(F.col("b.v") < F.col("a.v"), -1)
        .otherwise(0)
    )
    pairs = df.alias("a").join(
        F.broadcast(df.alias("b")), F.col("b.mi") > F.col("a.mi")
    )
    s_row = pairs.agg(F.sum(sgn).cast("bigint").alias("s")).collect()[0]
    t = F.col("t")
    tie_row = (
        df.groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(t > 1)
        .agg(F.coalesce(F.sum(t * (t - 1) * (2 * t + 5)), F.lit(0)).alias("tt"))
        .collect()[0]
    )
    slopes_df = pairs.select(
        (
            (F.col("b.v").cast("double") - F.col("a.v").cast("double"))
            / (F.col("b.mi") - F.col("a.mi"))
        ).alias("slope")
    )
    w = Window.orderBy("slope")
    ranked = slopes_df.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("ns"),
    )
    med_row = ranked.filter(
        (F.col("rn") == F.floor((F.col("ns") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("ns") + 2) / 2))
    ).agg(F.avg("slope").alias("m")).collect()[0]

    # brute force
    s = 0
    slopes = []
    for (i, vi), (j, vj) in itertools.combinations(pts, 2):
        s += (vj > vi) - (vj < vi)
        slopes.append((vj - vi) / (j - i))
    from collections import Counter

    tt = sum(
        c * (c - 1) * (2 * c + 5) for c in Counter(series).values() if c > 1
    )
    assert int(s_row["s"]) == s
    assert int(tie_row["tt"]) == tt
    assert med_row["m"] == pytest.approx(statistics.median(slopes), abs=1e-12)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    # doc -> (fingerprint id, split id 0=train/1=val/2=test)
    docs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5),
                  st.integers(min_value=0, max_value=2)),
        min_size=1, max_size=30),
)
def test_split_leakage_group_arithmetic_matches_pair_enumeration(spark, docs):
    """x214's pair-free per-group arithmetic vs brute-force enumeration
    of every duplicate pair and its split placement."""
    import itertools

    rows = [(f"f{f}", ["train", "val", "test"][sp]) for f, sp in docs]
    df = spark.createDataFrame(rows, "f string, split string")
    cnt = lambda s: F.sum(  # noqa: E731
        F.when(F.col("split") == s, 1).otherwise(0)
    ).cast("bigint")
    g = df.groupBy("f").agg(
        cnt("train").alias("a"), cnt("val").alias("b"), cnt("test").alias("c")
    )
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    row = g.agg(
        F.sum(a * (a - 1) / 2).cast("bigint").alias("wt"),
        F.sum(b * (b - 1) / 2).cast("bigint").alias("wv"),
        F.sum(c * (c - 1) / 2).cast("bigint").alias("ws"),
        F.sum(a * (b + c)).cast("bigint").alias("te"),
        F.sum(b * c).cast("bigint").alias("vt"),
        F.sum(F.when(a > 0, b + c).otherwise(0)).cast("bigint").alias("leaky"),
    ).collect()[0]

    wt = wv = ws = te = vt = 0
    for (f1, s1), (f2, s2) in itertools.combinations(docs, 2):
        if f1 != f2:
            continue
        pair = {["train", "val", "test"][s1], ["train", "val", "test"][s2]}
        if pair == {"train"}:
            wt += 1
        elif pair == {"val"}:
            wv += 1
        elif pair == {"test"}:
            ws += 1
        elif "train" in pair:
            te += 1
        else:
            vt += 1
    train_fps = {f for f, sp in docs if sp == 0}
    leaky = sum(1 for f, sp in docs if sp != 0 and f in train_fps)
    assert (row["wt"], row["wv"], row["ws"], row["te"], row["vt"],
            row["leaky"]) == (wt, wv, ws, te, vt, leaky)
