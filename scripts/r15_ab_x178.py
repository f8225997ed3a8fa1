"""Interleaved A/B: x178 double-prefilter, VERDICT r14 #6's one bounded
retry — the r14 rejection ran the double pass twice because the scored
frame (carrying emb) was too wide to checkpoint; here the double-score
frame is narrowed to (vec_id, cid, dd) and eagerly checkpointed, so the
double pass runs once and only provably-safe candidate cells pay the
exact DECIMAL(28,8) fold.

Exactness: per (vec,cell), dec and dbl sum the SAME 64 double products
t_i >= 0; dec = sum(round8(t_i)) exactly, so |dec - sum t| <= 64*0.5e-8;
|dbl - sum t| <= gamma_63 * sum t ~= 1.4e-14 * dd. A cell is excluded
only when dd_c > mn + eps with eps = 1e-6 + 1e-13*(dd_c + mn) — at
least 3x the two bounds combined — which forces dec_c > dec of the
double-argmin cell (itself always a candidate), so the exact argmin
(min over (d2, cid) structs, ties to low cid) is unchanged: every cell
whose decimal d2 could equal the minimum survives the prefilter.

A = production registry x178 (decimal fold for ALL |V| x K cells).
B = prefiltered variant (decimal fold for ~|V| candidate cells).
Usage: python scripts/r15_ab_x178.py [rounds]
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7

from pyspark.sql import functions as F  # noqa: E402

from ua2sql_spark.session import get_spark  # noqa: E402
from ua2sql_spark.registry import all_queries  # noqa: E402
from ua2sql_spark.catalog import load_table  # noqa: E402

spark = get_spark("r15-ab-x178")
spark.sparkContext.setLogLevel("ERROR")
specs = all_queries()

_KM_STRIDE = 20
DEC18 = "decimal(18,8)"
DEC28 = "decimal(28,8)"


def variant_a():
    return specs["x178_kmeans_lloyd"].fn(spark, SF_DIR)


def variant_b():
    # Decimal fold + argmin + update copied from production
    # (queries/similarity.py @ c326dbf); only distances() changes.
    e = load_table(spark, SF_DIR, "embeddings")
    pts = (
        e.select(
            "vec_id",
            F.transform("embedding", lambda v: v.cast("double")).alias("emb"),
        )
        .repartition(32, "vec_id")
        .localCheckpoint(eager=False)
    )
    cent0 = pts.filter(F.col("vec_id") % _KM_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
    )

    def dec_d2():
        return F.aggregate(
            F.zip_with(F.col("emb"), F.col("cemb"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast(DEC28),
            lambda acc, v: (acc + v.cast(DEC18)).cast(DEC28),
        )

    def distances(cent_df):
        dbl_d2 = F.aggregate(
            F.zip_with(F.col("emb"), F.col("cemb"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        scored = (
            pts.crossJoin(F.broadcast(cent_df))
            .select("vec_id", "cid", dbl_d2.alias("dd"))
            .localCheckpoint(eager=True)
        )
        mins = scored.groupBy("vec_id").agg(F.min("dd").alias("mn"))
        eps = F.lit(1e-6) + F.lit(1e-13) * (F.col("dd") + F.col("mn"))
        cand = (
            scored.join(F.broadcast(mins), "vec_id")
            .filter(F.col("dd") <= F.col("mn") + eps)
            .select("vec_id", "cid")
        )
        return (
            cand.join(pts, "vec_id")
            .join(F.broadcast(cent_df), "cid")
            .select("vec_id", "cid", dec_d2().alias("d2"))
        )

    def argmin(d2_df):
        return d2_df.groupBy("vec_id").agg(
            F.min(F.struct(F.col("d2"), F.col("cid"))).alias("m")
        ).select("vec_id", F.col("m.cid").alias("cell"), F.col("m.d2").alias("d2"))

    def update(assign_df):
        member_dims = (
            pts.join(assign_df.select("vec_id", "cell"), "vec_id")
            .select("cell", F.posexplode("emb").alias("i", "x"))
            .groupBy(F.col("cell").alias("cid"), "i")
            .agg(
                (F.sum(F.col("x").cast(DEC28)).cast("double") / F.count("x")).alias("c")
            )
        )
        return member_dims.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
            ).alias("cemb")
        )

    cent = cent0
    for _ in range(2):
        cent = update(argmin(distances(cent)))
    final = argmin(distances(cent))
    return (
        final.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.round(F.sum("d2").cast("double"), 6).alias("inertia"),
        )
        .orderBy("cell")
    )


def run(df):
    df.write.format("noop").mode("overwrite").save()


assert sorted(map(tuple, variant_a().collect())) == sorted(
    map(tuple, variant_b().collect())
), "A/B results differ!"
print("results identical", flush=True)

run(variant_a())
run(variant_b())
ta, tb = [], []
for i in range(rounds):
    t0 = time.perf_counter(); run(variant_a()); ta.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run(variant_b()); tb.append(time.perf_counter() - t0)
    print(f"round {i}: A {ta[-1]:.3f}  B {tb[-1]:.3f}", flush=True)
print(f"A(full-dec) median {statistics.median(ta):.4f}  B(prefilter) median {statistics.median(tb):.4f}")
spark.stop()
