"""Phase breakdown of corpus_pipeline (pipeline_e2e_sec in bench extras).

Times each stage of the composed pipeline separately so the e2e number
can be attributed: NFC+gate+persist, exact+near dedup, packing count,
WebDataset export. Usage: python scripts_r14_pipeline_phase.py [n_rounds]
"""
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from ua2sql_spark.session import get_spark  # noqa: E402
from ua2sql_spark.catalog import load_table, load_tables  # noqa: E402
from ua2sql_spark.operators.dedup import exact_dedup, neardup_dedup  # noqa: E402
from ua2sql_spark.operators.pack import pack_sequences  # noqa: E402
from ua2sql_spark.sources.corpus_export import write_webdataset  # noqa: E402
from ua2sql_spark.pipeline import nfc_normalize_text, quality_gate  # noqa: E402

n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

spark = get_spark("r14-pipeline-phase")
spark.sparkContext.setLogLevel("ERROR")
for df in load_tables(spark, SF_DIR).values():
    df.limit(1).count()

phases: dict[str, list[float]] = {}


def tphase(name, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    phases.setdefault(name, []).append(round(dt, 4))
    return out


for rnd in range(n_rounds):
    scratch = tempfile.mkdtemp(prefix="pipe_phase_")
    try:
        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", "text", "lang", "source"
        )
        print("docs partitions:", docs.rdd.getNumPartitions(), flush=True)
        gated = quality_gate(nfc_normalize_text(docs)).persist()
        n_gated = tphase("1_nfc_gate_persist_count", gated.count)

        exact = tphase("2_exact_dedup_plan", lambda: exact_dedup(gated, ["text"], "doc_id"))
        survivors = neardup_dedup(
            exact, id_col="doc_id", text_col="text", threshold=0.9
        ).persist()
        n_surv = tphase("3_neardup_persist_count", survivors.count)

        ntok = survivors.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
        packed = pack_sequences(ntok, "doc_id", "n_tokens", 2048)
        tphase("4_pack_distinct_count", lambda: packed.select("seq_id").distinct().count())

        tphase(
            "5_export_collect",
            lambda: write_webdataset(
                survivors.select("doc_id", "text"), os.path.join(scratch, "wds"), 16
            ).collect(),
        )
        gated.unpersist()
        survivors.unpersist()
        if rnd == 0:
            print("n_gated", n_gated, "n_surv", n_surv, flush=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

for name in sorted(phases):
    runs = phases[name]
    print(f"{name}: median={statistics.median(runs)} runs={runs}", flush=True)
spark.stop()
