"""Capture .explain('formatted') for every headline + gated query.

Writes plans/r14/<name>_<tag>.txt. Usage:
    python scripts_r14_explain.py before [name ...]
Plans are captured lazily (no execution), so this is cheap.
"""
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2:])

from ua2sql_spark.session import get_spark  # noqa: E402
from ua2sql_spark.registry import all_queries, DRIVER_WINDOW  # noqa: E402
import bench  # noqa: E402

spark = get_spark("r14-explain")
spark.sparkContext.setLogLevel("ERROR")
specs = all_queries()
names = list(dict.fromkeys(list(bench.HEADLINE) + list(DRIVER_WINDOW)))
if only:
    names = [n for n in names if n in only]
outdir = os.path.join(REPO, "plans", "r14")
os.makedirs(outdir, exist_ok=True)
for n in names:
    try:
        df = specs[n].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{n}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print("ok", n)
    except Exception as e:  # noqa: BLE001
        print("ERR", n, repr(e))
spark.stop()
