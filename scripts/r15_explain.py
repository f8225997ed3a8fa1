"""Capture .explain('formatted') for headline + gated queries (r15).

Writes plans/r15/<name>_<tag>.txt. Usage:
    python scripts/r15_explain.py before [name ...]
Plans are captured lazily (no execution), so this is cheap. Run from
any checkout; set UA2SQL_PLAN_OUT to redirect the output directory
(used to emit `_before` plans from a pre-change worktree into the
main repo's plans/r15/).
"""
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2:])

from ua2sql_spark.session import get_spark  # noqa: E402
from ua2sql_spark.registry import all_queries, DRIVER_WINDOW  # noqa: E402
import bench  # noqa: E402

spark = get_spark("r15-explain")
spark.sparkContext.setLogLevel("ERROR")
specs = all_queries()
names = list(dict.fromkeys(list(bench.HEADLINE) + list(DRIVER_WINDOW)))
if only:
    # explicitly requested names are honored even when outside the
    # headline/window default set (e.g. x69/x181/x194)
    names = [n for n in dict.fromkeys(list(only)) if n in specs]
outdir = os.environ.get("UA2SQL_PLAN_OUT") or os.path.join(REPO, "plans", "r15")
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
