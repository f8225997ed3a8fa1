"""Shared fixtures: one SparkSession per test run, DuckDB oracle helper."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def _ensure_protobuf() -> None:
    """Spark 4's transformWithStateInPandas needs `google.protobuf` at
    runtime (its Python state-server protocol). This container has no
    installed protobuf, so a pure-Python runtime is VENDORED under
    tests/_vendor/ (BSD-licensed Google code, 6.32 pure-python tier;
    see tests/_vendor/README.md) — APPEND it to sys.path (installed
    packages always win) and export via PYTHONPATH so Spark's Python
    workers inherit it. The vendored runtime trails pyspark's gencode
    (6.33) by one wire-compatible minor, so protobuf's own documented
    escape hatch (TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK) is set
    alongside. No-op wherever protobuf is properly provisioned."""
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    vendored = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor")
    if not os.path.isdir(os.path.join(vendored, "google", "protobuf")):
        return  # stay skipped via importorskip
    sys.path.append(vendored)
    existing = os.environ.get("PYTHONPATH")
    os.environ["PYTHONPATH"] = (
        f"{existing}{os.pathsep}{vendored}" if existing else vendored
    )
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")


_ensure_protobuf()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from ua2sql_spark.session import get_spark

    spark = get_spark("ua2sql_spark-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form mirroring the driver's order-insensitive compare:
    columns sorted by name, dtypes widened, rows sorted by stringified value."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = s.astype("datetime64[ns]")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        else:
            df[c] = s.astype("string")
    if len(df) == 0:
        return df.reset_index(drop=True)
    key = df.astype("string").fillna("\x00NULL").agg("\x1f".join, axis=1)
    df = df.iloc[key.argsort(kind="stable").values].reset_index(drop=True)
    return df


def assert_oracle_match(spark, duck, spec, sf_dir: str = SF_DIR) -> None:
    """Run a QuerySpec on Spark and its oracle on DuckDB; compare."""
    sdf = spec.fn(spark, sf_dir)
    spark_pd = sdf.toPandas()
    duck_pd = duck.execute(spec.oracle).fetchdf()

    assert len(spark_pd) == len(duck_pd), (
        f"{spec.name}: row count {len(spark_pd)} (spark) != {len(duck_pd)} (duckdb)"
    )
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns), (
        f"{spec.name}: columns {sorted(spark_pd.columns)} != {sorted(duck_pd.columns)}"
    )
    a = normalize(spark_pd)
    b = normalize(duck_pd)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9, atol=1e-9)
    except AssertionError as exc:
        raise AssertionError(f"{spec.name}: value mismatch\n{exc}") from exc
