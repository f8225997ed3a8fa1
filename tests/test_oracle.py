"""Differential tests: every registered query vs its DuckDB oracle.

This mirrors the driver's correctness gate (SURVEY.md §5.1) at sf0.001
so regressions surface locally before a round runs.
"""

from __future__ import annotations

import pytest

from ua2sql_spark.registry import all_queries
from tests.conftest import SF_DIR, assert_oracle_match

SPECS = all_queries()
WITH_ORACLE = [name for name, spec in SPECS.items() if spec.oracle is not None]
ROWS_ONLY = [name for name, spec in SPECS.items() if spec.oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, duck, name):
    assert_oracle_match(spark, duck, SPECS[name])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, name):
    """Non-SQL-expressible ops: plan executes and yields a stable schema."""
    df = SPECS[name].fn(spark, SF_DIR)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0


def test_contract_shapes():
    import __spark_entry__ as mod

    q = mod.queries()
    o = mod.oracle_sql()
    assert q, "queries() empty"
    assert set(o) <= set(q), "oracle_sql keys must be a subset of queries"
