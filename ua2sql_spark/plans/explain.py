"""Physical-plan inspection — scale assertions as code.

`.explain("formatted")` is the feedback loop for 100 TB design: these
helpers turn "did the filter push down / did the dim broadcast / how
many shuffles" into testable predicates (tests/test_plans.py), so a
regression that, say, turns a broadcast join into a sort-merge join
fails CI rather than surfacing as a 100× slowdown on a cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    jvm = df.sparkSession._jvm
    jmode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def formatted_plan(df: DataFrame) -> str:
    return _explain(df, "formatted")


def simple_plan(df: DataFrame) -> str:
    return _explain(df, "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """One entry per scan: that scan's full PushedFilters payload.

    Deliberately LINE-scoped and unsplit: plans truncate long filter
    lists at spark.sql.maxMetadataStringLength with '...' and no
    closing bracket, so a cross-line regex would swallow unrelated
    plan text, and a naive comma split would shatter compound
    predicates like LessThan(a,10) into garbage fragments. Callers
    assert substring membership ("col" in f), which the whole-payload
    form serves exactly."""
    plan = formatted_plan(df)
    out: list[str] = []
    for line in plan.splitlines():
        m = re.search(r"PushedFilters: \[([^\]]*)", line)
        if m and m.group(1).strip():
            out.append(m.group(1).strip().rstrip("]"))
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges (shuffles) in the physical plan."""
    return len(re.findall(r"\bExchange\b(?! SinglePartition)", simple_plan(df)))


def broadcast_join_count(df: DataFrame) -> int:
    return simple_plan(df).count("BroadcastHashJoin")


def sortmerge_join_count(df: DataFrame) -> int:
    return simple_plan(df).count("SortMergeJoin")


def wholestage_codegen_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans — wider/fewer is better.
    (Only meaningful on final plans: under AQE, inspect after execution
    or with AQE disabled.)"""
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", _explain(df, "codegen"))
    if m:
        return int(m.group(1))
    return len(set(re.findall(r"\*\((\d+)\)", simple_plan(df))))


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema column lists of every scan (column-pruning check)."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (\S+)", plan)
