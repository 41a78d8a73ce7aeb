"""Physical-plan inspection helpers: assert the plans we *want* (pruned
scans, pushed filters, broadcast joins, whole-stage codegen) instead of the
first plan that happens to pass — used by tests/test_plans.py as
performance guards."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of every parquet scan in the plan (pruning check)."""
    plan = physical_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>?", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if ":" in c]
        out.append(cols)
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    plan = physical_plan(df)
    out = []
    # the toString truncates long field lists ("...") without closing the
    # bracket, so capture to end-of-line and trim
    for m in re.finditer(r"PushedFilters: \[([^\n]*)", plan):
        body = m.group(1).split("]")[0]
        if body.strip():
            out.extend(f.strip() for f in body.split(",") if f.strip())
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages (the plan toString marks
    codegen'd operators with ``*(n)``)."""
    plan = physical_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids) + plan.count("WholeStageCodegen (")


def exchange_count(df: DataFrame) -> int:
    """Number of data-moving Exchange operators (hash AND range
    partitioning) in the physical plan; broadcast and single-partition
    exchanges are excluded — those move bounded data."""
    plan = physical_plan(df)
    return (plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning"))
