"""Plan-quality guards: column pruning reaches the scan, predicates push
down, small dims broadcast, sketch partials never read unused columns.
These protect the 100 TB story — a scan that reads all columns for a
2-column projection is a regression even if results stay correct."""

from __future__ import annotations

import pytest

from zetasketch_spark.plans.explain import (
    codegen_stage_count,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
    read_schema_columns,
)

SF_DIR = "/root/testdata/sf0.001"


def test_sketch_partial_prunes_scan(spark, transcripts_path):
    """The partial stage must read only keys + value column — never text."""
    from zetasketch_spark.operators.agg import sketch_partial
    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sources.tables import with_day
    from zetasketch_spark.sources.transcripts import load_transcripts

    df = with_day(load_transcripts(spark, transcripts_path))
    p = sketch_partial(df, ["role", "day"], "conv_id", HllFamily(precision=12))
    scans = read_schema_columns(p)
    assert scans, "expected a parquet scan in the plan"
    for cols in scans:
        assert "text" not in cols and "tool" not in cols, cols
        assert set(cols) <= {"conv_id", "role", "ts"}


def test_filter_pushdown_reaches_scan(spark):
    import __spark_entry__ as entry

    df = entry.q_revenue_filter(spark, SF_DIR)
    pf = pushed_filters(df)
    assert any("l_quantity" in f for f in pf), pf
    assert any("l_shipdate" in f for f in pf), pf
    scans = read_schema_columns(df)
    # Q6 projection: only the four referenced columns are read
    for cols in scans:
        assert set(cols) <= {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_small_dim_joins_broadcast(spark):
    import __spark_entry__ as entry

    assert has_broadcast_join(entry.q_top_customers(spark, SF_DIR))
    assert has_broadcast_join(entry.q_region_customer_counts(spark, SF_DIR))


def test_text_queries_stay_in_codegen(spark):
    """Quality features are pure expressions — they must compile into
    whole-stage codegen, not fall out to python."""
    import __spark_entry__ as entry

    df = entry.q_docs_quality(spark, SF_DIR)
    plan = physical_plan(df)
    assert codegen_stage_count(df) >= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ann_bruteforce_is_jvm_side(spark):
    """Cosine scoring must not use python UDFs (aggregate/zip_with exprs)."""
    import __spark_entry__ as entry

    plan = physical_plan(entry.q_ann_cosine_topk(spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
