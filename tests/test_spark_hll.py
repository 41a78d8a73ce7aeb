"""End-to-end Spark tests for the HLL aggregation harness (FIXTURES.md F1,
SURVEY.md §5: distribution-invariance, partition invariance, envelope vs
exact countDistinct)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from zetasketch_spark.hll import HllSketch
from zetasketch_spark.operators.agg import (
    SKETCH_COL,
    hll_count_distinct,
    sketch_agg,
    sketch_merge,
    sketch_partial,
)
from zetasketch_spark.sketches.base import HllFamily
from zetasketch_spark.sources.tables import with_day
from zetasketch_spark.sources.transcripts import load_transcripts


@pytest.fixture(scope="module")
def transcripts(spark, transcripts_path):
    df = with_day(load_transcripts(spark, transcripts_path))
    df.cache().count()
    return df


def test_schema(transcripts):
    assert [f.name for f in transcripts.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "day"]


def test_hll_by_role_within_envelope(spark, transcripts):
    """Flagship: approx distinct conv_id per role vs exact countDistinct."""
    approx = hll_count_distinct(transcripts, ["role"], "conv_id", precision=14)
    exact = transcripts.groupBy("role").agg(F.countDistinct("conv_id").alias("exact"))
    joined = {r["role"]: (r["approx_distinct"], r["exact"])
              for r in approx.join(exact, "role").collect()}
    assert set(joined) == {"user", "assistant", "tool"}
    bound = 3 * 1.04 / np.sqrt(2.0 ** 14)
    for role, (est, true) in joined.items():
        assert abs(est / true - 1) <= max(bound, 0.02), (role, est, true)


def test_rows_seen_matches_counts(spark, transcripts):
    fam = HllFamily(precision=12)
    out = sketch_agg(transcripts, ["role"], "conv_id", fam).collect()
    counts = dict(transcripts.groupBy("role").count().collect())
    for r in out:
        assert r["rows_seen"] == counts[r["role"]]


def test_partition_invariance_state_equality(spark, transcripts):
    """Same data at 2 vs 13 partitions must produce identical serialized
    sketch states (merge order/partitioning invariance at state level)."""
    fam = HllFamily(precision=13, sparse_precision=16)

    def states(df):
        partials = sketch_partial(df, ["role"], "conv_id", fam)
        merged = sketch_merge(partials, ["role"], fam)
        return {r["role"]: bytes(r[SKETCH_COL]) for r in merged.collect()}

    s2 = states(transcripts.repartition(2))
    s13 = states(transcripts.repartition(13))
    assert s2 == s13


def test_spark_state_equals_local_state(spark, transcripts):
    """Distribution invariance: the Spark-aggregated sketch state must be
    byte-identical to a single local sketch over the same values."""
    fam = HllFamily(precision=13, sparse_precision=16)
    partials = sketch_partial(transcripts, [], "conv_id", fam)
    merged = sketch_merge(partials, [], fam)
    [row] = merged.collect()
    spark_state = bytes(row[SKETCH_COL])

    local = HllSketch(precision=13, sparse_precision=16)
    vals = [r["conv_id"] for r in transcripts.select("conv_id").collect()]
    import pandas as pd

    local.add_strings(pd.Series(vals))
    assert local.serialize() == spark_state


def test_tree_merge_same_result(spark, transcripts):
    fam = HllFamily(precision=13, sparse_precision=16)
    p = sketch_partial(transcripts, ["role"], "conv_id", fam)
    flat = {r["role"]: bytes(r[SKETCH_COL]) for r in sketch_merge(p, ["role"], fam).collect()}
    tree = {r["role"]: bytes(r[SKETCH_COL])
            for r in sketch_merge(p, ["role"], fam, tree_levels=2, fan_in=4).collect()}
    assert flat == tree


def test_hll_by_role_day_rollup_property(spark, transcripts):
    """Sketches computed per (role, day) re-merge to the per-role sketch —
    compute once at fine grain, roll up by merging (SURVEY.md §2.2)."""
    fam = HllFamily(precision=12, sparse_precision=15)
    fine = sketch_agg(transcripts, ["role", "day"], "conv_id", fam, keep_sketch=True)
    coarse = sketch_agg(transcripts, ["role"], "conv_id", fam, keep_sketch=True)
    coarse_states = {r["role"]: bytes(r[SKETCH_COL]) for r in coarse.collect()}
    rolled = {}
    for r in fine.collect():
        sk = fam.deserialize(bytes(r[SKETCH_COL]))
        if r["role"] in rolled:
            rolled[r["role"]] = fam.merge(rolled[r["role"]], sk)
        else:
            rolled[r["role"]] = sk
    for role, sk in rolled.items():
        assert fam.serialize(sk) == coarse_states[role]


def test_int_column_hll(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") % 1000).alias("v"))
    out = hll_count_distinct(df, ["g"], "v", precision=14)
    # every group sees all 1000 residues (CRT over 10000 > lcm(7,1000) ids)
    for r in out.collect():
        assert abs(r["approx_distinct"] / 1000 - 1) <= 3 * 1.04 / np.sqrt(2.0 ** 14)
