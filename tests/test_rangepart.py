"""Sketch-driven balanced range repartitioning (operators/rangepart.py):
rank-error-bounded balance on skewed data, hot-key salting across
equal-boundary runs, order preservation, determinism, and row equality."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from zetasketch_spark.operators.rangepart import (
    BUCKET_COL,
    assign_range_buckets,
    balance_report,
    boundaries_from_sketch,
    kll_boundaries,
    repartition_by_sketch_range,
)
from zetasketch_spark.sketches.kll import KllSketch

N = 40_000
N_PARTS = 16


@pytest.fixture(scope="module")
def skewed(spark):
    """Zipf-ish positive longs: a long tail plus mass near zero."""
    df = (spark.range(N)
          .withColumn("v", (F.pow(F.lit(1.00045), F.col("id") % 20000)
                            * 7).cast("double"))
          .withColumn("payload", F.concat(F.lit("p"), F.col("id"))))
    return df.cache()


def test_balanced_buckets_on_skewed_data(spark, skewed):
    rep = balance_report(skewed, "v", N_PARTS)
    assert rep["n_rows"] == N
    assert rep["buckets_used"] == N_PARTS
    # KLL rank error ~1.5% at k=200 -> every bucket within 1/n ± 2eps;
    # allow 1.35x ideal (ideal share 6.25%, bound ~9.25%)
    assert rep["max_over_ideal"] <= 1.35
    assert len(rep["boundaries"]) == N_PARTS - 1


def test_hot_key_salts_across_boundary_run(spark):
    """One value holding 60% of rows spans many quantile boundaries;
    with salt_cols it spreads across that run's buckets, without it
    stays in one bucket (range semantics)."""
    hot = (spark.range(N)
           .withColumn("v", F.when(F.col("id") % 5 < 3, F.lit(42.0))
                       .otherwise((F.col("id") % 1000).cast("double"))))
    b = kll_boundaries(hot, "v", N_PARTS)
    assert sum(1 for x in b if x == 42.0) >= 2  # the run exists

    unsalted = assign_range_buckets(hot, "v", b)
    one = (unsalted.filter(F.col("v") == 42.0)
           .select(BUCKET_COL).distinct().count())
    assert one == 1

    salted = assign_range_buckets(hot, "v", b, salt_cols=["id"])
    spread = (salted.filter(F.col("v") == 42.0)
              .select(BUCKET_COL).distinct().count())
    assert spread >= 3  # hot rows split across the whole run
    rep_counts = {int(r[BUCKET_COL]): int(r["c"]) for r in
                  salted.groupBy(BUCKET_COL)
                  .agg(F.count(F.lit(1)).alias("c")).collect()}
    assert max(rep_counts.values()) <= 1.5 * (N / N_PARTS)


def test_bucket_monotone_and_null_handling(spark):
    df = spark.createDataFrame(
        [(float(x),) for x in range(100)] + [(None,)], "v double")
    b = [24.5, 49.5, 74.5]
    got = assign_range_buckets(df, "v", b).collect()
    for r in got:
        if r["v"] is None:
            assert r[BUCKET_COL] == 0
        else:
            assert r[BUCKET_COL] == sum(1 for x in b if x < r["v"])


def test_repartition_preserves_rows_and_ranges(spark, skewed):
    out = repartition_by_sketch_range(skewed, "v", N_PARTS,
                                      keep_bucket=True)
    assert out.count() == N
    assert sorted(r["id"] for r in out.select("id").collect()) == list(
        range(N))
    # bucket i's values never exceed bucket j>i's minimum (range law)
    stats = (out.groupBy(BUCKET_COL)
             .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
             .orderBy(BUCKET_COL).collect())
    for a, b2 in zip(stats, stats[1:]):
        assert a["hi"] <= b2["lo"]
    # PHYSICAL placement: the slot-token exchange puts bucket i exactly
    # in partition i, so task sizes are rank-balanced too
    sizes = out.rdd.glom().map(len).collect()
    assert len(sizes) == N_PARTS and min(sizes) > 0
    assert max(sizes) <= 1.35 * (N / N_PARTS)
    # one bucket per partition (no coalesced buckets)
    per_part = (out.select(BUCKET_COL).rdd
                .glom().map(lambda rows: len({r[0] for r in rows}))
                .collect())
    assert all(n == 1 for n in per_part)


def test_assignment_deterministic(spark, skewed):
    b = kll_boundaries(skewed, "v", N_PARTS)
    a1 = assign_range_buckets(skewed, "v", b, salt_cols=["id"])
    a2 = assign_range_buckets(skewed.repartition(7), "v", b,
                              salt_cols=["id"])
    j = (a1.select("id", F.col(BUCKET_COL).alias("b1"))
         .join(a2.select("id", F.col(BUCKET_COL).alias("b2")), "id"))
    assert j.filter(F.col("b1") != F.col("b2")).count() == 0


def test_boundaries_from_existing_sketch_and_edges(spark):
    sk = KllSketch(k=200)
    sk.add_series(np.arange(10_000, dtype=np.float64))
    b = boundaries_from_sketch(sk, 4)
    assert len(b) == 3 and b == sorted(b)
    assert abs(b[1] - 5000) <= 300  # median within rank error
    assert boundaries_from_sketch(sk, 1) == []
    assert boundaries_from_sketch(KllSketch(), 8) == []
    with pytest.raises(ValueError):
        boundaries_from_sketch(sk, 0)
