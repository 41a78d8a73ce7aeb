"""Bloom semi-join prefilter (operators/bloomjoin.py): the zero-false-
negative invariant — bloom_join == plain join, row for row — plus
prefilter effectiveness (FPR-bounded pass-through), typed-key-domain
guards, null keys, and the outer-join rejection."""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from zetasketch_spark.operators.bloomjoin import (
    bloom_join,
    bloom_prefilter,
    build_key_bloom,
)

N_BIG = 60_000
N_KEYS = 800  # selective: ~1.3% of big-side keys match


@pytest.fixture(scope="module")
def sides(spark):
    """(big, small): big fact rows keyed 0..N_BIG*3 sparsely, small key
    side holding every 229th key — a selective equi-join."""
    big = (spark.range(N_BIG)
           .withColumn("k", (F.col("id") * 3) % (N_BIG * 3))
           .withColumn("payload", F.concat(F.lit("row"), F.col("id")))
           .select("id", "k", "payload"))
    small = (spark.range(N_KEYS)
             .withColumn("k2", (F.col("id") * 229 * 3) % (N_BIG * 3))
             .withColumn("tag", F.concat(F.lit("t"), F.col("id")))
             .select("k2", "tag").distinct())
    return big.cache(), small.cache()


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_bloom_join_equals_plain_join(spark, sides):
    big, small = sides
    joined, meta = bloom_join(big, small, "k", "k2", fpr=0.01)
    plain = big.join(small, on=big["k"] == small["k2"], how="inner")
    cols = ["id", "k", "k2", "tag"]
    assert _sorted_rows(joined, cols) == _sorted_rows(plain, cols)
    assert meta["digest_bytes"] >= 16 and meta["k_hashes"] >= 1


def test_prefilter_zero_false_negatives_and_bounded_pass(spark, sides):
    big, small = sides
    blob, meta = build_key_bloom(small, "k2", fpr=0.01)
    kept = bloom_prefilter(big, "k", blob)
    matched = big.join(small, on=big["k"] == small["k2"], how="left_semi")
    n_match, n_kept = matched.count(), kept.count()
    # every matching row survives (zero FN) ...
    assert n_kept >= n_match
    assert matched.join(kept, on="id", how="left_anti").count() == 0
    # ... and false positives are rate-bounded: allow 5x the target on
    # ~N_BIG Bernoulli trials (far above any plausible fluctuation)
    assert n_kept - n_match <= max(64, int(5 * 0.01 * N_BIG))
    assert n_kept < N_BIG  # it actually filtered


def test_semi_join_and_string_keys(spark, sides):
    big, small = sides
    bs = big.withColumn("ks", F.col("k").cast("string")).drop("k")
    ss = small.withColumn("ks2", F.col("k2").cast("string")).drop("k2")
    joined, _ = bloom_join(bs, ss, "ks", "ks2", how="left_semi", fpr=0.005)
    plain = bs.join(ss, on=bs["ks"] == ss["ks2"], how="left_semi")
    assert _sorted_rows(joined, ["id", "ks"]) == _sorted_rows(
        plain, ["id", "ks"])


def test_null_keys_and_nullable_long_domain(spark, sides):
    """NULL big-side keys drop (as the inner join drops them), and the
    null-containing probe batches still hash the LONG domain (Arrow's
    float64 promotion must not fork recipes -> no false negatives)."""
    big, small = sides
    bn = big.withColumn(
        "k", F.when(F.col("id") % 13 == 0, None).otherwise(F.col("k")))
    joined, _ = bloom_join(bn, small, "k", "k2", fpr=0.01)
    plain = bn.join(small, on=bn["k"] == small["k2"], how="inner")
    cols = ["id", "k", "k2"]
    assert _sorted_rows(joined, cols) == _sorted_rows(plain, cols)


def test_type_mismatch_and_outer_join_rejected(spark, sides):
    big, small = sides
    with pytest.raises(TypeError, match="hash\\s+domain|types differ"):
        bloom_join(big, small.withColumn("k2", F.col("k2").cast("int")),
                   "k", "k2")
    for how in ("left", "left_outer", "right", "full", "full_outer"):
        with pytest.raises(ValueError, match="prefilter"):
            bloom_join(big, small, "k", "k2", how=how)


def test_empty_key_side_keeps_nothing(spark, sides):
    big, small = sides
    blob, _ = build_key_bloom(small.filter(F.lit(False)), "k2")
    assert bloom_prefilter(big, "k", blob).count() == 0
