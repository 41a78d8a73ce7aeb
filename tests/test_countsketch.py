"""CountSketch / AMS signed-counter family: published guarantees
(unbiased point estimates, F2 second moment, unbiased inner product),
byte-level merge determinism, serde hardening, and the Spark fabrics.

The guarantee tests run with FIXED seeds — CountSketch hashing is a
pure function of (data, seed), so each assertion is deterministic; the
probabilistic claims themselves (unbiasedness across instances) are
pinned by averaging over many seeds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zetasketch_spark.sketches.countsketch import CountSketch, CountSketchFamily


def _zipf_series(n_keys: int = 200, scale: float = 5000.0) -> pd.Series:
    reps = (scale / (np.arange(n_keys) + 1)).astype(int) + 1
    return pd.Series(np.repeat([f"k{i}" for i in range(n_keys)], reps))


def test_point_estimates_within_bound_and_absent_keys_near_zero():
    """|est - exact| <= 3*sqrt(F2/width) for every present key (the
    Chebyshev row bound, amplified by the 5-row median), and keys never
    added estimate within the same bound of zero."""
    s = _zipf_series()
    exact = s.value_counts()
    f2 = float((exact.to_numpy(dtype=np.float64) ** 2).sum())
    cs = CountSketch(width=2048, depth=5)
    cs.add_series(s)

    bound = 3.0 * np.sqrt(f2 / 2048)
    est = cs.point_query_series(pd.Series(exact.index))
    assert np.abs(est - exact.to_numpy()).max() <= bound

    absent = cs.point_query_series(pd.Series([f"never{i}" for i in range(50)]))
    assert np.abs(absent).max() <= bound


def test_unbiased_across_seeds_where_cm_always_over():
    """The design claim: CountSketch point errors straddle zero with
    seed-mean ~0, while Count-Min (same data, same width budget) never
    undercounts — the bias CS exists to remove."""
    from zetasketch_spark.sketches.countmin import CountMinSketch

    s = _zipf_series(n_keys=100, scale=2000.0)
    exact = s.value_counts()
    key, true = "k0", int(exact["k0"])

    errs = []
    for seed in range(60):
        cs = CountSketch(width=256, depth=1, seed=seed)
        cs.add_series(s)
        errs.append(int(cs.point_query_series(pd.Series([key]))[0]) - true)
    errs = np.asarray(errs, dtype=np.float64)
    assert (errs > 0).any() and (errs < 0).any()
    # mean within 4 standard errors of zero (deterministic: fixed seeds)
    assert abs(errs.mean()) <= 4.0 * errs.std() / np.sqrt(len(errs))

    cm = CountMinSketch(width=256, depth=1, max_candidates=8)
    cm.add_series(s)
    cm_est = cm.point_query_series(pd.Series(exact.index))
    assert (cm_est >= exact.to_numpy()).all()


@pytest.mark.parametrize("dist", ["zipf", "uniform", "one_hot_key"])
def test_f2_estimate_within_relative_bound(dist):
    """AMS: median-of-rows sum-of-squares is within 4*sqrt(2/width)
    relative error of the exact second moment."""
    if dist == "zipf":
        s = _zipf_series()
    elif dist == "uniform":
        s = pd.Series([f"u{i % 500}" for i in range(20_000)])
    else:
        s = pd.Series(["hot"] * 5000 + [f"u{i}" for i in range(5000)])
    exact_f2 = float((s.value_counts().to_numpy(dtype=np.float64) ** 2).sum())
    cs = CountSketch(width=4096, depth=5)
    cs.add_series(s)
    assert abs(cs.f2_estimate() / exact_f2 - 1.0) <= 4.0 * np.sqrt(2.0 / 4096)


def test_inner_product_estimates_join_size_with_multiplicity():
    """<CS(a), CS(b)> estimates sum_x f_x*g_x within 4 row standard
    deviations (4*sqrt(2*F2a*F2b/width)); disjoint key sets estimate
    within the same bound of zero."""
    rng = np.random.default_rng(7)
    a = pd.Series(np.repeat(np.arange(100), rng.integers(1, 20, 100))).astype(str)
    b = pd.Series(np.repeat(np.arange(50, 150),
                            rng.integers(1, 20, 100))).astype(str)
    fa, fb = a.value_counts(), b.value_counts()
    exact = int((fa * fb).dropna().sum())

    ca = CountSketch(width=4096, depth=5)
    ca.add_series(a)
    cb = CountSketch(width=4096, depth=5)
    cb.add_series(b)
    f2a = float((fa.to_numpy(dtype=np.float64) ** 2).sum())
    f2b = float((fb.to_numpy(dtype=np.float64) ** 2).sum())
    bound = 4.0 * np.sqrt(2.0 * f2a * f2b / 4096)
    assert abs(ca.inner_product(cb) - exact) <= bound

    disj = CountSketch(width=4096, depth=5)
    disj.add_series(pd.Series([f"z{i}" for i in range(1000)]))
    assert abs(ca.inner_product(disj)) <= bound


def test_byte_equality_across_partitionings_and_merge_orders():
    """Counters are pure addition and the wire layout is canonical, so
    ANY partitioning / merge order serializes byte-identically to the
    single-pass build (the DDSketch-class determinism guarantee)."""
    s = _zipf_series()
    whole = CountSketch(width=1024, depth=5)
    whole.add_series(s)
    want = whole.serialize()

    shuffled = s.sample(frac=1.0, random_state=3).to_numpy()
    for n_parts, order in ((3, [2, 0, 1]), (7, [6, 3, 0, 5, 1, 4, 2])):
        parts = []
        for chunk in np.array_split(shuffled, n_parts):
            c = CountSketch(width=1024, depth=5)
            c.add_series(pd.Series(chunk))
            parts.append(c)
        acc = parts[order[0]]
        for i in order[1:]:
            acc.merge(parts[i])
        assert acc.serialize() == want


def test_dtype_canonicalization_one_domain():
    """int64 adds, float64-promoted adds, and string point queries all
    address the same counter cells (shared canon_key_series rendering —
    the Arrow nullable-int promotion must not fork the domain)."""
    cs = CountSketch(width=512, depth=5)
    cs.add_series(pd.Series([7, 7, 8], dtype="int64"))
    cs.add_series(pd.Series([7.0, None], dtype="float64"))
    est = cs.point_query_series(pd.Series(["7", "8"]))
    assert list(est) == [3, 1]
    assert cs.total == 4


def test_serde_roundtrip_empty_params_and_lying_headers():
    s = _zipf_series(n_keys=30, scale=100.0)
    cs = CountSketch(width=256, depth=3, seed=9)
    cs.add_series(s)
    blob = cs.serialize()
    rt = CountSketch.deserialize(blob)
    assert rt.serialize() == blob
    assert (rt.width, rt.depth, rt.seed, rt.total) == (256, 3, 9, cs.total)

    empty = CountSketch(width=64, depth=2)
    assert CountSketch.deserialize(empty.serialize()).serialize() \
        == empty.serialize()

    with pytest.raises(ValueError):
        CountSketch(width=0)
    with pytest.raises(ValueError):
        CountSketch(depth=0)
    with pytest.raises(ValueError):
        CountSketch(depth=65)

    other = CountSketch(width=256, depth=3, seed=10)
    with pytest.raises(ValueError):
        cs.merge(other)
    with pytest.raises(ValueError):
        cs.inner_product(other)

    # a lying width field must raise, not size an allocation from it
    import struct

    bad = bytearray(blob)
    struct.pack_into("<i", bad, 5, 1 << 30)
    with pytest.raises(ValueError):
        CountSketch.deserialize(bytes(bad))
    with pytest.raises(ValueError):
        CountSketch.deserialize(blob[: len(blob) - 8])


def test_hypothesis_merge_equals_single_pass():
    """Law: for ANY string list and ANY split point, merge(build(l),
    build(r)) serializes byte-identically to build(l + r)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.text(max_size=8), max_size=120), st.data())
    def law(xs, data):
        cut = data.draw(st.integers(0, len(xs)))
        whole = CountSketch(width=128, depth=3)
        whole.add_series(pd.Series(xs, dtype="object"))
        a = CountSketch(width=128, depth=3)
        a.add_series(pd.Series(xs[:cut], dtype="object"))
        b = CountSketch(width=128, depth=3)
        b.add_series(pd.Series(xs[cut:], dtype="object"))
        a.merge(b)
        assert a.serialize() == whole.serialize()

    law()


def test_sketch_agg_pipeline_matches_direct(spark):
    """DataFrame pipeline (partial -> merge over 8 partitions) produces
    the byte-identical state of a direct single-pass build per group,
    and the surfaced result is (f2_est, n)."""
    from zetasketch_spark.operators.agg import sketch_agg

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 20_000),
        "k": rng.zipf(1.3, 20_000).astype(str),
    })
    fam = CountSketchFamily(width=1024, depth=5)
    df = spark.createDataFrame(pdf).repartition(8)
    got = {r["g"]: (bytes(r["sketch"]), r["f2_est"], r["n"])
           for r in sketch_agg(df, ["g"], "k", fam, keep_sketch=True).collect()}
    for g, sub in pdf.groupby("g"):
        direct = fam.make()
        fam.update(direct, sub["k"])
        assert got[g][0] == fam.serialize(direct), f"group {g} state differs"
        exact_f2 = float((sub["k"].value_counts()
                          .to_numpy(dtype=np.float64) ** 2).sum())
        assert abs(got[g][1] / exact_f2 - 1.0) <= 4.0 * np.sqrt(2.0 / 1024)
        assert got[g][2] == len(sub)


def test_sql_surface_init_merge_point_f2_inner(spark):
    """cs_init_agg / cs_merge_agg / cs_point_est / cs_f2 /
    cs_inner_product from spark.sql, partial -> merge shape."""
    from zetasketch_spark.functions.sketch_udfs import register_sql

    register_sql(spark)
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({"shard": np.arange(20_000) % 16,
                        "k": rng.zipf(1.5, 20_000).astype(str)})
    spark.createDataFrame(pdf).createOrReplaceTempView("cs_vals")
    [row] = spark.sql("""
        WITH partials AS (
          SELECT shard, cs_init_agg(k, 2048, 5) AS sk
          FROM cs_vals GROUP BY shard),
        merged AS (SELECT cs_merge_agg(sk) AS sk FROM partials)
        SELECT cs_point_est(sk, '1') AS est_1, cs_f2(sk) AS f2,
               cs_inner_product(sk, sk) AS self_ip
        FROM merged
    """).collect()
    counts = pdf["k"].value_counts()
    exact_1 = int(counts["1"])
    exact_f2 = float((counts.to_numpy(dtype=np.float64) ** 2).sum())
    bound = 3.0 * np.sqrt(exact_f2 / 2048)
    assert abs(row["est_1"] - exact_1) <= bound
    assert abs(row["f2"] / exact_f2 - 1.0) <= 4.0 * np.sqrt(2.0 / 2048)
    # a sketch's inner product with itself is its F2 row medians' cousin:
    # within the same relative band of exact F2
    assert abs(row["self_ip"] / exact_f2 - 1.0) <= 4.0 * np.sqrt(2.0 / 2048)


def test_cs_join_size_operator_vs_exact(spark):
    """cs_join_size_estimate (shuffle-free partials per side, driver
    merge) lands within 4 estimated row-stds of the exact join size."""
    from zetasketch_spark.operators.joinprofile import cs_join_size_estimate

    rng = np.random.default_rng(13)
    a = pd.DataFrame({"ka": np.repeat(np.arange(300),
                                      rng.integers(1, 8, 300))})
    b = pd.DataFrame({"kb": np.repeat(np.arange(150, 450),
                                      rng.integers(1, 8, 300))})
    exact = int((a["ka"].value_counts() * b["kb"].value_counts())
                .dropna().sum())
    [row] = cs_join_size_estimate(
        spark.createDataFrame(a).repartition(4), "ka",
        spark.createDataFrame(b).repartition(4), "kb",
        width=4096, depth=5).collect()
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["cs_est_join_size"] - exact) <= 4 * row["std_bound"]


def test_weighted_add_byte_equals_repetition():
    """add_weighted_series(k, w) serializes BYTE-identically to adding k
    w times — signed counters have no candidate-ordering caveat, so the
    weighted path inherits every determinism guarantee; null/zero/
    negative-weight rows drop."""
    a = CountSketch(width=256, depth=5)
    a.add_weighted_series(pd.Series(["x", "y", None, "z", "x"]),
                          pd.Series([3, 5, 9, 0, 4], dtype="object"))
    b = CountSketch(width=256, depth=5)
    b.add_series(pd.Series(["x"] * 7 + ["y"] * 5))
    assert a.serialize() == b.serialize()
    assert a.total == 12


def test_cs_join_size_partitioning_invariant_with_tree_fold(spark):
    """_global_sketch's bounded fan-in: 100-partition inputs (past
    fan_in=64, taking the salted executor-side tree) produce the same
    estimate as 4-partition inputs — CountSketch states are pure
    addition, so the global state is partitioning-invariant."""
    from zetasketch_spark.operators.joinprofile import cs_join_size_estimate

    a = pd.DataFrame({"ka": np.repeat(np.arange(200), 3)})
    b = pd.DataFrame({"kb": np.repeat(np.arange(100, 300), 2)})
    few = cs_join_size_estimate(
        spark.createDataFrame(a).repartition(4), "ka",
        spark.createDataFrame(b).repartition(4), "kb",
        width=1024, depth=5).collect()[0]
    many = cs_join_size_estimate(
        spark.createDataFrame(a).repartition(100), "ka",
        spark.createDataFrame(b).repartition(100), "kb",
        width=1024, depth=5).collect()[0]
    assert tuple(few) == tuple(many)
    exact = 100 * 3 * 2
    assert abs(few["cs_est_join_size"] - exact) <= 4 * few["std_bound"]


def test_join_key_profile_partitioning_invariant_past_fan_in(spark):
    """join_key_profile's theta collects take the same bounded-fan-in
    route: 100-partition inputs produce the identical profile as
    4-partition inputs (theta merge keeps the k smallest hashes — a
    pure function of the input set, any merge shape)."""
    from zetasketch_spark.operators.joinprofile import join_key_profile

    a = pd.DataFrame({"ka": np.arange(3000) % 800})
    b = pd.DataFrame({"kb": (np.arange(2000) % 600) + 400})
    few = join_key_profile(
        spark.createDataFrame(a).repartition(4), "ka",
        spark.createDataFrame(b).repartition(4), "kb", k=1024).collect()[0]
    many = join_key_profile(
        spark.createDataFrame(a).repartition(100), "ka",
        spark.createDataFrame(b).repartition(100), "kb", k=1024).collect()[0]
    assert tuple(few) == tuple(many)
    assert abs(few["overlap"] / 400 - 1) <= 4 * few["rse"] + 0.05
