"""DDSketch (Masson et al., VLDB 2019): the published relative-error
guarantee — every quantile estimate within alpha of the true order
statistic — plus the property that distinguishes it from KLL/t-digest:
bucket counts are pure addition, so states are BYTE-identical across any
partitioning / merge order, not just semantically close."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zetasketch_spark.sketches.ddsketch import DDSketch, DDSketchFamily

QS = (0.0, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999, 1.0)


def _rel_err(est: float, exact: float) -> float:
    if exact == 0.0:
        return abs(est)
    return abs(est - exact) / abs(exact)


def _exact_order_stats(vals: np.ndarray, qs) -> list[float]:
    sv = np.sort(vals)
    return [float(sv[int(q * (len(sv) - 1))]) for q in qs]


@pytest.mark.parametrize("dist", ["lognormal", "uniform", "mixed_sign"])
def test_relative_error_guarantee(dist):
    """All quantiles within alpha relative error of the exact order
    statistic (the paper's Theorem 1), including negative values and an
    exact zero spike."""
    rng = np.random.default_rng(42)
    if dist == "lognormal":
        vals = rng.lognormal(3, 2, 100_000)
    elif dist == "uniform":
        vals = rng.uniform(1e-6, 1e6, 100_000)
    else:
        vals = np.concatenate([
            -rng.lognormal(2, 1.5, 40_000),
            np.zeros(5_000),
            rng.lognormal(2, 1.5, 55_000)])
        rng.shuffle(vals)
    alpha = 0.01
    sk = DDSketch(alpha=alpha)
    sk.add_array(vals)
    exact = _exact_order_stats(vals, QS)
    for q, x in zip(QS, exact):
        est = sk.quantile(q)
        # 1e-9 absolute slack covers the zero bucket; the 1.0001 factor
        # covers ~1 ulp of log() in bucket-boundary assignment
        assert _rel_err(est, x) <= alpha * 1.0001 + 1e-9, (q, est, x)


def test_byte_equality_across_partitionings_and_merge_orders():
    """No randomness, no compaction schedule: ANY split of the input,
    merged in ANY order, serializes to the identical bytes as a single
    pass — stronger than the KLL/t-digest semantic-equality contract."""
    rng = np.random.default_rng(7)
    vals = np.concatenate([rng.lognormal(3, 2, 30_000),
                           -rng.lognormal(1, 1, 10_000),
                           np.zeros(100)])
    rng.shuffle(vals)
    one = DDSketch(0.02)
    one.add_array(vals)
    want = one.serialize()

    for splits in (2, 3, 7):
        parts = []
        for chunk in np.array_split(vals, splits):
            sk = DDSketch(0.02)
            sk.add_array(chunk)
            parts.append(sk)
        # left fold
        left = DDSketch(0.02)
        for p in parts:
            left.merge(DDSketch.deserialize(p.serialize()))
        assert left.serialize() == want
        # right fold (different association)
        right = parts[-1]
        for p in reversed(parts[:-1]):
            p.merge(right)
            right = p
        assert right.serialize() == want


def test_serde_roundtrip_and_empty():
    sk = DDSketch(0.01)
    rt = DDSketch.deserialize(sk.serialize())
    assert rt.n == 0 and np.isnan(rt.quantile(0.5))
    sk.add_array(np.array([1.0, -2.0, 0.0, 3e8]))
    rt = DDSketch.deserialize(sk.serialize())
    assert rt.serialize() == sk.serialize()
    assert rt.quantiles(list(QS)) == sk.quantiles(list(QS))
    assert (rt.n, rt.zero_count) == (4, 1)


def test_nan_null_dropped_nonfinite_raises_param_mismatch_raises():
    sk = DDSketch(0.01)
    sk.add_series(pd.Series([1.0, None, float("nan"), 2.0]))
    assert sk.n == 2  # null + NaN dropped, SQL aggregate semantics
    with pytest.raises(ValueError, match="non-finite"):
        sk.add_array(np.array([1.0, np.inf]))
    with pytest.raises(ValueError, match="cannot merge"):
        sk.merge(DDSketch(0.02))
    with pytest.raises(ValueError, match="alpha"):
        DDSketch(alpha=1.5)


def test_collapse_bounds_memory_and_keeps_top_quantiles():
    """The collapsing variant: bucket count stays <= max_buckets; the
    guarantee survives for quantiles whose rank lands in non-collapsed
    buckets (the high-quantile latency design point), and is honestly
    lost below the collapse boundary."""
    rng = np.random.default_rng(3)
    # ~9 decades of dynamic range -> ~1040 buckets at alpha=0.01 uncollapsed
    vals = 10.0 ** rng.uniform(-3, 6, 200_000)
    full = DDSketch(0.01, max_buckets=0)  # 0 = unbounded
    full.add_array(vals)
    n_full = len(full.pos)
    capped = DDSketch(0.01, max_buckets=900)
    for chunk in np.array_split(vals, 10):
        capped.add_array(chunk)
    assert n_full > 900 >= len(capped.pos)
    exact = _exact_order_stats(vals, (0.5, 0.9, 0.99, 1.0))
    for q, x in zip((0.5, 0.9, 0.99, 1.0), exact):
        # data is log-uniform: collapsing the lowest ~15% of buckets
        # affects ranks below ~q0.15 only
        assert _rel_err(capped.quantile(q), x) <= 0.01 * 1.0001


def test_collapse_negative_store_keeps_top_quantiles():
    """Mirror of the positive collapse contract for NEGATIVE data: the
    neg store must fold its largest-|v| buckets (the most negative
    values = the LOWEST global quantiles), so p90/p99 of an all-negative
    metric keep the alpha guarantee after collapse. Folding the same end
    as the positive store silently destroyed them (measured rel err 11x
    at alpha=0.01 before the fix)."""
    rng = np.random.default_rng(3)
    vals = -(10.0 ** rng.uniform(-3, 6, 200_000))
    capped = DDSketch(0.01, max_buckets=900)
    for chunk in np.array_split(vals, 10):
        capped.add_array(chunk)
    assert len(capped.neg) <= 900
    exact = _exact_order_stats(vals, (0.5, 0.9, 0.99, 1.0))
    for q, x in zip((0.5, 0.9, 0.99, 1.0), exact):
        assert _rel_err(capped.quantile(q), x) <= 0.01 * 1.0001, (q, x)


def test_quantile_labels_tail_configs_and_duplicates():
    """(0.99, 0.999, 0.9999) — the DDSketch tail design point — must get
    distinct result fields (the old round(q*100) formula collapsed all
    of them to 'q100'); genuinely colliding configs fail loudly."""
    from zetasketch_spark.sketches.base import quantile_label

    fam = DDSketchFamily(quantiles=(0.99, 0.999, 0.9999))
    assert [n for n, _ in fam.result_fields] == ["q99", "q999", "q9999", "n"]
    assert quantile_label(0.5) == "q50"
    assert quantile_label(0.1) == "q10"
    assert quantile_label(0.01) == "q01"
    assert quantile_label(0.0) == "q00"
    assert quantile_label(1.0) == "q100"
    assert quantile_label(0.25) == "q25"
    with pytest.raises(ValueError, match="duplicate result fields"):
        DDSketchFamily(quantiles=(0.5, 0.5))


def test_extreme_double_range_clamps_instead_of_overflowing():
    """Finite values near DBL_MAX and denormals are legal inputs: the
    bucket midpoint computation must not raise OverflowError (float **
    does), and the quantile must clamp into the observed [min, max] so
    the estimate stays finite and within alpha at the extremes."""
    big = 1.79e308
    sk = DDSketch(0.01)
    sk.add_array(np.array([big, big / 2]))
    q = sk.quantile(1.0)
    assert np.isfinite(q) and _rel_err(q, big) <= 0.01 * 1.0001

    tiny = 5e-324  # denormal: midpoint underflows to 0.0 -> clamps to min
    sk2 = DDSketch(0.01)
    sk2.add_array(np.array([tiny, 1.0]))
    assert sk2.quantile(0.0) == tiny
    assert _rel_err(sk2.quantile(1.0), 1.0) <= 0.01 * 1.0001

    neg = DDSketch(0.01)
    neg.add_array(np.array([-big, -1.0]))
    assert np.isfinite(neg.quantile(0.0))
    assert _rel_err(neg.quantile(0.0), -big) <= 0.01 * 1.0001


def test_sketch_agg_pipeline_matches_direct_and_fabrics(spark):
    """DataFrame pipeline (pandas UDAF fabric) == Arrow partial fabric ==
    direct single-pass build, byte-for-byte per group."""
    from zetasketch_spark.operators.agg import sketch_agg

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 30_000),
        "v": rng.lognormal(2, 1.5, 30_000),
    })
    pdf.loc[pdf.sample(frac=0.01, random_state=0).index, "v"] = None
    fam = DDSketchFamily(alpha=0.01, quantiles=(0.5, 0.99))
    df = spark.createDataFrame(pdf).repartition(8)

    got = {r["g"]: (bytes(r["sketch"]), r["q50"], r["q99"], r["n"])
           for r in sketch_agg(df, ["g"], "v", fam,
                               keep_sketch=True).collect()}
    for g, sub in pdf.groupby("g"):
        direct = fam.make()
        fam.update(direct, sub["v"])
        want = fam.serialize(direct)
        assert got[g][0] == want, f"group {g} state differs from direct"
        exact = _exact_order_stats(
            sub["v"].dropna().to_numpy(dtype=np.float64), (0.5, 0.99))
        assert _rel_err(got[g][1], exact[0]) <= 0.01 * 1.0001
        assert _rel_err(got[g][2], exact[1]) <= 0.01 * 1.0001
        assert got[g][3] == int(sub["v"].notna().sum())


def test_sql_surface_init_merge_quantile(spark):
    """dd_init_agg / dd_merge_agg / dd_quantile from spark.sql, partial
    -> merge shape, against the exact order statistic."""
    from zetasketch_spark.functions.sketch_udfs import register_sql

    register_sql(spark)
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({"shard": np.arange(20_000) % 16,
                        "v": rng.lognormal(1, 1, 20_000)})
    spark.createDataFrame(pdf).createOrReplaceTempView("dd_vals")
    [row] = spark.sql("""
        WITH partials AS (
          SELECT shard, dd_init_agg(v, 0.01) AS sk
          FROM dd_vals GROUP BY shard)
        SELECT dd_quantile(dd_merge_agg(sk), 0.9) AS p90 FROM partials
    """).collect()
    exact = _exact_order_stats(pdf["v"].to_numpy(), (0.9,))[0]
    assert _rel_err(row["p90"], exact) <= 0.01 * 1.0001


def test_hypothesis_merge_equals_single_pass():
    """Law: for ANY float list and ANY split point, merge(build(l),
    build(r)) serializes byte-identically to build(l + r)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    finite = st.floats(allow_nan=False, allow_infinity=False,
                       min_value=-1e12, max_value=1e12)

    @settings(max_examples=50, deadline=None)
    @given(st.lists(finite, max_size=200), st.data())
    def law(xs, data):
        cut = data.draw(st.integers(0, len(xs)))
        whole = DDSketch(0.05)
        whole.add_array(np.asarray(xs, dtype=np.float64))
        a, b = DDSketch(0.05), DDSketch(0.05)
        a.add_array(np.asarray(xs[:cut], dtype=np.float64))
        b.add_array(np.asarray(xs[cut:], dtype=np.float64))
        a.merge(b)
        assert a.serialize() == whole.serialize()

    law()
