"""Fast execution fabrics (pyarrow in-worker scan, RDD reduceByKey merge)
must be byte/value-identical to the DataFrame pipeline."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_fastscan_states_equal_dataframe_path(spark, transcripts_path):
    from zetasketch_spark.operators.agg import (
        SKETCH_COL, sketch_merge, sketch_partial)
    from zetasketch_spark.operators.fastscan import sketch_agg_fastscan
    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sources.transcripts import load_transcripts

    fam = HllFamily(precision=13)
    fast = {r["role"]: bytes(r[SKETCH_COL]) for r in sketch_agg_fastscan(
        spark, transcripts_path, ["role"], "conv_id", fam, keep_sketch=True).collect()}
    df = load_transcripts(spark, transcripts_path)
    pipe = {r["role"]: bytes(r[SKETCH_COL]) for r in
            sketch_merge(sketch_partial(df, ["role"], "conv_id", fam), ["role"], fam).collect()}
    assert fast == pipe


def test_rdd_fabric_matches_dataframe_estimates(spark, transcripts_path):
    from zetasketch_spark.operators.agg import hll_count_distinct
    from zetasketch_spark.operators.fastscan import sketch_agg_rdd
    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sources.tables import with_day
    from zetasketch_spark.sources.transcripts import load_transcripts

    fam = HllFamily(precision=13)
    rdd_res = {(r["role"], str(r["day"])): (r["estimate"], r["rows_seen"])
               for r in sketch_agg_rdd(
                   spark, transcripts_path, ["role", "day"], "conv_id", fam,
                   derived_keys={"day": ("to_date", "ts")}).collect()}
    df = with_day(load_transcripts(spark, transcripts_path))
    df_res = {(r["role"], str(r["day"])): (r["approx_distinct"], r["rows_seen"])
              for r in hll_count_distinct(df, ["role", "day"], "conv_id",
                                          precision=13).collect()}
    assert rdd_res == df_res


def test_fastscan_derived_day_key(spark, transcripts_path):
    from zetasketch_spark.operators.fastscan import sketch_agg_rdd
    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sources.transcripts import load_transcripts

    fam = HllFamily(precision=12)
    out = sketch_agg_rdd(spark, transcripts_path, ["role"], "conv_id", fam)
    rows = {r["role"]: r["rows_seen"] for r in out.collect()}
    df = load_transcripts(spark, transcripts_path)
    counts = dict(df.groupBy("role").count().collect())
    assert rows == counts


def test_fastscan_partitioned_layout_and_pruning(spark, transcripts_path, tmp_path):
    """The RDD fabric reads Hive/Iceberg day-partitioned layouts natively:
    partition columns come from the path, and partition_filter prunes
    whole files at planning time (zero I/O) — results must equal the
    DataFrame path over the filtered data."""
    import pyspark.sql.functions as F

    from zetasketch_spark.operators.agg import hll_count_distinct
    from zetasketch_spark.operators.fastscan import plan_splits, sketch_agg_rdd
    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sources.tables import TableIO, with_day
    from zetasketch_spark.sources.transcripts import load_transcripts

    df = with_day(load_transcripts(spark, transcripts_path))
    io = TableIO(spark, str(tmp_path), use_iceberg=False)
    io.write(df, "t_by_day", partition_by=["day"], mode="overwrite")
    root = str(tmp_path / "t_by_day")

    days = sorted(r["day"] for r in df.select("day").distinct().collect())
    pick = str(days[len(days) // 2])

    # planning-time pruning drops other days' files entirely
    all_splits = plan_splits(root)
    pruned = plan_splits(root, partition_filter={"day": pick})
    assert 0 < len(pruned) < len(all_splits)
    assert all(f"day={pick}" in f for f, _ in pruned)

    out = sketch_agg_rdd(spark, root, ["role", "day"], "conv_id",
                         HllFamily(precision=13),
                         partition_filter={"day": pick})
    got = {(r["role"], r["day"]): (r["estimate"], r["rows_seen"])
           for r in out.collect()}
    ref = hll_count_distinct(df.filter(F.col("day") == pick), ["role"],
                             "conv_id", precision=13)
    want = {(r["role"], pick): (r["approx_distinct"], r["rows_seen"])
            for r in ref.collect()}
    assert got == want


def test_partition_filter_typo_raises(spark, transcripts_path, tmp_path):
    """A partition_filter key that is not a partition column must raise —
    a silent no-op would aggregate everything while claiming pruning."""
    import pytest

    from zetasketch_spark.operators.fastscan import plan_splits

    with pytest.raises(ValueError, match="not partition columns"):
        plan_splits(transcripts_path, partition_filter={"day": "2024-01-01"})


def test_rdd_fabric_family_generic_theta_and_countmin(spark, transcripts_path):
    """The RDD fast fabric is family-generic: theta states (via the Arrow
    string fast path) and Count-Min heavy-hitter results over the fabric
    match the DataFrame sketch pipeline exactly."""
    import pandas as pd

    from zetasketch_spark.operators.agg import sketch_agg
    from zetasketch_spark.operators.fastscan import sketch_agg_rdd
    from zetasketch_spark.sketches.countmin import CountMinFamily
    from zetasketch_spark.sketches.theta import ThetaFamily
    from zetasketch_spark.sources.transcripts import load_transcripts

    df = load_transcripts(spark, transcripts_path)

    theta = ThetaFamily(k=512)
    rdd_t = {r["role"]: r["estimate"] for r in
             sketch_agg_rdd(spark, transcripts_path, ["role"], "conv_id",
                            theta).collect()}
    df_t = {r["role"]: r["estimate"] for r in
            sketch_agg(df, ["role"], "conv_id", theta).collect()}
    assert rdd_t == df_t and len(rdd_t) == 3

    cm = CountMinFamily(width=1024, depth=5, max_candidates=64)
    rdd_c = {r["role"]: tuple(r[n] for n, _ in cm.result_fields) for r in
             sketch_agg_rdd(spark, transcripts_path, ["role"], "tool",
                            cm).collect()}
    df_c = {r["role"]: tuple(r[n] for n, _ in cm.result_fields) for r in
            sketch_agg(df, ["role"], "tool", cm).collect()}
    assert rdd_c == df_c


def test_rdd_fabric_derived_value_kll(spark, transcripts_path):
    """KLL over a derived value (("length", "text")) on the RDD fast
    fabric: exact n per group, quantile estimates within the k=200 rank
    envelope of the true ranks, and the derived value itself must match
    Spark's length() semantics exactly (same min/max)."""
    import numpy as np

    from zetasketch_spark.operators.fastscan import sketch_agg_rdd
    from zetasketch_spark.sketches.kll import KllFamily
    from zetasketch_spark.sources.transcripts import load_transcripts

    fam = KllFamily(k=200, quantiles=(0.5, 0.9))
    out = {r["role"]: r for r in
           sketch_agg_rdd(spark, transcripts_path, ["role"],
                          ("length", "text"), fam).collect()}

    df = load_transcripts(spark, transcripts_path)
    pdf = df.select("role",
                    F.length("text").cast("double").alias("v")).toPandas()
    assert set(out) == set(pdf["role"].unique())
    for role, g in pdf.groupby("role"):
        vals = np.sort(g["v"].to_numpy())
        n = len(vals)
        assert out[role]["n"] == n
        for qname, q in (("q50", 0.5), ("q90", 0.9)):
            est = out[role][qname]
            # rank of the estimate among the true values
            lo = np.searchsorted(vals, est, side="left") / n
            hi = np.searchsorted(vals, est, side="right") / n
            assert lo - 0.03 <= q <= hi + 0.03, (role, qname, est, lo, hi)


def test_fastscan_ddsketch_derived_value_byte_equal(spark, transcripts_path):
    """DDSketch over the RDD fabric with a derived value: bucket counts
    are pure addition, so the fabric's per-group state must be
    BYTE-identical to a direct single-pass build over the same values —
    a stronger cross-fabric contract than KLL's rank envelope — and each
    quantile must sit within alpha of the exact order statistic."""
    import numpy as np

    from zetasketch_spark.operators.fastscan import sketch_agg_rdd
    from zetasketch_spark.sketches.ddsketch import DDSketchFamily
    from zetasketch_spark.sources.transcripts import load_transcripts

    fam = DDSketchFamily(alpha=0.01, quantiles=(0.5, 0.99))
    out = {r["role"]: r for r in
           sketch_agg_rdd(spark, transcripts_path, ["role"],
                          ("length", "text"), fam,
                          keep_sketch=True).collect()}

    df = load_transcripts(spark, transcripts_path)
    pdf = df.select("role",
                    F.length("text").cast("double").alias("v")).toPandas()
    assert set(out) == set(pdf["role"].unique())
    for role, g in pdf.groupby("role"):
        direct = fam.make()
        fam.update(direct, g["v"])
        assert bytes(out[role]["sketch"]) == fam.serialize(direct), role
        vals = np.sort(g["v"].to_numpy())
        n = len(vals)
        assert out[role]["n"] == n
        for qname, q in (("q50", 0.5), ("q99", 0.99)):
            exact = vals[int(q * (n - 1))]
            assert abs(out[role][qname] - exact) <= 0.01 * abs(exact) + 1e-9


def test_fastscan_derived_value_sources_pruned(transcripts_path):
    """Split planning for a derived value reads only the source column."""
    from zetasketch_spark.operators.fastscan import _value_source

    assert _value_source(("length", "text")) == "text"
    assert _value_source("conv_id") == "conv_id"


def test_rdd_fabric_derived_value_tdigest(spark, transcripts_path):
    """The derived-value path is family-generic: t-digest over
    ("length", "text") hits the same rank envelope contract as KLL."""
    import numpy as np

    from zetasketch_spark.operators.fastscan import sketch_agg_rdd
    from zetasketch_spark.sketches.tdigest import TDigestFamily
    from zetasketch_spark.sources.transcripts import load_transcripts

    fam = TDigestFamily(delta=200, quantiles=(0.5,))
    out = {r["role"]: r for r in
           sketch_agg_rdd(spark, transcripts_path, ["role"],
                          ("length", "text"), fam).collect()}
    pdf = load_transcripts(spark, transcripts_path).select(
        "role", F.length("text").cast("double").alias("v")).toPandas()
    for role, g in pdf.groupby("role"):
        vals = np.sort(g["v"].to_numpy())
        n = len(vals)
        est = out[role]["q50"]
        lo = np.searchsorted(vals, est, side="left") / n
        hi = np.searchsorted(vals, est, side="right") / n
        assert lo - 0.05 <= 0.5 <= hi + 0.05, (role, est, lo, hi)


def test_multi_sketch_agg_rdd_one_scan_equals_singles(spark, transcripts_path):
    """One-scan multi-family aggregation on the RDD fabric: every spec's
    result columns must equal the corresponding single-family
    ``sketch_agg_rdd`` run exactly (HLL register-max, Count-Min counts,
    and DDSketch bucket counts are all merge-order-independent), under a
    derived day key and a derived turn-length value."""
    from zetasketch_spark.operators.fastscan import (
        multi_sketch_agg_rdd, sketch_agg_rdd)
    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sketches.countmin import CountMinFamily
    from zetasketch_spark.sketches.ddsketch import DDSketchFamily

    hll = HllFamily(precision=13)
    cm = CountMinFamily(width=1024, depth=5, max_candidates=64)
    dd = DDSketchFamily(alpha=0.01, quantiles=(0.5, 0.99))
    keys = ["role", "day"]
    dk = {"day": ("to_date", "ts")}

    out = {(r["role"], str(r["day"])): r for r in multi_sketch_agg_rdd(
        spark, transcripts_path, keys,
        {"convs": ("conv_id", hll),
         "tools": ("tool", cm),
         "lens": (("length", "text"), dd)},
        derived_keys=dk).collect()}
    assert len(out) > 3

    singles = {}
    for name, col, fam in [("convs", "conv_id", hll),
                           ("tools", "tool", cm),
                           ("lens", ("length", "text"), dd)]:
        singles[name] = {(r["role"], str(r["day"])): r for r in
                         sketch_agg_rdd(spark, transcripts_path, keys, col,
                                        fam, derived_keys=dk).collect()}

    assert set(out) == set(singles["convs"])
    for key, row in out.items():
        assert row["rows_seen"] == singles["convs"][key]["rows_seen"]
        for name, fam in [("convs", hll), ("tools", cm), ("lens", dd)]:
            for fn, _ in fam.result_fields:
                assert row[f"{name}_{fn}"] == singles[name][key][fn], \
                    (key, name, fn)


def test_derived_length_on_dictionary_encoded_text(spark, tmp_path):
    """Parquet written from a DictionaryArray round-trips as
    dictionary<string> (the pooled 600M scaling table's layout);
    ("length", ...) must length the dictionary VALUES once and gather by
    index — pc.utf8_length has no dictionary kernel — and match the
    plain-encoded build byte-for-byte (DDSketch states are
    order-independent)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from zetasketch_spark.operators.fastscan import sketch_agg_rdd
    from zetasketch_spark.sketches.ddsketch import DDSketchFamily

    pool = ["a", "bb" * 5, "ccc" * 7, "dddd"]
    idx = [0, 1, 2, 3, 1, None, 0, 2] * 50
    roles = (["user", "assistant"] * 200)
    dict_arr = pa.DictionaryArray.from_arrays(
        pa.array(idx, type=pa.int32()), pa.array(pool))
    plain_arr = pa.array([None if i is None else pool[i] for i in idx])

    d_dict, d_plain = tmp_path / "dict", tmp_path / "plain"
    for d, arr in ((d_dict, dict_arr), (d_plain, plain_arr)):
        d.mkdir()
        pq.write_table(pa.table({"role": pa.array(roles), "text": arr}),
                       str(d / "part-0.parquet"))
    assert pq.read_schema(str(d_dict / "part-0.parquet")).field(
        "text").type == pa.dictionary(pa.int32(), pa.string())

    fam = DDSketchFamily(alpha=0.01, quantiles=(0.5, 0.99))
    got = {}
    for label, d in (("dict", d_dict), ("plain", d_plain)):
        got[label] = {r["role"]: bytes(r["sketch"]) for r in sketch_agg_rdd(
            spark, str(d), ["role"], ("length", "text"), fam,
            keep_sketch=True).collect()}
    assert got["dict"] == got["plain"]
    assert set(got["dict"]) == {"user", "assistant"}


def test_multi_sketch_agg_rdd_countsketch_spec(spark, transcripts_path):
    """CountSketch rides the one-scan multi fabric through the generic
    prepare_arrow fallback: its F2 result per group equals the direct
    pandas build exactly (signed counters are merge-order-independent
    AND byte-deterministic), alongside an HLL spec in the same scan."""
    import pandas as pd

    from zetasketch_spark.operators.fastscan import multi_sketch_agg_rdd
    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sketches.countsketch import CountSketchFamily

    cs = CountSketchFamily(width=1024, depth=5)
    out = {r["role"]: r for r in multi_sketch_agg_rdd(
        spark, transcripts_path, ["role"],
        {"convs": ("conv_id", HllFamily(precision=13)),
         "toolsq": ("tool", cs)}).collect()}
    assert len(out) >= 2

    pdf = spark.read.parquet(transcripts_path).select("role", "tool") \
        .toPandas()
    for role, grp in pdf.groupby("role"):
        direct = cs.make()
        cs.update(direct, grp["tool"])
        want_f2, want_n = cs.result(direct)
        assert out[role]["toolsq_f2_est"] == want_f2, role
        assert out[role]["toolsq_n"] == want_n, role
