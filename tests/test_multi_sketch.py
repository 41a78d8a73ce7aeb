"""Multi-sketch single-pass aggregation: HLL + KLL + Bloom over different
columns in one scan, results matching the single-sketch pipelines."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F


def test_multi_sketch_one_pass(spark, transcripts_path):
    from zetasketch_spark.operators.agg import sketch_agg
    from zetasketch_spark.operators.multi import multi_sketch_agg
    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sketches.kll import KllFamily
    from zetasketch_spark.sources.transcripts import load_transcripts

    df = load_transcripts(spark, transcripts_path).withColumn(
        "turn_len", F.length("text").cast("double"))

    from zetasketch_spark.sketches.theta import ThetaFamily, ThetaSketch

    hll = HllFamily(precision=13)
    kll = KllFamily(k=200, quantiles=(0.5, 0.9))
    theta = ThetaFamily(k=512)
    out = multi_sketch_agg(df, ["role"], {
        "convs": ("conv_id", hll),
        "lens": ("turn_len", kll),
        "tconvs": ("conv_id", theta),
    })
    rows = {r["role"]: r for r in out.collect()}
    assert set(rows) == {"user", "assistant", "tool"}

    # theta estimates equal a local single-threaded build (same keys)
    import pandas as pd

    pdf = df.select("role", "conv_id").toPandas()
    for role, grp in pdf.groupby("role"):
        sk = ThetaSketch(k=512)
        sk.add_series(pd.Series(grp["conv_id"]))
        assert rows[role]["tconvs_estimate"] == sk.estimate()

    # HLL estimates equal the single-sketch pipeline (same states)
    single = {r["role"]: r["estimate"] for r in
              sketch_agg(df, ["role"], "conv_id", hll).collect()}
    for role, r in rows.items():
        assert r["convs_estimate"] == single[role]

    # KLL quantiles within rank error of exact
    for role, r in rows.items():
        vals = np.array([x[0] for x in df.filter(F.col("role") == role)
                         .select("turn_len").collect()])
        for q, est in ((0.5, r["lens_q50"]), (0.9, r["lens_q90"])):
            assert abs((vals <= est).mean() - q) <= 0.02

    # one scan: rows_seen matches group counts
    counts = dict(df.groupBy("role").count().collect())
    for role, r in rows.items():
        assert r["rows_seen"] == counts[role]


def test_multi_sketch_single_scan_plan(spark, transcripts_path):
    """The plan must contain exactly one parquet scan (that's the point)."""
    from zetasketch_spark.operators.multi import multi_sketch_partial
    from zetasketch_spark.plans.explain import read_schema_columns
    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sketches.bloom import BloomFamily
    from zetasketch_spark.sources.transcripts import load_transcripts

    df = load_transcripts(spark, transcripts_path)
    p = multi_sketch_partial(df, ["role"], {
        "convs": ("conv_id", HllFamily(precision=12)),
        "tools": ("tool", BloomFamily(m=1 << 12, k=4)),
    })
    scans = read_schema_columns(p)
    assert len(scans) == 1
    assert set(scans[0]) == {"role", "conv_id", "tool"}
