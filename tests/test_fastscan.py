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
