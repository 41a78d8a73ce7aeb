"""BigQuery-style HLL function surface: INIT/MERGE/EXTRACT parity with the
operator pipeline (byte-identical states, exact rollups)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_init_merge_extract_roundtrip(spark, transcripts_path):
    from zetasketch_spark.functions.sketch_udfs import (
        hll_estimate, hll_init_agg, hll_merge_agg)
    from zetasketch_spark.sources.transcripts import load_transcripts

    df = load_transcripts(spark, transcripts_path)
    # INIT at fine grain (role, tool), MERGE to coarse (role), EXTRACT
    fine = df.groupBy("role", "tool").agg(
        hll_init_agg("conv_id", 13).alias("sk"))
    coarse = fine.groupBy("role").agg(hll_merge_agg("sk").alias("sk"))
    got = {r["role"]: r["est"] for r in
           coarse.select("role", hll_estimate(F.col("sk")).alias("est")).collect()}

    exact = {r["role"]: r["n"] for r in
             df.groupBy("role").agg(F.countDistinct("conv_id").alias("n")).collect()}
    for role, n in exact.items():
        assert abs(got[role] / n - 1) <= 0.05, (role, got[role], n)


def test_udaf_state_matches_operator_pipeline(spark, transcripts_path):
    """The grouped-agg UDAF and the mapInArrow operator pipeline must
    produce byte-identical post-compact states."""
    from zetasketch_spark.functions.sketch_udfs import hll_init_agg
    from zetasketch_spark.operators.agg import SKETCH_COL, sketch_merge, sketch_partial
    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sources.transcripts import load_transcripts

    df = load_transcripts(spark, transcripts_path)
    udaf = {r["role"]: bytes(r["sk"]) for r in
            df.groupBy("role").agg(hll_init_agg("conv_id", 13).alias("sk")).collect()}
    fam = HllFamily(precision=13)
    pipe = {r["role"]: bytes(r[SKETCH_COL]) for r in
            sketch_merge(sketch_partial(df, ["role"], "conv_id", fam), ["role"], fam).collect()}
    assert udaf == pipe


def test_sketch_rollup_grouping_sets(spark, transcripts_path):
    """ROLLUP over sketch-merge: compute once at (role, tool) grain, roll up
    by merging — estimates at every grouping level from one pass
    (SURVEY.md §2.2 'aggregations')."""
    from zetasketch_spark.functions.sketch_udfs import (
        hll_estimate, hll_init_agg, hll_merge_agg)
    from zetasketch_spark.sources.transcripts import load_transcripts

    df = load_transcripts(spark, transcripts_path)
    fine = df.groupBy("role", "tool").agg(hll_init_agg("conv_id", 13).alias("sk"))
    rolled = (
        fine.rollup("role", "tool")
        .agg(hll_merge_agg("sk").alias("sk"))
        .select("role", "tool", hll_estimate(F.col("sk")).alias("approx"))
    )
    rows = {(r["role"], r["tool"]): r["approx"] for r in rolled.collect()}
    grand = rows[(None, None)]
    exact = df.select(F.countDistinct("conv_id")).first()[0]
    assert abs(grand / exact - 1) <= 0.05
    # per-role subtotals present
    assert ("user", None) in rows and ("assistant", None) in rows


def test_sketch_agg_over_window_frame(spark, transcripts_path):
    """The INIT UDAF composes with window frames — per-partition distinct
    counts without a group-by collapse (window functions over sketches)."""
    from pyspark.sql import Window

    from zetasketch_spark.functions.sketch_udfs import hll_estimate, hll_init_agg
    from zetasketch_spark.sources.transcripts import load_transcripts

    df = load_transcripts(spark, transcripts_path)
    w = Window.partitionBy("role")
    out = (
        df.withColumn("sk", hll_init_agg("conv_id", 13).over(w))
        .select("role", hll_estimate("sk").alias("distinct_convs"))
        .distinct()
    )
    got = {r["role"]: r["distinct_convs"] for r in out.collect()}
    exact = {r["role"]: r["n"] for r in df.groupBy("role").agg(
        F.countDistinct("conv_id").alias("n")).collect()}
    for role, n in exact.items():
        assert abs(got[role] / n - 1) <= 0.05


def test_udfs_importable_without_session():
    """Importing the module must not require an active SparkSession (the
    scalar UDFs are created lazily)."""
    import importlib

    import zetasketch_spark.functions.sketch_udfs as m

    importlib.reload(m)


def test_sql_registration(spark, transcripts_path):
    from zetasketch_spark.functions.sketch_udfs import hll_init_agg, register_sql
    from zetasketch_spark.sources.transcripts import load_transcripts

    register_sql(spark)
    df = load_transcripts(spark, transcripts_path)
    df.groupBy("role", "tool").agg(hll_init_agg("conv_id", 12).alias("sk")) \
        .createOrReplaceTempView("sketches")
    out = spark.sql("""
        SELECT role, hll_estimate(hll_merge_agg(sk)) AS approx,
               hll_num_values(hll_merge_agg(sk)) AS n_values
        FROM sketches GROUP BY role
    """).collect()
    assert len(out) == 3
    assert all(r["approx"] > 0 and r["n_values"] > 0 for r in out)
