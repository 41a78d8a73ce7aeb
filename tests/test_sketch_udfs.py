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


def test_sql_bigquery_hll_count_aliases(spark, transcripts_path):
    """The literal BigQuery spelling (HLL_COUNT.INIT / MERGE_PARTIAL /
    MERGE / EXTRACT, dots as underscores) resolves to the same kernels:
    alias results are IDENTICAL to the native names, and MERGE is the
    merge+extract composite (BIGINT; 0 over all-null input)."""
    from zetasketch_spark.functions.sketch_udfs import register_sql
    from zetasketch_spark.sources.transcripts import load_transcripts

    register_sql(spark)
    load_transcripts(spark, transcripts_path).createOrReplaceTempView("turns")
    spark.sql("""
        SELECT role, tool,
               hll_count_init(conv_id, 12, 'string') AS sk_bq,
               hll_init_agg(conv_id, 12, 'string') AS sk
        FROM turns GROUP BY role, tool
    """).createOrReplaceTempView("partials")
    out = spark.sql("""
        SELECT role,
               hll_count_merge(sk_bq) AS merged_bq,
               hll_count_extract(hll_count_merge_partial(sk_bq)) AS extracted_bq,
               hll_estimate(hll_merge_agg(sk)) AS native
        FROM partials GROUP BY role
    """).collect()
    assert len(out) == 3
    for r in out:
        assert r["merged_bq"] == r["extracted_bq"] == r["native"] > 0
    empty = spark.sql(
        "SELECT hll_count_merge(CAST(NULL AS BINARY)) AS e FROM range(3)"
    ).collect()
    assert empty[0]["e"] == 0


def test_custom_value_type_registry():
    """Custom value types (> 1000, proto/custom-value-type.proto): the
    aggregator records the id, enforces merge compatibility on it, and
    round-trips it through serialization."""
    import numpy as np
    import pytest

    from zetasketch_spark.hll import HllSketch

    rng = np.random.default_rng(12)
    h = rng.integers(0, 2**63, size=1000, dtype=np.uint64)
    sk = HllSketch(precision=13)
    with pytest.raises(ValueError):
        sk.add_custom(h, type_id=11)  # standard ids are not custom
    sk.add_custom(h, type_id=1188553293)
    rt = HllSketch.deserialize(sk.serialize())
    assert rt.value_type == 1188553293
    other = HllSketch(precision=13)
    other.add_custom(h[:10], type_id=1007)
    with pytest.raises(ValueError):
        rt.merge(other)  # different custom ids must refuse to merge
    ok = HllSketch(precision=13)
    ok.add_custom(h[:500], type_id=1188553293)
    rt.merge(ok)
    assert rt.estimate() == sk.estimate()


def test_sketch_column_annotations_roundtrip(spark, transcripts_path, tmp_path):
    """Column annotations (proto/annotation.proto parity via Spark column
    metadata) survive a parquet round trip and are discoverable."""
    import pyspark.sql.functions as F

    from zetasketch_spark.functions.annotations import (
        HYPERLOGLOG_PLUS_UNIQUE, annotate_sketch_column, sketch_columns)
    from zetasketch_spark.functions.sketch_udfs import hll_init_agg
    from zetasketch_spark.sources.transcripts import load_transcripts

    df = load_transcripts(spark, transcripts_path)
    sk = df.groupBy("role").agg(hll_init_agg("conv_id", 13).alias("convs_hll"))
    sk = annotate_sketch_column(sk, "convs_hll", value_type=11, precision=13)
    found = sketch_columns(sk)
    assert found == {"convs_hll": {"type": HYPERLOGLOG_PLUS_UNIQUE,
                                   "value_type": 11, "precision": 13}}
    out = str(tmp_path / "annotated")
    sk.write.parquet(out)
    back = spark.read.parquet(out)
    assert sketch_columns(back) == found
    # the annotated states are still live sketches
    from zetasketch_spark.functions.sketch_udfs import hll_estimate
    n = back.select(hll_estimate(F.col("convs_hll")).alias("u")).collect()
    assert all(r["u"] > 0 for r in n)


def test_hll_set_operation_estimates():
    """Inclusion-exclusion set ops over serialized sketches: seeded sets
    with known overlap, errors within the propagated envelopes."""
    import math

    import numpy as np

    from zetasketch_spark.functions.setops import (
        hll_difference_estimate, hll_intersection_estimate, hll_union,
        hll_union_estimate)
    from zetasketch_spark.hll import HllSketch

    p = 14
    env = 1.04 / math.sqrt(2 ** p)
    a_vals = np.arange(0, 60_000, dtype=np.int64)
    b_vals = np.arange(40_000, 100_000, dtype=np.int64)  # overlap 20k
    sa = HllSketch(precision=p); sa.add_longs(a_vals)
    sb = HllSketch(precision=p); sb.add_longs(b_vals)
    a, b = sa.serialize(), sb.serialize()

    union = hll_union_estimate(a, b)
    assert abs(union / 100_000 - 1) <= 3 * env
    # union sketch must equal merging directly
    assert HllSketch.deserialize(hll_union(a, b)).estimate() == union
    inter = hll_intersection_estimate(a, b)
    assert abs(inter - 20_000) <= 3 * env * 100_000
    diff = hll_difference_estimate(a, b)
    assert abs(diff - 40_000) <= 4 * env * 100_000
    # clamping: disjoint sets can't go negative
    sc = HllSketch(precision=p); sc.add_longs(np.arange(500_000, 501_000))
    assert hll_intersection_estimate(a, sc.serialize()) >= 0


def test_kll_sql_surface_rollup(spark, transcripts_path):
    """kll_init_agg / kll_merge_agg / kll_quantile from spark.sql: per-day
    sketches merged up to role must answer within rank-ε of the exact
    percentile over the same data (sketch rollup property for quantiles)."""
    from zetasketch_spark.functions.sketch_udfs import register_sql
    from zetasketch_spark.sources.transcripts import load_transcripts

    register_sql(spark)
    load_transcripts(spark, transcripts_path) \
        .withColumn("turn_len", F.length("text").cast("double")) \
        .createOrReplaceTempView("turns")
    got = {r["role"]: r["p50"] for r in spark.sql("""
        WITH fine AS (
          SELECT role, to_date(ts) AS day, kll_init_agg(turn_len, 200) AS sk
          FROM turns GROUP BY 1, 2
        )
        SELECT role, kll_quantile(kll_merge_agg(sk), 0.5) AS p50
        FROM fine GROUP BY role
    """).collect()}
    # rank check per role against the raw data
    for role, est in got.items():
        rk = spark.sql(
            "SELECT avg(CAST(turn_len <= {} AS DOUBLE)) AS r "
            "FROM turns WHERE role = '{}'".format(est, role)).collect()[0]["r"]
        assert abs(rk - 0.5) <= 0.03, (role, est, rk)


def test_full_family_sql_surface(spark, transcripts_path):
    """Every sketch family is SQL-accessible: t-digest quantiles, CM point
    queries against exact counts (never under, bounded over), Bloom
    membership with zero false negatives — all from spark.sql."""
    from zetasketch_spark.functions.sketch_udfs import register_sql
    from zetasketch_spark.sources.transcripts import load_transcripts

    register_sql(spark)
    load_transcripts(spark, transcripts_path) \
        .withColumn("turn_len", F.length("text").cast("double")) \
        .createOrReplaceTempView("turns2")

    # t-digest median within rank tolerance
    [r] = spark.sql("""
        SELECT tdigest_quantile(tdigest_init_agg(turn_len, 200), 0.5) AS p50
        FROM turns2""").collect()
    [rk] = spark.sql(
        f"SELECT avg(CAST(turn_len <= {r['p50']} AS DOUBLE)) AS r FROM turns2"
    ).collect()
    assert abs(rk["r"] - 0.5) <= 0.05

    # CM point query: >= exact always, <= exact + eps*N
    rows = spark.sql("""
        WITH sk AS (SELECT cm_merge_agg(s) AS cm FROM (
               SELECT cm_init_agg(tool, 2048, 5) AS s FROM turns2
               WHERE tool IS NOT NULL GROUP BY pmod(xxhash64(conv_id), 4))),
             ex AS (SELECT tool, count(*) AS n FROM turns2
                    WHERE tool IS NOT NULL GROUP BY tool)
        SELECT ex.tool, ex.n, cm_point_query(sk.cm, ex.tool) AS est
        FROM ex CROSS JOIN sk""").collect()
    total = sum(r["n"] for r in rows)
    import math
    slack = math.ceil(math.e / 2048 * total)
    for r in rows:
        assert r["n"] <= r["est"] <= r["n"] + slack, (r["tool"], r["n"], r["est"])

    # Bloom: every inserted key probes true
    [bl] = spark.sql("""
        WITH sk AS (SELECT bloom_init_agg(conv_id, 1048576, 7) AS bf FROM turns2)
        SELECT count(*) AS n,
               sum(CAST(bloom_contains(sk.bf, t.conv_id) AS INT)) AS hits
        FROM (SELECT DISTINCT conv_id FROM turns2) t CROSS JOIN sk""").collect()
    assert bl["hits"] == bl["n"]


def test_sql_surface_null_promotion_consistency(spark):
    """Arrow promotes nullable int columns to float64 inside pandas UDFs;
    the SQL surface must canonicalize so build and probe agree (a NULL in
    the build column previously made every Bloom probe a false negative
    and every CM point query read the wrong cells)."""
    import pandas as pd

    from zetasketch_spark.functions.sketch_udfs import register_sql

    register_sql(spark)
    build = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 2, 3, 3, None]}).astype({"k": "Int64"}))
    build.createOrReplaceTempView("build_keys")
    probe = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3, 99]}))
    probe.createOrReplaceTempView("probe_keys")

    rows = spark.sql("""
        WITH sk AS (SELECT bloom_init_agg(k, 4096, 5) AS bf,
                           cm_init_agg(k, 1024, 5) AS cm
                    FROM build_keys)
        SELECT p.k, bloom_contains(sk.bf, p.k) AS member,
               cm_point_query(sk.cm, p.k) AS est
        FROM probe_keys p CROSS JOIN sk
    """).collect()
    got = {r["k"]: (r["member"], r["est"]) for r in rows}
    assert got[1][0] and got[2][0] and got[3][0], "false negatives"
    assert got[1][1] == 1 and got[2][1] == 2 and got[3][1] == 3
    assert got[99][1] == 0


def test_canon_keys_per_value_mixed_batches(spark):
    """Key canonicalization must be per VALUE, not per batch: a double key
    that is integral must render the same whether its batch happens to be
    all-integral (probe) or mixed (build). The old per-batch np.all test
    hashed 1.0 as '1.0' at build and '1' at probe — false negatives."""
    import pandas as pd

    from zetasketch_spark.functions.sketch_udfs import register_sql

    register_sql(spark)
    # build batch is MIXED (1.0 sits next to 2.5); probe batch is integral
    spark.createDataFrame(pd.DataFrame(
        {"k": [1.0, 2.5, 3.0, 1.0, 3.0, 3.0]})).createOrReplaceTempView("mix_build")
    spark.createDataFrame(pd.DataFrame(
        {"k": [1.0, 3.0, 7.0]})).createOrReplaceTempView("mix_probe")
    rows = spark.sql("""
        WITH sk AS (SELECT bloom_init_agg(k, 4096, 5) AS bf,
                           cm_init_agg(k, 1024, 5) AS cm
                    FROM mix_build)
        SELECT p.k, bloom_contains(sk.bf, p.k) AS member,
               cm_point_query(sk.cm, p.k) AS est
        FROM mix_probe p CROSS JOIN sk
    """).collect()
    got = {r["k"]: (r["member"], r["est"]) for r in rows}
    assert got[1.0] == (True, 2)
    assert got[3.0] == (True, 3)
    assert got[7.0][1] == 0
    # and the fractional key itself stays probe-able
    [r] = spark.sql("""
        WITH sk AS (SELECT cm_init_agg(k, 1024, 5) AS cm FROM mix_build)
        SELECT cm_point_query(sk.cm, 2.5d) AS est FROM sk""").collect()
    assert r["est"] == 1


def test_hll_init_nullable_int_group_promotion(spark):
    """A NULL in one group promotes that group's bigint column to float64
    inside the pandas UDF; the HLL init path must keep hashing in the int64
    domain so cross-group merges stay compatible and estimates match."""
    import pandas as pd
    import pyspark.sql.functions as F

    from zetasketch_spark.functions.sketch_udfs import (
        hll_estimate, hll_init_agg, hll_merge_agg)

    pdf = pd.DataFrame({
        "day": ["a"] * 4 + ["b"] * 4,
        "user_id": pd.array([1, 2, 3, 4, 3, 4, 5, None], dtype="Int64"),
    })
    df = spark.createDataFrame(pdf)
    fine = df.groupBy("day").agg(hll_init_agg("user_id", 13).alias("sk"))
    # merge across the null-free and null-containing groups: raises on
    # incompatible value types without the promotion fix
    [got] = (fine.agg(hll_merge_agg("sk").alias("sk"))
             .select(hll_estimate("sk").alias("est")).collect())
    assert got["est"] == 5
    # and the merged state is in the SAME hash domain as a pure-int build
    [whole] = (df.dropna().agg(hll_init_agg("user_id", 13).alias("sk"))
               .select(hll_estimate("sk").alias("est")).collect())
    assert got["est"] == whole["est"]


def test_hll_init_double_column_mixed_groups(spark):
    """A genuinely-double column whose groups happen to be all-integral
    must keep hashing in the DOUBLE domain (null-free float64 batches are
    NOT nullable-int promotions): cross-group merges must not raise."""
    import pandas as pd

    from zetasketch_spark.functions.sketch_udfs import (
        hll_estimate, hll_init_agg, hll_merge_agg)

    pdf = pd.DataFrame({
        "g": ["a"] * 3 + ["b"] * 3,
        "v": [1.0, 2.0, 3.0, 1.0, 2.5, 3.5],  # group a all-integral
    })
    df = spark.createDataFrame(pdf)
    fine = df.groupBy("g").agg(hll_init_agg("v", 13).alias("sk"))
    [got] = (fine.agg(hll_merge_agg("sk").alias("sk"))
             .select(hll_estimate("sk").alias("est")).collect())
    assert got["est"] == 5


def test_sql_registered_init_typed(spark):
    """The SQL-registered hll_init_agg(col, p, typeof(col)) pins the hash
    domain from the declared type, so SQL-built and DataFrame-built
    sketches are byte-identical for the same column — including nullable
    int columns whose null-containing groups promote to float64."""
    import pandas as pd

    from zetasketch_spark.functions.sketch_udfs import hll_init_agg, register_sql

    register_sql(spark)
    pdf = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 4,
        "user_id": pd.array([1, 2, 3, 4, 3, 4, 5, None], dtype="Int64"),
    })
    spark.createDataFrame(pdf).createOrReplaceTempView("typed_init")
    sql_sk = {r["g"]: bytes(r["sk"]) for r in spark.sql("""
        SELECT g, hll_init_agg(user_id, 13, typeof(user_id)) AS sk
        FROM typed_init GROUP BY g""").collect()}
    df_sk = {r["g"]: bytes(r["sk"]) for r in
             spark.table("typed_init").groupBy("g")
             .agg(hll_init_agg("user_id", 13).alias("sk")).collect()}
    assert sql_sk == df_sk
    [est] = spark.sql("""
        SELECT hll_estimate(hll_merge_agg(sk)) AS u FROM (
          SELECT g, hll_init_agg(user_id, 13, typeof(user_id)) AS sk
          FROM typed_init GROUP BY g)""").collect()
    assert est["u"] == 5


def test_theta_setop_scalars_per_group(spark):
    """Distributed per-group set ops: theta sketches built per (day, side)
    and combined row-wise with the scalar UDFs match exact per-day set
    sizes (small domains -> exact mode -> equality, not just envelope)."""
    import pandas as pd

    from zetasketch_spark.functions.sketch_udfs import (
        theta_a_not_b_estimate, theta_init_agg, theta_intersection_estimate,
        theta_jaccard, theta_union_estimate)

    rows = []
    for day in (1, 2, 3):
        for u in range(0, 60 + day):            # side A: [0, 60+day)
            rows.append((day, "a", u))
        for u in range(30, 100):                # side B: [30, 100)
            rows.append((day, "b", u))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["day", "side", "uid"]))
    sk = (df.groupBy("day", "side")
          .agg(theta_init_agg("uid", 256).alias("sk"))
          .groupBy("day")
          .pivot("side", ["a", "b"]).agg(F.first("sk")))
    out = {r["day"]: r for r in sk.select(
        "day",
        theta_union_estimate("a", "b").alias("u"),
        theta_intersection_estimate("a", "b").alias("i"),
        theta_a_not_b_estimate("a", "b").alias("d"),
        theta_jaccard("a", "b").alias("j"),
    ).collect()}
    for day in (1, 2, 3):
        n_a = 60 + day
        exact_u, exact_i, exact_d = 100, n_a - 30, 30
        r = out[day]
        assert r["u"] == exact_u and r["i"] == exact_i and r["d"] == exact_d
        assert abs(r["j"] - exact_i / exact_u) < 1e-9

    # null side follows empty-set semantics
    one = (df.filter("side = 'a' and day = 1")
           .groupBy("day").agg(theta_init_agg("uid", 256).alias("a"))
           .withColumn("b", F.lit(None).cast("binary")))
    r = one.select(theta_union_estimate("a", "b").alias("u"),
                   theta_intersection_estimate("a", "b").alias("i"),
                   theta_a_not_b_estimate("a", "b").alias("d")).collect()[0]
    assert r["u"] == 61 and r["i"] == 0 and r["d"] == 61


def test_join_key_profile_planted_overlap(spark):
    """join_key_profile on planted sets: A=[0,3000), B=[2000,6000) ->
    exact-mode sketches give exact distincts/overlap/differences and the
    asymmetric containments."""
    import pandas as pd

    from zetasketch_spark.operators.joinprofile import join_key_profile

    a = spark.createDataFrame(pd.DataFrame({"ka": list(range(3000)) * 2}))
    b = spark.createDataFrame(pd.DataFrame({"kb": list(range(2000, 6000))}))
    r = join_key_profile(a, "ka", b, "kb", k=8192).collect()[0]
    assert r["distinct_a"] == 3000 and r["distinct_b"] == 4000
    assert r["overlap"] == 1000 and r["a_not_b"] == 2000 and r["b_not_a"] == 3000
    assert r["union_distinct"] == 6000
    assert abs(r["containment_a_in_b"] - 1000 / 3000) < 1e-9
    assert abs(r["containment_b_in_a"] - 1000 / 4000) < 1e-9
    assert abs(r["jaccard"] - 1000 / 6000) < 1e-9


def test_hll_estimates_cross_validate_spark_native_datasketches(spark):
    """Independent-implementation cross-check: our zetasketch-wire HLL++
    and Spark 4's built-in Apache DataSketches HLL (hll_sketch_agg) must
    both land within their published envelopes of the exact distinct on
    the same grouped data — two unrelated codebases agreeing pins the
    estimator, not just our own tests. (The wire formats are deliberately
    different: this library's sketches are byte-compatible with
    BigQuery/ZetaSketch AggregatorStateProto, which the built-in cannot
    produce — that parity is the point of the repo.)"""
    import pandas as pd

    from zetasketch_spark.operators.agg import sketch_agg
    from zetasketch_spark.operators.verify import hll_envelope_bound
    from zetasketch_spark.sketches.base import HllFamily

    rng_rows = 60_000
    pdf = pd.DataFrame({
        "g": [f"g{i % 4}" for i in range(rng_rows)],
        # per-group distinct cardinalities differ by construction
        "v": [f"u{(i * 2654435761) % (3000 * (i % 4 + 1))}"
              for i in range(rng_rows)],
    })
    df = spark.createDataFrame(pdf).repartition(8)
    p = 14

    ours = {r["g"]: r["estimate"] for r in
            sketch_agg(df, ["g"], "v", HllFamily(precision=p)).collect()}
    native = {r["g"]: r["native_est"] for r in
              df.groupBy("g").agg(F.hll_sketch_estimate(
                  F.hll_sketch_agg("v", F.lit(p))).alias("native_est"))
              .collect()}
    exact = {r["g"]: r["x"] for r in
             df.groupBy("g").agg(F.countDistinct("v").alias("x")).collect()}

    bound = hll_envelope_bound(p)  # 3 sigma of 1.04/sqrt(2^p)
    for g, x in exact.items():
        assert abs(ours[g] / x - 1.0) <= bound, (g, ours[g], x)
        assert abs(native[g] / x - 1.0) <= bound, (g, native[g], x)
        # and against each other: both inside the envelope of the same
        # truth means they can differ by at most 2*bound
        assert abs(ours[g] - native[g]) <= 2 * bound * x, (g, ours[g], native[g])


def test_theta_churn_planted_membership_and_table_versions(spark):
    """theta_churn on planted per-group membership: exact-mode sketches
    give exact retained/arrived/churned, a key missing on one side gets
    empty-set semantics, and the SketchTable time-travel composition
    (churn between two committed versions of a cumulative table) reports
    churned == 0 and arrived == the delta's new distincts."""
    import os

    from zetasketch_spark.functions.setops import theta_churn
    from zetasketch_spark.operators.agg import sketch_agg
    from zetasketch_spark.sketches.theta import ThetaFamily

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    events = spark.read.parquet(f"{sf}/events.parquet")
    fam = ThetaFamily(k=4096)  # exact mode at gate-scale distincts
    uid3 = F.col("user_id") % 3

    old_rows = events.filter((uid3 < 2) & (F.col("event_type") != "click"))
    new_rows = events.filter(uid3 > 0)
    churn = {r["event_type"]: r for r in theta_churn(
        sketch_agg(old_rows, ["event_type"], "user_id", fam,
                   keep_sketch=True),
        sketch_agg(new_rows, ["event_type"], "user_id", fam,
                   keep_sketch=True),
        ["event_type"]).collect()}

    exact = {r["event_type"]: r for r in events.groupBy("event_type").agg(
        F.countDistinct(F.when(uid3 == 1, F.col("user_id"))).alias("mod1"),
        F.countDistinct(F.when(uid3 == 2, F.col("user_id"))).alias("mod2"),
        F.countDistinct(F.when(uid3 == 0, F.col("user_id"))).alias("mod0"),
    ).collect()}
    for et, x in exact.items():
        c = churn[et]
        if et == "click":  # absent from old: everything 'arrived'
            assert (c["retained"], c["churned"]) == (0, 0)
            assert c["arrived"] == x["mod1"] + x["mod2"]
        else:
            assert c["retained"] == x["mod1"], et
            assert c["arrived"] == x["mod2"], et
            assert c["churned"] == x["mod0"], et

    # cumulative SketchTable versions: nothing can churn, arrivals exact
    import tempfile

    from zetasketch_spark.operators.incremental import SketchTable

    table = SketchTable(tempfile.mkdtemp(prefix="zs_churn_"),
                        ["event_type"], "user_id", fam)
    table.update(spark, events.filter(uid3 < 2), fingerprint="v1")
    table.update(spark, events.filter(uid3 == 2), fingerprint="v2")
    vc = {r["event_type"]: r for r in theta_churn(
        table.read(spark, version=1), table.read(spark, version=2),
        ["event_type"]).collect()}
    for et, x in exact.items():
        assert vc[et]["churned"] == 0, et
        assert vc[et]["arrived"] == x["mod2"], et


def test_theta_churn_null_key_groups_match_null_safe(spark):
    """A NULL-keyed group present on BOTH sides must come back as ONE
    matched row (null-safe join), not a bogus fully-churned +
    fully-arrived pair — groupBy keeps NULL groups, so state frames can
    legitimately carry them."""
    import os

    from zetasketch_spark.functions.setops import theta_churn
    from zetasketch_spark.operators.agg import sketch_agg
    from zetasketch_spark.sketches.theta import ThetaFamily

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    events = spark.read.parquet(f"{sf}/events.parquet")
    fam = ThetaFamily(k=4096)
    uid3 = F.col("user_id") % 3
    nullkey = F.lit(None).cast("string")

    old = sketch_agg(events.filter(uid3 < 2).withColumn("k", nullkey),
                     ["k"], "user_id", fam, keep_sketch=True)
    new = sketch_agg(events.filter(uid3 > 0).withColumn("k", nullkey),
                     ["k"], "user_id", fam, keep_sketch=True)
    rows = theta_churn(old, new, ["k"]).collect()
    assert len(rows) == 1 and rows[0]["k"] is None
    [x] = events.agg(
        F.countDistinct(F.when(uid3 == 1, F.col("user_id"))).alias("m1"),
        F.countDistinct(F.when(uid3 == 2, F.col("user_id"))).alias("m2"),
        F.countDistinct(F.when(uid3 == 0, F.col("user_id"))).alias("m0"),
    ).collect()
    assert (rows[0]["retained"], rows[0]["arrived"], rows[0]["churned"]) \
        == (x["m1"], x["m2"], x["m0"])
