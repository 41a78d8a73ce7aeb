"""Structured Streaming sketch aggregation test: file-source micro-batches
with applyInPandasWithState must converge to the same estimates as the
batch pipeline (late/out-of-order arrival is free for sketches — merge is
associative and value-idempotent)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_streaming_hll_matches_batch(spark, tmp_path):
    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sources.transcripts import (
        load_transcripts, write_transcripts_parquet)
    from zetasketch_spark.streaming.agg import streaming_sketch_agg

    # 3 files -> 3 micro-batches (incremental state updates)
    path = str(tmp_path / "stream_src")
    write_transcripts_parquet(path, n_turns=30_000, seed=7, rows_per_file=10_000)
    batch_df = load_transcripts(spark, path)
    schema = spark.read.parquet(path).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .select("role", "conv_id")
    )
    fam = HllFamily(precision=13, sparse_precision=16)
    out = streaming_sketch_agg(stream, ["role"], "conv_id", fam)
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName("hll_stream").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    final = (
        spark.sql("select * from hll_stream")
        .groupBy("role")
        .agg(F.max("rows_seen").alias("rows_seen"),
             F.last("estimate").alias("estimate"))
    )
    got = {r["role"]: r["estimate"] for r in
           spark.sql("""
             select role, estimate from (
               select role, estimate, rows_seen,
                      row_number() over (partition by role order by rows_seen desc) rk
               from hll_stream) where rk = 1
           """).collect()}

    from zetasketch_spark.operators.agg import hll_count_distinct
    want = {r["role"]: r["approx_distinct"] for r in
            hll_count_distinct(batch_df, ["role"], "conv_id", precision=13,
                               sparse_precision=16).collect()}
    assert got == want


def test_streaming_theta_matches_batch(spark, tmp_path):
    """The streaming fabric is family-generic: theta (KMV) group states
    converge to the batch-built states — same estimate, same retained-set
    size — after the last micro-batch."""
    import pandas as pd

    from zetasketch_spark.sketches.theta import ThetaSketch
    from zetasketch_spark.sources.transcripts import write_transcripts_parquet
    from zetasketch_spark.streaming.agg import streaming_sketch_agg
    from zetasketch_spark.sketches.theta import ThetaFamily

    path = str(tmp_path / "theta_src")
    write_transcripts_parquet(path, n_turns=30_000, seed=9, rows_per_file=10_000)
    schema = spark.read.parquet(path).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(path)
              .select("role", "conv_id"))
    fam = ThetaFamily(k=512)
    out = streaming_sketch_agg(stream, ["role"], "conv_id", fam)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("theta_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["role"]: r["estimate"] for r in
           spark.sql("""
             select role, estimate from (
               select role, estimate, rows_seen,
                      row_number() over (partition by role order by rows_seen desc) rk
               from theta_stream) where rk = 1
           """).collect()}

    batch = spark.read.parquet(path).select("role", "conv_id").toPandas()
    want = {}
    for role, grp in batch.groupby("role"):
        sk = ThetaSketch(k=512)
        sk.add_series(pd.Series(grp["conv_id"].astype(str)))
        want[role] = sk.estimate()
    assert got == want


def test_streaming_ddsketch_matches_batch_exactly(spark, tmp_path):
    """DDSketch through the streaming fabric: because bucket counts are
    pure addition, the state after the last micro-batch is BYTE-identical
    to a batch build over the same rows — so the quantile outputs must be
    EXACTLY equal, not merely convergent (the strongest stream==batch
    claim any family here can make)."""
    import pandas as pd
    import pyspark.sql.functions as F

    from zetasketch_spark.sketches.ddsketch import DDSketchFamily
    from zetasketch_spark.sources.transcripts import write_transcripts_parquet
    from zetasketch_spark.streaming.agg import streaming_sketch_agg

    path = str(tmp_path / "dd_src")
    write_transcripts_parquet(path, n_turns=30_000, seed=13,
                              rows_per_file=10_000)
    schema = spark.read.parquet(path).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(path)
              .select("role",
                      F.length("text").cast("double").alias("turn_len")))
    fam = DDSketchFamily(alpha=0.01, quantiles=(0.5, 0.99))
    out = streaming_sketch_agg(stream, ["role"], "turn_len", fam)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("dd_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["role"]: (r["q50"], r["q99"], r["n"]) for r in
           spark.sql("""
             select role, q50, q99, n from (
               select role, q50, q99, n, rows_seen,
                      row_number() over (partition by role
                                         order by rows_seen desc) rk
               from dd_stream) where rk = 1
           """).collect()}

    batch = (spark.read.parquet(path)
             .select("role", F.length("text").cast("double").alias("v"))
             .toPandas())
    for role, grp in batch.groupby("role"):
        sk = fam.make()
        fam.update(sk, grp["v"])
        assert got[role] == fam.result(sk), role


def test_streaming_countmin_matches_batch(spark, tmp_path):
    """Count-Min through the streaming fabric: heavy-hitter candidate
    counts converge to a single-threaded batch build (string-canonical
    key domain holds across micro-batches)."""
    import pandas as pd

    from zetasketch_spark.sketches.countmin import CountMinFamily, CountMinSketch
    from zetasketch_spark.sources.transcripts import write_transcripts_parquet
    from zetasketch_spark.streaming.agg import streaming_sketch_agg

    path = str(tmp_path / "cm_src")
    write_transcripts_parquet(path, n_turns=30_000, seed=11, rows_per_file=10_000)
    schema = spark.read.parquet(path).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(path)
              .select("role", "tool"))
    fam = CountMinFamily(width=1024, depth=5, max_candidates=64)
    out = streaming_sketch_agg(stream, ["role"], "tool", fam)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("cm_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # the fabric's result row for CM is (top keys); compare final states'
    # point queries instead: rebuild the final state per role from the
    # LAST update of each group is not exposed, so check the result cols
    got = {r["role"]: r for r in spark.sql("""
        select * from (
          select *, row_number() over (partition by role order by rows_seen desc) rk
          from cm_stream) where rk = 1
        """).collect()}

    batch = spark.read.parquet(path).select("role", "tool").toPandas()
    for role, grp in batch.groupby("role"):
        cm = CountMinSketch(width=1024, depth=5, max_candidates=64)
        cm.add_series(pd.Series(grp["tool"]))
        want = fam.result(cm)
        have = tuple(got[role][n] for n, _ in fam.result_fields)
        assert have == want, (role, have, want)


def test_streaming_restart_recovers_state(spark, tmp_path):

    """Kill the query between micro-batches and restart with the same
    checkpointLocation: the state store must restore the sketches and the
    final estimates must equal the batch answer."""
    from zetasketch_spark.operators.agg import hll_count_distinct
    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sources.transcripts import (
        load_transcripts, write_transcripts_parquet)
    from zetasketch_spark.streaming.agg import streaming_sketch_agg

    src = str(tmp_path / "rsrc")
    ckpt = str(tmp_path / "rckpt")
    write_transcripts_parquet(src, n_turns=30_000, seed=3, rows_per_file=10_000)
    schema = spark.read.parquet(src).schema
    fam = HllFamily(precision=12, sparse_precision=16)

    sink = str(tmp_path / "rsink")

    def write_batch(bdf, batch_id):
        bdf.write.mode("append").parquet(sink)

    def start(available_now=False):
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(src).select("role", "conv_id")
        )
        out = streaming_sketch_agg(stream, ["role"], "conv_id", fam)
        w = (out.writeStream.outputMode("update").foreachBatch(write_batch)
             .option("checkpointLocation", ckpt))
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    # phase 1: process at least one micro-batch, then stop mid-stream
    import time as _time

    q1 = start()
    deadline = _time.time() + 60
    while (q1.lastProgress is None or q1.lastProgress["numInputRows"] == 0):
        assert _time.time() < deadline, "stream made no progress in 60s"
        assert q1.exception() is None, q1.exception()
        q1.awaitTermination(1)
    q1.stop()
    q1.awaitTermination(30)

    # phase 2: restart from the checkpoint; availableNow drains the rest
    q2 = start(available_now=True)
    q2.awaitTermination(120)

    emitted = spark.read.parquet(sink)
    emitted.createOrReplaceTempView("hll_restart_sink")
    got = {r["role"]: r["estimate"] for r in spark.sql("""
        select role, estimate from (
          select *, row_number() over (partition by role order by rows_seen desc) rk
          from hll_restart_sink) where rk = 1
    """).collect()}
    batch = load_transcripts(spark, src)
    want = {r["role"]: r["approx_distinct"] for r in
            hll_count_distinct(batch, ["role"], "conv_id", precision=12,
                               sparse_precision=16).collect()}
    assert got == want


def test_streaming_windowed_with_watermark(spark, tmp_path):
    """Event-time windows + watermark: per-(window, role) sketches converge
    to the batch answer; out-of-order files (within watermark) fold in."""
    import pyspark.sql.functions as F

    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sources.transcripts import (
        load_transcripts, write_transcripts_parquet)
    from zetasketch_spark.streaming.agg import streaming_windowed_sketch_agg

    path = str(tmp_path / "wsrc")
    write_transcripts_parquet(path, n_turns=20_000, seed=11, rows_per_file=7_000)
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(path).select("role", "conv_id", "ts")
    )
    fam = HllFamily(precision=12, sparse_precision=16)
    out = streaming_windowed_sketch_agg(
        stream, ["role"], "conv_id", fam, ts_col="ts",
        window="1 day", watermark="365 days")
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("hll_windows").trigger(availableNow=True).start())
    q.awaitTermination(120)
    final = spark.sql("""
        select window_start, role, estimate from (
          select *, row_number() over (
            partition by window_start, role order by rows_seen desc) rk
          from hll_windows) where rk = 1
    """)
    got = {(str(r["window_start"]), r["role"]): r["estimate"] for r in final.collect()}

    batch = load_transcripts(spark, path)
    want_df = (
        batch.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("window_start", F.window("ts", "1 day")["start"])
        .groupBy("window_start", "role")
        .agg(F.countDistinct("conv_id").alias("n"))
    )
    want = {(str(r["window_start"]), r["role"]): r["n"] for r in want_df.collect()}
    assert set(got) == set(want)
    for k, n in want.items():
        assert abs(got[k] / n - 1) <= 0.1, (k, got[k], n)


def test_streaming_bloom_dedup_first_occurrence(spark, tmp_path):
    """Sharded-Bloom streaming dedup: across micro-batches each conv_id is
    emitted exactly once, and at this scale (Bloom far under capacity) no
    genuinely-new key is dropped."""
    from zetasketch_spark.sources.transcripts import write_transcripts_parquet
    from zetasketch_spark.streaming.agg import streaming_bloom_dedup

    path = str(tmp_path / "dedup_src")
    write_transcripts_parquet(path, n_turns=30_000, seed=11, rows_per_file=10_000)
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .select("conv_id", "turn_idx", "role")
    )
    out = streaming_bloom_dedup(stream, "conv_id", n_shards=8, m=1 << 18)
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName("dedup_stream").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select conv_id from dedup_stream").collect()
    seen = [r["conv_id"] for r in got]
    assert len(seen) == len(set(seen)), "a key was emitted twice"
    n_true = spark.read.parquet(path).select("conv_id").distinct().count()
    # Bloom fpr at this load is ~0 — all true keys must surface
    assert len(seen) == n_true


def test_streaming_state_bounded_by_timeout(spark, tmp_path):
    """The state_timeout caveat as a tested property: live state rows must
    track the ACTIVE window set, not the cumulative one — idle (closed)
    windows expire after the timeout. Runs under the RocksDB state store
    to verify the documented large-state configuration end-to-end."""
    import time

    import pandas as pd

    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.streaming.agg import streaming_windowed_sketch_agg

    src = tmp_path / "bounded_src"
    src.mkdir()
    roles = ["user", "assistant", "system"]

    def write_phase(i):
        ts = pd.Timestamp("2026-01-01") + pd.Timedelta(days=i)
        pdf = pd.DataFrame({
            "conv_id": [f"c{i}-{j}" for j in range(300)],
            "role": [roles[j % 3] for j in range(300)],
            "ts": [ts] * 300,
        })
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(str(src))

    write_phase(0)
    stream = (
        spark.readStream.schema("conv_id string, role string, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    fam = HllFamily(precision=12, sparse_precision=16)
    out = streaming_windowed_sketch_agg(
        stream, ["role"], "conv_id", fam, ts_col="ts",
        window="1 day", watermark="30 days",
        state_timeout_minutes=0.05)  # 3s: phases outlive the horizon

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, "org.apache.spark.sql.execution.streaming."
                                 "state.RocksDBStateStoreProvider")
    try:
        q = (out.writeStream.outputMode("update").format("memory")
             .queryName("bounded_state").trigger(processingTime="500 milliseconds")
             .start())
        try:
            def emitted():
                return spark.sql("select count(*) c from bounded_state").first()["c"]

            def state_rows():
                p = q.lastProgress
                if p and p.get("stateOperators"):
                    return p["stateOperators"][0]["numRowsTotal"]
                return None

            n_phases = 4
            max_seen = 0
            for phase in range(1, n_phases + 1):
                deadline = time.time() + 60
                while emitted() < 3 * phase:
                    assert q.exception() is None, q.exception()
                    assert time.time() < deadline, "phase made no progress in 60s"
                    time.sleep(0.3)
                max_seen = max(max_seen, state_rows() or 0)
                if phase < n_phases:
                    time.sleep(4)  # let the previous phase's windows expire
                    write_phase(phase)

            # drain: expiry happens on subsequent (possibly empty) batches
            deadline = time.time() + 60
            final = state_rows()
            while time.time() < deadline:
                final = state_rows()
                if final is not None and final <= 2 * len(roles):
                    break
                time.sleep(0.5)

            cumulative = n_phases * len(roles)  # 12 groups ever created
            assert final is not None
            assert final <= 2 * len(roles), (
                f"state not bounded: {final} live rows vs {cumulative} cumulative")
            assert max_seen >= len(roles)  # the operator really held state
        finally:
            q.stop()
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)


def test_streaming_contamination_filter(spark, tmp_path):
    """The contamination filter is stateless, so it drops benchmark-
    overlapping documents from a STREAM in-flight: contaminated rows never
    reach the sink, clean rows all pass."""
    import pandas as pd

    from zetasketch_spark.operators.decontaminate import (
        benchmark_shingle_bloom, contamination_filter)

    import numpy as np
    rng = np.random.default_rng(17)
    words = [f"tok{i}" for i in range(500)]

    def doc(n=40):
        return " ".join(rng.choice(words, size=n))

    bench = spark.createDataFrame(
        pd.DataFrame([(i, doc()) for i in range(5)], columns=["doc_id", "text"]))
    blob = benchmark_shingle_bloom(bench)
    bench_texts = [r["text"] for r in bench.collect()]

    src = tmp_path / "contam_src"
    clean_ids = list(range(100, 130))
    rows = [(i, doc()) for i in clean_ids]
    rows += [(200, bench_texts[0]), (201, bench_texts[3])]  # contaminated
    spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])) \
        .write.parquet(str(src))

    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(str(src)))
    out = contamination_filter(stream, blob, max_shared=2)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("contam_out").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("select doc_id from contam_out").collect()}
    assert 200 not in got and 201 not in got
    assert set(clean_ids) == got  # Bloom FPR ~0 at this load: no over-drop


def test_streaming_sessionization_matches_batch(spark, tmp_path):
    """sessionize_native is the streaming-capable form: the same
    session_window aggregate under a watermark, fed file-by-file,
    converges to the batch session set (complete mode closes sessions
    once the stream drains)."""
    import datetime as dt

    import pandas as pd
    import pyspark.sql.functions as F

    from zetasketch_spark.operators.sessionize import (
        sessionize, sessionize_native)

    rng = __import__("numpy").random.default_rng(23)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for uid in range(40):
        t = base
        for _ in range(int(rng.integers(3, 30))):
            t = t + dt.timedelta(seconds=int(rng.integers(10, 4000)))
            rows.append((uid, t))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    src = str(tmp_path / "sess_src")
    df = spark.createDataFrame(pdf)
    df.repartition(4).write.parquet(src)

    batch = sorted(
        map(tuple, sessionize(spark.read.parquet(src))
            .select("user", "session_start", "n_events").collect()))

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src)
              .withWatermark("ts", "10 minutes"))
    out = sessionize_native(stream)
    q = (out.writeStream.outputMode("complete").format("memory")
         .queryName("sessions").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql(
        "select user, session_start, n_events from sessions").collect()))
    assert got == batch and len(batch) > 40


def test_streaming_pii_scrub(spark, tmp_path):
    """pii_scrub is a pure projection, so it runs unchanged on a stream —
    the ingest-time scrub shape. Streamed output rows equal the batch
    scrub exactly."""
    import pandas as pd
    import pyspark.sql.functions as F

    from zetasketch_spark.functions.pii import pii_scrub, plant_pii

    src = str(tmp_path / "pii_src")
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(200),
        "text": [f"doc {i} body text" for i in range(200)],
    }))
    plant_pii(docs).repartition(4).write.parquet(src)

    batch = sorted(map(tuple, pii_scrub(spark.read.parquet(src))
                       .select("doc_id", "has_pii", "redacted").collect()))

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (pii_scrub(stream).select("doc_id", "has_pii", "redacted")
         .writeStream.outputMode("append").format("memory")
         .queryName("pii_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql(
        "select doc_id, has_pii, redacted from pii_stream").collect()))
    assert got == batch
    assert any(r[1] for r in got)  # planted PII present and detected


def test_streaming_countsketch_matches_batch_exactly(spark, tmp_path):
    """CountSketch through the streaming fabric: signed counters are pure
    addition, so — like DDSketch — the state after the last micro-batch
    is BYTE-identical to a batch build over the same rows, and the
    (f2_est, n) outputs must be EXACTLY equal, not merely convergent."""
    import pyspark.sql.functions as F

    from zetasketch_spark.sketches.countsketch import CountSketchFamily
    from zetasketch_spark.sources.transcripts import write_transcripts_parquet
    from zetasketch_spark.streaming.agg import streaming_sketch_agg

    path = str(tmp_path / "cs_src")
    write_transcripts_parquet(path, n_turns=30_000, seed=17,
                              rows_per_file=10_000)
    schema = spark.read.parquet(path).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(path)
              .select("role", "tool"))
    fam = CountSketchFamily(width=1024, depth=5)
    out = streaming_sketch_agg(stream, ["role"], "tool", fam)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("cs_stream").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["role"]: (r["f2_est"], r["n"]) for r in
           spark.sql("""
             select role, f2_est, n from (
               select role, f2_est, n, rows_seen,
                      row_number() over (partition by role
                                         order by rows_seen desc) rk
               from cs_stream) where rk = 1
           """).collect()}

    batch = spark.read.parquet(path).select("role", "tool").toPandas()
    for role, grp in batch.groupby("role"):
        sk = fam.make()
        fam.update(sk, grp["tool"])
        assert got[role] == fam.result(sk), role
