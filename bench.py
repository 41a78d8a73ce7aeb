"""Benchmark harness. Runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line LAST on stdout: {"metric": ..., "value": total_sec,
"unit": "sec", "queries": {name: sec}, "sf": ..., "turns_per_sec": ...}.

The driver records only a ~2 KB tail of stdout; round 4's line outgrew it
(BENCH_r04.json came back "parsed": null), so the final line is now kept
under ~1.2 KB and the full per-section detail (sf1 rows, extra operator
rows, trial counts, regression baselines) is written to
BENCH/latest_full.json instead.

Also measures sketch-update throughput (turns/sec) on a deterministic
synthetic transcripts table (BASELINE.json north_rule metric); the
two-parallelism scaling run lives in tools/bench_scaling.py and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "top_customers",
    "events_summary",
    "events_daily_top",
    "revenue_filter",
    "docs_quality",
    "docs_fingerprints",
    "embedding_norms",
    "ann_cosine_topk",
    "hll_users_by_type",
    "hll_users_by_type_day",
    "cm_heavy_hitter_users",
    "kll_value_quantiles",
    "tdigest_value_quantiles",
    "bloom_membership",
    "minhash_near_dups",
    "simhash_near_dups",
]


def _ppid(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/stat") as fh:
            # field 4 (after the parenthesized comm, which may hold spaces)
            return int(fh.read().rpartition(")")[2].split()[1])
    except (OSError, ValueError, IndexError):
        return 0


def _is_descendant(pid: int, ancestor: int) -> bool:
    for _ in range(64):
        if pid in (0, 1):
            return False
        if pid == ancestor:
            return True
        pid = _ppid(pid)
    return False


def _box_is_solo() -> bool:
    """True when no FOREIGN Spark/JVM process is running on this box.
    Our own session JVM (and its python workers) are descendants of this
    process and don't count — this must hold for the end-of-run re-check,
    which runs while our session is still up."""
    me = os.getpid()
    others = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().decode("utf-8", "replace").replace("\0", " ")
        except OSError:
            continue
        if ("org.apache.spark" in cmd or "pyspark" in cmd) \
                and not _is_descendant(int(pid), me):
            others.append((pid, cmd[:120]))
    if others:
        print(f"# WARNING: {len(others)} concurrent Spark process(es) "
              f"detected — timings are contended, solo=false", file=sys.stderr)
    return not others


def _tail_parse(tail: str) -> dict:
    """Recover per-query baselines from a driver record whose captured
    stdout tail starts mid-JSON-line (BENCH_r04.json: "parsed": null).
    The flat sub-objects ("queries": {...}, "sf1_queries": {...}) and the
    scalar calibration row contain no nested braces, so a regex slice of
    each is itself valid JSON."""
    out = {}
    for key in ("queries", "sf1_queries"):
        m = re.search(r'"%s": (\{[^{}]*\})' % key, tail)
        if m:
            try:
                out[key] = json.loads(m.group(1))
            except ValueError:
                pass
    m = re.search(r'"calibration_sec": ([0-9.]+)', tail)
    if m:
        out["calibration_sec"] = float(m.group(1))
    return out


def load_prior_baseline(repo: str) -> dict:
    """Newest BENCH_r*.json as {queries, sf1_queries, calibration_sec,
    name} — reading, in order of preference: the driver's parsed object,
    a bare bench-line record, or the regex tail fallback."""
    prior = sorted((f for f in os.listdir(repo)
                    if re.fullmatch(r"BENCH_r\d+\.json", f)),
                   key=lambda f: int(re.search(r"\d+", f).group()))
    if not prior:
        return {}
    try:
        with open(os.path.join(repo, prior[-1])) as fh:
            rec = json.load(fh)
    except (OSError, ValueError):
        return {}
    if not isinstance(rec, dict):
        return {}
    out = {"name": prior[-1]}
    parsed = rec.get("parsed")
    src = parsed if isinstance(parsed, dict) else rec
    if src.get("queries"):
        for key in ("queries", "sf1_queries", "calibration_sec"):
            if src.get(key):
                out[key] = src[key]
    elif isinstance(rec.get("tail"), str):
        out.update(_tail_parse(rec["tail"]))
    # the compact final line (round 5+) points at the full-detail file —
    # an immutable per-run snapshot (full_<stamp>.json), so later local
    # bench runs can't mutate a recorded round's baselines. Prefer it
    # wholesale when readable: the compact line's queries dict may be
    # truncated to the 10 slowest rows by the size guard, and a per-key
    # "only if missing" merge would silently drop the other baselines.
    full = src.get("full") if isinstance(src, dict) else None
    if full:
        try:
            with open(os.path.join(repo, full)) as fh:
                detail = json.load(fh)
            for key in ("queries", "sf1_queries", "calibration_sec"):
                if detail.get(key):
                    out[key] = detail[key]
        except (OSError, ValueError):
            pass
    return out


def detect_regressions(timings: dict, base: dict, calibration: float,
                       prior_cal: float | None, solo: bool,
                       ratio: float = 1.5, abs_excess: float = 0.45) -> dict:
    """Round-over-round regression flags, box-speed aware.

    A slower box inflates every row at identical code: when the prior
    record carries the pure-JVM calibration row, its baselines are scaled
    by calibration/prior_cal before comparing. Pre-r4 records have no
    calibration row, so the box ratio is estimated as the MEDIAN
    now/baseline ratio over the stable (>0.2 s) rows — a machine change
    shifts every row by one common factor while a code regression shifts
    only its own row, so the median isolates the machine and a real
    regression still sticks out >`ratio`x above it.

    Contended boxes produce 1.5-2x inflation on every row — nothing is
    flagged from non-solo runs. Sub-second rows swing with page-cache
    state (measured 0.57-0.81 s across three solo runs of IDENTICAL code
    on a 0.33 s-baseline row — BENCH/BASELINE.md noise note), so a flag
    additionally needs `abs_excess` seconds above the scaled baseline.
    """
    if not solo or not base:
        return {}
    if prior_cal and prior_cal > 0 and calibration:
        box_ratio = calibration / prior_cal
    else:
        ratios = sorted(t / base[n] for n, t in timings.items()
                        if base.get(n, 0) > 0.2)
        box_ratio = ratios[len(ratios) // 2] if len(ratios) >= 5 else 1.0
    out = {}
    for name, t in timings.items():
        b = base.get(name)
        if (b and b > 0.2 and t > ratio * b * box_ratio
                and t - b * box_ratio > abs_excess):
            out[name] = {"baseline": b, "now": t,
                         "box_ratio": round(box_ratio, 2)}
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "10000000"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    import __spark_entry__ as entrymod
    from zetasketch_spark.session import get_spark

    # contention check BEFORE our own JVM starts: concurrent Spark jobs on
    # this box inflate UDAF-fabric rows 1.5-2x and false-fire the
    # regression detector (BENCH/BASELINE.md noise notes). The bench still
    # runs, but the JSON carries solo=false so readers can discount it.
    solo = _box_is_solo()

    spark = get_spark(app="zetasketch-bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    N_TRANSCRIPT_TRIALS = 4   # first trial often pays cold page cache; the
                              # string-hash kernel sees ±2x memory-bus noise
    N_HEADLINE_TRIALS = 2     # single trials carry ±50% machine noise
    N_SF1_TRIALS = 1

    # warm up the JVM + python worker pool so per-query times measure the
    # queries, not session startup
    import pyspark.sql.functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        # preload the hot kernels in every python worker so query timings
        # measure the operator, not module import
        import zetasketch_spark.hashing  # noqa: F401
        import zetasketch_spark.hll  # noqa: F401
        return s

    spark.range(10000, numPartitions=cpus).select(
        F.sum(_warm(F.col("id")))).collect()
    # touch the input tables once (untimed) so per-query numbers measure
    # compute, not first-read page-cache misses (count() alone is answered
    # from parquet metadata — hash every column to force real data reads)
    def _warm_tables(d):
        for t in ("documents", "embeddings", "events", "lineitem", "orders",
                  "customer"):
            tdf = spark.read.parquet(f"{d}/{t}.parquet")
            cols = [c for c in tdf.columns
                    if not str(tdf.schema[c].dataType).startswith("ArrayType")]
            tdf.select(F.count(F.xxhash64(*cols))).collect()

    _warm_tables(sf_dir)
    spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select(F.sum(F.size("embedding"))).collect()

    # box-speed calibration: a FIXED pure-JVM workload (whole-stage
    # codegen, no I/O, no Python) — identical bytes every round, so its
    # time moves only with the machine. Cross-round comparisons divide by
    # the calibration ratio before believing a "regression": round 4's
    # sandbox ran the same untouched JVM-only queries ~2x slower than
    # round 3's box at identical code (BENCH/BASELINE.md note).
    calibration = None
    for _ in range(3):
        t0 = time.time()
        spark.range(2_000_000_000, numPartitions=cpus).selectExpr(
            "sum(id * 3 + id % 7) AS s").collect()
        el = time.time() - t0
        calibration = el if calibration is None else min(calibration, el)

    # bench the pure operator versions: the gate versions carry an exact
    # twin computation (their verification payload), which would measure
    # the oracle rather than the operator
    qs = entrymod.bench_queries()
    timings: dict[str, float] = {}

    # sketch-update throughput on synthetic transcripts (turns/sec) via the
    # RDD execution fabric (see operators/fastscan.py for why)
    from zetasketch_spark.operators.fastscan import sketch_agg_rdd
    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sources.transcripts import write_transcripts_parquet

    tdir = os.environ.get(
        "SPARK_GRAFT_TRANSCRIPTS_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                     f"bench_transcripts_{n_turns // 1_000_000}m"))
    write_transcripts_parquet(tdir, n_turns=n_turns, seed=42,
                              rows_per_file=1_250_000)
    # untimed warm read of EVERY transcript column (same hygiene as
    # _warm_tables): the text column is ~10x the rest combined and is not
    # touched by the role_day row, so on a fresh box the text row's first
    # trial measures cold parquet page-cache fill (~5x), not hashing —
    # best-of-4 usually hides it, but not inside a slow-box window
    tw = spark.read.parquet(tdir)
    tw.select(F.count(F.xxhash64(*tw.columns))).collect()
    fam = HllFamily(precision=15)

    def _time_transcripts_role_day():
        t0 = time.time()
        sketch_agg_rdd(spark, tdir, ["role", "day"], "conv_id", fam,
                       derived_keys={"day": ("to_date", "ts")}).count()
        return time.time() - t0

    def _time_transcripts_text():
        t0 = time.time()
        sketch_agg_rdd(spark, tdir, ["role"], "text", fam).count()
        return time.time() - t0

    # named so the confirm pass (below) can re-measure a flagged
    # transcripts row the same way it re-measures a flagged headline row
    TRANSCRIPT_ROWS = {"transcripts_hll_role_day": _time_transcripts_role_day,
                       "transcripts_hll_text": _time_transcripts_text}
    best = min(_time_transcripts_role_day()
               for _ in range(N_TRANSCRIPT_TRIALS))
    timings["transcripts_hll_role_day"] = round(best, 3)
    turns_per_sec = int(n_turns / best)

    # north-star secondary metric: approx distinct of the full turn text
    best_txt = min(_time_transcripts_text()
                   for _ in range(N_TRANSCRIPT_TRIALS))
    timings["transcripts_hll_text"] = round(best_txt, 3)


    def _time_query(name, d):
        t0 = time.time()
        df = qs[name](spark, d)
        df.count() if hasattr(df, "count") else len(df)
        return time.time() - t0

    # best-of-2 per query, trials interleaved as FULL PASSES over the
    # list: this box's page-cache/compaction churn produces multi-second
    # transient slow WINDOWS that inflate several consecutive sub-second
    # queries at once (measured 2-3x on five adjacent rows in one run,
    # gone on the rerun) — back-to-back trials both land inside the
    # window; a second full pass lands outside it
    for _ in range(N_HEADLINE_TRIALS):
        for name in HEADLINE:
            dt = _time_query(name, sf_dir)
            timings[name] = round(min(dt, timings.get(name, dt)), 3)

    # round-3 additions, reported OUTSIDE the headline total so
    # round-over-round totals stay comparable with r01/r02
    EXTRA = ["docs_decontaminate", "docs_top_tokens", "minhash_boilerplate_cap",
             "docs_pii_scrub", "events_sessions", "docs_lm_quality",
             "docs_weighted_sample", "docs_pack_sequences", "docs_filter_report",
             "theta_set_ops", "docs_uniform_sample", "events_analyze",
             "join_profile", "events_skew_report", "docs_stratified_sample",
             "events_retention", "events_trending",
             "events_window_activity"]
    extra_timings: dict[str, float] = {}

    # the remaining north-star query shapes on the SAME transcripts table:
    # heavy-hitter tool frequencies (Count-Min) and turn-length quantiles
    # (KLL), via the DataFrame sketch-agg pipeline
    from zetasketch_spark.operators.agg import sketch_agg
    from zetasketch_spark.sketches.countmin import CountMinFamily
    from zetasketch_spark.sketches.kll import KllFamily
    from zetasketch_spark.sketches.theta import ThetaFamily

    from zetasketch_spark.sketches.countsketch import CountSketchFamily

    tdf = spark.read.parquet(tdir)
    for name, frame, col, fam in [
        ("transcripts_cm_tools", tdf, "tool",
         CountMinFamily(width=4096, depth=5, max_candidates=256)),
        # the unbiased signed-counter twin on the same scan shape
        ("transcripts_cs_tools", tdf, "tool",
         CountSketchFamily(width=4096, depth=5)),
    ]:
        best = None
        for _ in range(N_HEADLINE_TRIALS):
            t0 = time.time()
            sketch_agg(frame, ["role"], col, fam).count()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        extra_timings[name] = round(best, 3)

    # turn-length KLL over the RDD fast fabric with a derived value
    # (("length", "text")): the pandas-UDAF fabric paid the JVM->Python
    # Arrow boundary constant on this query (round-3 perf-weak finding)
    best = None
    for _ in range(N_HEADLINE_TRIALS):
        t0 = time.time()
        sketch_agg_rdd(spark, tdir, ["role"], ("length", "text"),
                       KllFamily(k=200, quantiles=(0.5, 0.9, 0.99))).count()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    extra_timings["transcripts_len_quantiles"] = round(best, 3)

    # relative-error turn-length quantiles (DDSketch, alpha=0.01) on the
    # same RDD fast fabric — the latency-metrics twin of the KLL row;
    # states are byte-identical across partitionings, so the merge tree
    # carries no accuracy cost at any cluster size
    from zetasketch_spark.sketches.ddsketch import DDSketchFamily

    best = None
    for _ in range(N_HEADLINE_TRIALS):
        t0 = time.time()
        sketch_agg_rdd(spark, tdir, ["role"], ("length", "text"),
                       DDSketchFamily(alpha=0.01,
                                      quantiles=(0.5, 0.9, 0.99))).count()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    extra_timings["transcripts_len_dd"] = round(best, 3)

    # theta over the RDD fast fabric: set-op-capable distinct at the
    # flagship throughput path (same scan shape as transcripts_hll_role_day)
    best = None
    for _ in range(N_HEADLINE_TRIALS):
        t0 = time.time()
        sketch_agg_rdd(spark, tdir, ["role"], "conv_id",
                       ThetaFamily(k=4096)).count()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    extra_timings["transcripts_theta_conv"] = round(best, 3)

    # the daily-rollup shape: HLL distinct + CM heavy hitters + DDSketch
    # length quantiles in ONE scan (multi_sketch_agg_rdd) — at 100 TB this
    # replaces three full table scans; compare against the sum of the
    # single-family rows above
    from zetasketch_spark.operators.fastscan import multi_sketch_agg_rdd
    from zetasketch_spark.sketches.ddsketch import DDSketchFamily

    best = None
    for _ in range(N_HEADLINE_TRIALS):
        t0 = time.time()
        multi_sketch_agg_rdd(spark, tdir, ["role"], {
            "convs": ("conv_id", HllFamily(precision=15)),
            "tools": ("tool", CountMinFamily(width=4096, depth=5,
                                             max_candidates=256)),
            "lens": (("length", "text"),
                     DDSketchFamily(alpha=0.01, quantiles=(0.5, 0.9, 0.99))),
        }).count()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    extra_timings["transcripts_multi_one_scan"] = round(best, 3)
    for name in EXTRA:
        best = None
        for _ in range(N_HEADLINE_TRIALS):  # same noise floor as headline
            el = _time_query(name, sf_dir)
            best = el if best is None else min(best, el)
        extra_timings[name] = round(best, 3)

    # incremental sketch-table maintenance (operators/incremental.py): fold
    # a ~10% delta of the 10M-turn table into a snapshot built from the
    # other ~90%, vs rebuilding from the full history through the same
    # pandas/Arrow fabric. The delta row tracking the delta size (not the
    # history) is the O(delta + n_keys) claim, measured.
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from zetasketch_spark.operators.incremental import SketchTable

    inc_dir = tempfile.mkdtemp(prefix="zs_inc_tbl_")
    try:
        shard = F.pmod(F.crc32(F.col("conv_id")), F.lit(10))
        table = SketchTable(inc_dir, ["role"], "conv_id", HllFamily(precision=15))
        table.update(spark, tdf.filter(shard != 0), fingerprint="history")  # setup
        t0 = time.time()
        table.update(spark, tdf.filter(shard == 0), fingerprint="delta")
        extra_timings["incremental_delta_update"] = round(time.time() - t0, 3)
        t0 = time.time()
        sketch_agg(tdf, ["role"], "conv_id", HllFamily(precision=15)).count()
        extra_timings["incremental_full_rebuild"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(inc_dir, ignore_errors=True)

    # Bloom semi-join prefilter (operators/bloomjoin.py) vs the plain
    # join on the same selective key set. At this scale the small side
    # broadcasts exactly, so the pair MEASURES THE PREFILTER'S FIXED
    # OVERHEAD (digest build + the ~1 s per-stage Python probe constant,
    # see fastscan.py notes) — the regime the operator exists for
    # (key side too big to broadcast, fact shuffle dominates) cannot
    # occur at sf0.1; the paired rows pin that the overhead stays a
    # small constant, not a multiple of the data.
    from zetasketch_spark.operators.bloomjoin import bloom_join

    li_b = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    urg = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
           .filter(F.col("o_orderpriority") == "1-URGENT")
           .select("o_orderkey"))
    best_b = best_p = None
    for _ in range(N_HEADLINE_TRIALS):
        t0 = time.time()
        bloom_join(li_b, urg, "l_orderkey", "o_orderkey")[0].count()
        el = time.time() - t0
        best_b = el if best_b is None else min(best_b, el)
        t0 = time.time()
        li_b.join(urg, on=li_b["l_orderkey"] == urg["o_orderkey"],
                  how="inner").count()
        el = time.time() - t0
        best_p = el if best_p is None else min(best_p, el)
    extra_timings["bloom_join_urgent"] = round(best_b, 3)
    extra_timings["plain_join_urgent"] = round(best_p, 3)

    # sketch-driven balanced range repartition (operators/rangepart.py):
    # KLL boundary planning + the full physical exchange. The noop sink
    # executes the whole plan JVM-side (a bare count() could elide the
    # repartition; .rdd would pickle every row into Python)
    from zetasketch_spark.operators.rangepart import \
        repartition_by_sketch_range

    best = None
    for _ in range(N_HEADLINE_TRIALS):
        t0 = time.time()
        (repartition_by_sketch_range(
            li_b, "l_extendedprice", 32,
            salt_cols=["l_orderkey", "l_linenumber"])
         .write.format("noop").mode("overwrite").save())
        el = time.time() - t0
        best = el if best is None else min(best, el)
    extra_timings["sketch_range_repartition"] = round(best, 3)

    # paired reference: Spark's own sampling-based repartitionByRange on
    # the same column — parity here means the sketch path's boundary
    # planning costs no more than the built-in's sampling pass, while
    # its boundaries are reusable (ANALYZE/SketchTable) and its hot-key
    # salting has no built-in equivalent
    best = None
    for _ in range(N_HEADLINE_TRIALS):
        t0 = time.time()
        (li_b.repartitionByRange(32, F.col("l_extendedprice"))
         .write.format("noop").mode("overwrite").save())
        el = time.time() - t0
        best = el if best is None else min(best, el)
    extra_timings["spark_range_repartition"] = round(best, 3)

    # sf1 section (10x data, deterministic, generated once into data/sf1):
    # measures the kernels instead of the sandbox's fixed per-stage costs.
    # Disable with SPARK_GRAFT_SF1=0.
    sf1_timings: dict[str, float] = {}
    # the near-dup rows carry a measured ±2x single-trial band (r3 6.4/7.9 s
    # vs r4 10.6/10.3 s at byte-identical code — VERDICT r4), which made a
    # real regression there invisible: best-of-3 narrows the band so the
    # detector can fire (and provably not false-fire) on them
    SF1_NEARDUP_TRIALS = {"minhash_near_dups": 3, "simhash_near_dups": 3}
    if os.environ.get("SPARK_GRAFT_SF1", "1") == "1":
        from tools.make_sf1 import make_sf1

        sf1_dir = make_sf1(src_dir=sf_dir)
        _warm_tables(sf1_dir)
        for name in HEADLINE:
            best = None
            for _ in range(SF1_NEARDUP_TRIALS.get(name, N_SF1_TRIALS)):
                el = _time_query(name, sf1_dir)
                best = el if best is None else min(best, el)
            sf1_timings[name] = round(best, 3)

    # headline total keeps the r01 definition (HEADLINE queries + the
    # role/day transcripts measurement); the full-text transcripts row is
    # reported separately so round-over-round totals stay comparable
    total = round(sum(v for k, v in timings.items()
                      if k != "transcripts_hll_text"), 3)

    # re-sample contention AFTER the timed sections: a job that started
    # mid-bench contends the later rows even though t=0 looked clean
    solo = solo and _box_is_solo()

    # round-over-round regression flagging: compare per-query times against
    # the newest BENCH_r*.json (tail-parsed if the driver capture was
    # truncated) and surface anything >1.5x slower, box-speed adjusted
    repo = os.path.dirname(os.path.abspath(__file__))
    prior = load_prior_baseline(repo)
    prior_cal = prior.get("calibration_sec")
    regressions = detect_regressions(timings, prior.get("queries", {}),
                                     calibration, prior_cal, solo)
    # confirm pass: a candidate flag must survive a fresh re-measure of
    # JUST that query (tables re-warmed) — transient slow windows flag
    # different untouched rows run-to-run; a real code regression
    # reproduces every time. Covers the transcripts fabric rows too: they
    # are measured before the headline loop, so a cold-cache window there
    # used to stick in the record with no second chance (the recurring
    # transcripts_hll_role_day false flag, adjudicated in BENCH/BASELINE.md)
    confirm = [n for n in regressions if n in qs or n in TRANSCRIPT_ROWS]
    if confirm:
        _warm_tables(sf_dir)
        if any(n in TRANSCRIPT_ROWS for n in confirm):
            tw.select(F.count(F.xxhash64(*tw.columns))).collect()
        for name in confirm:
            timer = TRANSCRIPT_ROWS.get(name) or (
                lambda name=name: _time_query(name, sf_dir))
            for _ in range(2):
                timings[name] = round(min(timings[name], timer()), 3)
        if "transcripts_hll_role_day" in confirm:
            turns_per_sec = int(n_turns / timings["transcripts_hll_role_day"])
        total = round(sum(v for k, v in timings.items()
                          if k != "transcripts_hll_text"), 3)
        regressions = detect_regressions(timings, prior.get("queries", {}),
                                         calibration, prior_cal, solo)
    # the sf1 near-dup rows are best-of-3 from this round on; flag them
    # round-over-round too (prefixed so readers see the section)
    regressions.update({
        f"sf1:{k}": v for k, v in detect_regressions(
            sf1_timings, prior.get("sf1_queries", {}),
            calibration, prior_cal, solo).items()
        if k in SF1_NEARDUP_TRIALS})

    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "turns_per_sec": turns_per_sec,
        "bench_turns": n_turns,
        "cpus": cpus,
        "baseline_round": prior.get("name"),
        "regressions": regressions,
        "calibration_sec": round(calibration, 3),
        "solo": solo,
        "sf1_queries": sf1_timings,
        "sf1_total": round(sum(sf1_timings.values()), 3),
        "extra_queries": extra_timings,
        "extra_total": round(sum(extra_timings.values()), 3),
        "trials": {"headline_sf": N_HEADLINE_TRIALS, "sf1": N_SF1_TRIALS,
                   "sf1_neardup": 3, "transcripts": N_TRANSCRIPT_TRIALS},
    }
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    # IMMUTABLE per-run snapshot: the compact line's "full" pointer must
    # survive later local runs (latest_full.json is overwritten by every
    # run, incl. the SPARK_GRAFT_SF1=0 quick loop, which would wipe the
    # recorded round's sf1 baselines), so each run also writes its own
    # timestamped file and points the record at THAT
    full_name = os.path.join(
        "BENCH", time.strftime("full_%Y%m%dT%H%M%SZ.json", time.gmtime()))
    for path in (os.path.join(repo, "BENCH", "latest_full.json"),
                 os.path.join(repo, full_name)):
        with open(path, "w") as fh:
            json.dump(detail, fh, indent=1)

    # the COMPACT summary is the LAST stdout line: the driver records only
    # a ~2 KB stdout tail and parses the final line (round 4's full line
    # outgrew it -> "parsed": null). Keep this under 1.2 KB (CLAUDE.md
    # invariant) so the rest of the tail margin stays free.
    compact = {k: detail[k] for k in
               ("metric", "value", "unit", "queries", "sf", "turns_per_sec",
                "cpus", "calibration_sec", "solo", "sf1_total",
                "extra_total")}
    compact["n_regressions"] = len(regressions)
    if regressions:  # names only; baselines live in the detail file
        compact["regressed"] = sorted(regressions)[:4]
    compact["full"] = full_name
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1200:  # hard guard: never outgrow the capture again
        compact["queries"] = {k: v for k, v in sorted(
            compact["queries"].items(), key=lambda kv: -kv[1])[:10]}
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
