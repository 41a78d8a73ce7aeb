"""Measured crossover for the r5 perf-weak pair (VERDICT items 1-2):

1. `bloom_join` vs the plain join in the regime the operator exists for:
   a WIDE-payload fact table (the 10M-turn transcripts table, ~3.7 GB
   parquet with a ~600 B text column) joined against a key side PAST
   broadcast comfort (5M keys, ~tens of MB estimated — Spark plans a
   sort-merge join and shuffles every fact byte) at low match
   selectivity (~2% of conversations). The Bloom prefilter drops
   definitely-non-matching fact rows BEFORE the exchange, so the shuffle
   carries ~2% of the payload. Records wall-clock AND shuffle bytes.

2. `repartition_by_sketch_range` vs Spark's sampling-based
   `repartitionByRange` on a zipf-skewed key (the transcripts conv_id
   turn counts are Zipf(1.2)): KLL-boundary buckets with hot-key salting
   vs the built-in (which cannot split an equal-key run). Records
   wall-clock and the max-task/ideal balance of the resulting exchange.

Writes BENCH/crossover_<stamp>.json and prints a summary. Run solo:
    python tools/bench_crossover.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def _sql_metrics(mark, appid, after_id):
    sqls = json.load(urllib.request.urlopen(
        f"{mark}/api/v1/applications/{appid}/sql?details=true"
        "&planDescription=false&length=200"))
    shuffle_bytes = 0
    for s in sqls:
        if s["id"] <= after_id:
            continue
        for n in s.get("nodes", []):
            for m in n.get("metrics", []):
                if m["name"] == "shuffle bytes written":
                    v = m["value"].split("\n")[-1].strip()
                    # "total (min, med, max ...)\n1234.0 MiB (..)" forms
                    tok = v.replace(",", "").split(" ")
                    try:
                        num = float(tok[0])
                    except ValueError:
                        continue
                    unit = tok[1] if len(tok) > 1 else "B"
                    mult = {"B": 1, "KiB": 2**10, "MiB": 2**20,
                            "GiB": 2**30}.get(unit, 1)
                    shuffle_bytes += int(num * mult)
    return shuffle_bytes


def main():
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    from zetasketch_spark.operators.bloomjoin import bloom_join
    from zetasketch_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="crossover", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    mark = spark.sparkContext.uiWebUrl
    appid = json.load(urllib.request.urlopen(
        f"{mark}/api/v1/applications"))[0]["id"]

    tdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "bench_transcripts_10m")
    fact = spark.read.parquet(tdir)  # conv_id, turn_idx, role, text, ...
    # key side: ~2% of real conversations + 5M absent keys -> ~5M rows,
    # far past broadcast comfort, low fact-row selectivity
    real = (fact.select("conv_id").distinct()
            .filter(F.pmod(F.crc32("conv_id"), F.lit(50)) == 0))
    absent = spark.range(5_000_000).select(
        F.concat(F.lit("absent-"), F.col("id")).alias("conv_id"))
    keys = real.union(absent).localCheckpoint(eager=True)
    n_keys = keys.count()

    fact.select(F.count(F.xxhash64("conv_id", "text"))).collect()  # warm

    results = {"n_keys": n_keys, "fact_rows": fact.count()}

    def _no_broadcast(run):
        # REGIME SIMULATION, honestly labeled: on this 128 GiB box Spark
        # happily broadcasts even a 5M-row key side (measured: plain join
        # shuffles 0 bytes), so the prefilter's regime — a key side past
        # the 8 GB / 512M-row broadcast cap — cannot physically occur
        # here. Disabling auto-broadcast reproduces the plan a cluster is
        # FORCED into at 10^8-10^9 keys: a sort-merge join that shuffles
        # the fact side. Both contenders run under the same conf.
        def wrapped():
            conf = spark.conf
            old_t = conf.get("spark.sql.autoBroadcastJoinThreshold")
            old_a = conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold",
                             None)
            conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
            try:
                run()
            finally:
                conf.set("spark.sql.autoBroadcastJoinThreshold", old_t)
                if old_a is None:
                    conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
                else:
                    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                             old_a)
        return wrapped

    def _plain():
        fact.join(keys.withColumnRenamed("conv_id", "k"),
                  on=F.col("conv_id") == F.col("k"), how="inner") \
            .write.format("noop").mode("overwrite").save()

    def _bloom():
        bloom_join(fact, keys.withColumnRenamed("conv_id", "k"),
                   "conv_id", "k", n_hint=n_keys)[0] \
            .write.format("noop").mode("overwrite").save()

    for name, run in [
        ("plain_join", _plain),
        ("bloom_join", _bloom),
        ("plain_join_nobroadcast", _no_broadcast(_plain)),
        ("bloom_join_nobroadcast", _no_broadcast(_bloom)),
    ]:
        best = None
        sh = None
        for _ in range(2):
            sqls = json.load(urllib.request.urlopen(
                f"{mark}/api/v1/applications/{appid}/sql?length=200"))
            nb = max((s["id"] for s in sqls), default=-1)
            spark.sparkContext.setJobDescription(f"crossover:{name}")
            t0 = time.time()
            run()
            el = time.time() - t0
            if best is None or el < best:
                best = el
                sh = _sql_metrics(mark, appid, nb)
        results[name] = {"best_sec": round(best, 2),
                         "shuffle_bytes": sh,
                         "shuffle_mb": round(sh / 2**20, 1)}
        print(name, results[name], flush=True)

    # --- rangepart on the zipf-skewed conv_id turn counts --------------
    from zetasketch_spark.operators.rangepart import (
        BUCKET_COL, assign_range_buckets, kll_boundaries,
        repartition_by_sketch_range)

    skewed = fact.select(F.crc32("conv_id").cast("double").alias("v"),
                         "conv_id", "turn_idx", "text")
    # hot key: one value owning ~2% of rows — the regime range
    # partitioning cannot split without salting. Derived lazily (an eager
    # checkpoint of 10M wide rows thrashed the driver-local heap).
    hot_v = F.when(F.pmod(F.crc32("conv_id"), F.lit(10)) == 0, F.lit(1.0))
    sk = fact.select(F.coalesce(hot_v,
                                F.crc32("conv_id").cast("double")).alias("v"),
                     "conv_id", "turn_idx", "text")
    sk.select(F.count(F.xxhash64("v"))).collect()
    for name, run in [
        ("spark_range", lambda: sk.repartitionByRange(cpus, F.col("v"))
            .write.format("noop").mode("overwrite").save()),
        ("sketch_range", lambda: repartition_by_sketch_range(
            sk, "v", cpus, salt_cols=["conv_id", "turn_idx"])
            .write.format("noop").mode("overwrite").save()),
    ]:
        best = None
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"crossover:{name}")
            t0 = time.time()
            run()
            best = min(best or 9e9, time.time() - t0)
        results[name] = {"best_sec": round(best, 2)}
        print(name, results[name], flush=True)
    # balance audit: max bucket share vs ideal under the hot key
    b = kll_boundaries(sk, "v", cpus)
    counts = (assign_range_buckets(sk, "v", b,
                                   salt_cols=["conv_id", "turn_idx"])
              .groupBy(BUCKET_COL).count().collect())
    sizes = [r["count"] for r in counts]
    ideal = sum(sizes) / cpus
    results["sketch_range_balance"] = {
        "max_over_ideal": round(max(sizes) / ideal, 3),
        "buckets_used": len(sizes)}
    # Spark's own range partitioning with the same hot key, for contrast
    spark_sizes = (sk.repartitionByRange(cpus, F.col("v"))
                   .withColumn("p", F.spark_partition_id())
                   .groupBy("p").count().collect())
    ssz = [r["count"] for r in spark_sizes]
    results["spark_range_balance"] = {
        "max_over_ideal": round(max(ssz) / (sum(ssz) / cpus), 3),
        "buckets_used": len(ssz)}
    print("balance:", results["sketch_range_balance"],
          "vs spark:", results["spark_range_balance"], flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH",
        time.strftime("crossover_%Y%m%dT%H%M%SZ.json", time.gmtime()))
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
