"""Optimization-round profiling harness (NOT the driver bench — bench.py
is frozen for measurement; this file exists per the optimization guide
§1.4 to isolate per-query cost and capture plans).

Usage:
    python bench_extra.py [--sf-dir DIR] [--queries a,b,c] [--trials N]
                          [--plans plans/r06 --suffix before]
                          [--transcripts] [--extras]

Times each named bench query with the same methodology as bench.py
(df.count(), best-of-N, warmed tables) and optionally writes
.explain("formatted") to <plans>/<query>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--plans", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--transcripts", action="store_true")
    ap.add_argument("--ui", action="store_true",
                    help="enable the Spark UI for stage inspection")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if args.ui:
        os.environ["SPARK_GRAFT_UI"] = "1"

    import __spark_entry__ as entrymod
    from zetasketch_spark.session import get_spark

    spark = get_spark(app="zetasketch-bench-extra", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        import zetasketch_spark.hashing  # noqa: F401
        import zetasketch_spark.hll  # noqa: F401
        return s

    spark.range(10000, numPartitions=cpus).select(
        F.sum(_warm(F.col("id")))).collect()

    def _warm_tables(d):
        for t in ("documents", "embeddings", "events", "lineitem", "orders",
                  "customer"):
            tdf = spark.read.parquet(f"{d}/{t}.parquet")
            cols = [c for c in tdf.columns
                    if not str(tdf.schema[c].dataType).startswith("ArrayType")]
            tdf.select(F.count(F.xxhash64(*cols))).collect()

    _warm_tables(args.sf_dir)
    spark.read.parquet(f"{args.sf_dir}/embeddings.parquet") \
        .select(F.sum(F.size("embedding"))).collect()

    qs = entrymod.bench_queries()
    names = [n for n in args.queries.split(",") if n]

    out = {}
    for name in names:
        if name not in qs:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            if hasattr(df, "_jdf"):
                with open(os.path.join(
                        args.plans, f"{name}_{args.suffix}.txt"), "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
        best = None
        samples = []
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            df.count() if hasattr(df, "count") else len(df)
            el = time.time() - t0
            samples.append(round(el, 3))
            best = el if best is None else min(best, el)
        out[name] = {"best": round(best, 3), "samples": samples}
        print(f"{name}: best={best:.3f} samples={samples}", flush=True)

    if args.transcripts:
        from zetasketch_spark.operators.fastscan import sketch_agg_rdd
        from zetasketch_spark.sketches.base import HllFamily
        from zetasketch_spark.sources.transcripts import \
            write_transcripts_parquet

        n_turns = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "10000000"))
        tdir = os.environ.get(
            "SPARK_GRAFT_TRANSCRIPTS_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                         f"bench_transcripts_{n_turns // 1_000_000}m"))
        write_transcripts_parquet(tdir, n_turns=n_turns, seed=42,
                                  rows_per_file=1_250_000)
        tw = spark.read.parquet(tdir)
        tw.select(F.count(F.xxhash64(*tw.columns))).collect()
        fam = HllFamily(precision=15)
        for name, fn in {
            "transcripts_hll_role_day": lambda: sketch_agg_rdd(
                spark, tdir, ["role", "day"], "conv_id", fam,
                derived_keys={"day": ("to_date", "ts")}).count(),
            "transcripts_hll_text": lambda: sketch_agg_rdd(
                spark, tdir, ["role"], "text", fam).count(),
        }.items():
            best = None
            samples = []
            for _ in range(args.trials):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                fn()
                el = time.time() - t0
                samples.append(round(el, 3))
                best = el if best is None else min(best, el)
            out[name] = {"best": round(best, 3), "samples": samples}
            print(f"{name}: best={best:.3f} samples={samples}", flush=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
