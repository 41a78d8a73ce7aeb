"""spark-submit entry point: approximate COUNT DISTINCT over transcripts.

Usage (north_rule shape)::

    python tools/make_pyfiles_zip.py   # build dist/zetasketch_spark.zip
    spark-submit --master local[32] \
        --py-files dist/zetasketch_spark.zip \
        jobs/transcripts_hll_job.py \
        --input data/bench_transcripts --keys role,day --col conv_id \
        --precision 15 --checkpoint-dir /tmp/hll_ckpt --output /tmp/hll_out

Writes the result as parquet, checkpoints per-partition partial states with
lineage + metrics (resumable: re-running skips completed partitions).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet directory")
    ap.add_argument("--keys", default="role", help="comma-separated group keys; "
                    "'day' is derived from ts")
    ap.add_argument("--col", default="conv_id")
    ap.add_argument("--precision", type=int, default=15)
    ap.add_argument("--sparse-precision", type=int, default=None)
    ap.add_argument("--family", default="hll",
                    choices=["hll", "theta", "kll", "tdigest", "ddsketch",
                             "countmin", "bloom", "countsketch"],
                    help="sketch family; hll takes --precision/"
                         "--sparse-precision, theta takes --k, the rest "
                         "use their defaults (kll/tdigest/ddsketch need a "
                         "numeric --col; countsketch surfaces the group's "
                         "AMS F2 second moment)")
    ap.add_argument("--k", type=int, default=4096, help="theta nominal size")
    ap.add_argument("--alpha", type=float, default=0.01,
                    help="ddsketch relative-error bound")
    ap.add_argument("--multi", default=None, metavar="SPEC",
                    help="one-scan multi-sketch mode (fastscan."
                         "multi_sketch_agg_rdd): comma-separated "
                         "name=family:col entries, e.g. "
                         "'convs=hll:conv_id,tools=countmin:tool,"
                         "lens=ddsketch:length(text)'; every family is "
                         "computed from a SINGLE pass over --input. "
                         "Ignores --col/--family; with --sketch-table DIR "
                         "the one scan maintains a persistent table per "
                         "spec under DIR/<name>; incompatible with "
                         "--checkpoint-dir")
    ap.add_argument("--trending", action="store_true",
                    help="time-decayed top keys instead of a sketch "
                         "aggregation (operators/trending.py): ranks "
                         "--col by the exact dyadic decayed score "
                         "2^(--cap - age_halflives) of each row's ts, "
                         "certified by a weighted Count-Min; ignores "
                         "--keys/--family")
    ap.add_argument("--half-life", type=int, default=7, metavar="DAYS",
                    help="with --trending: decay half-life in days")
    ap.add_argument("--cap", type=int, default=40,
                    help="with --trending: max age in half-lives (rows "
                         "older contribute 0; keep cap + log2(rows) < 63)")
    ap.add_argument("--top", type=int, default=10,
                    help="with --trending: number of keys to report")
    ap.add_argument("--retention", action="store_true",
                    help="day-over-day retention/churn report instead of "
                         "a sketch aggregation (operators/retention.py): "
                         "per-day theta sketches of --col from one scan; "
                         "ignores --keys/--family; --horizons picks the "
                         "cohort offsets")
    ap.add_argument("--window-activity", action="store_true",
                    help="trailing-window distinct-activity report from "
                         "ONE temporal theta sketch per --keys group "
                         "(operators/window_distinct.py): distinct --col "
                         "values last seen within each --windows span "
                         "ending at --as-of (default: the data's max day)")
    ap.add_argument("--windows", default="1,7,30",
                    help="with --window-activity: comma-separated trailing "
                         "window lengths in days")
    ap.add_argument("--as-of", default=None, metavar="YYYY-MM-DD",
                    help="with --window-activity: report anchor day. "
                         "SUFFIX SEMANTICS with a historical anchor: the "
                         "(first,last)-timestamp summary answers the OPEN "
                         "suffix [as-of - W + 1, inf) — keys last/first "
                         "seen AFTER --as-of still count, so counts are "
                         "upper bounds on the bounded historical window "
                         "(exact with the default anchor = max data day)")
    ap.add_argument("--horizons", default="1",
                    help="with --retention: comma-separated day offsets, "
                         "e.g. '1,7,30' for the cohort curve")
    ap.add_argument("--output", default=None)
    ap.add_argument("--tree-levels", type=int, default=1)
    # the two persistence modes are exclusive: --checkpoint-dir resumes a
    # ONE-SHOT aggregation, --sketch-table folds the input as a delta into
    # a persistent snapshot table (passing both used to silently ignore
    # the checkpoint dir)
    mode = ap.add_mutually_exclusive_group()
    mode.add_argument("--checkpoint-dir", default=None)
    mode.add_argument("--sketch-table", default=None,
                      help="maintain a persistent (keys -> sketch) snapshot "
                           "table at this directory instead of a one-shot "
                           "aggregation: --input is treated as the arriving "
                           "delta and folded in (idempotent per input "
                           "fingerprint; see operators/incremental.py)")
    ap.add_argument("--vacuum-keep", type=int, default=0, metavar="N",
                    help="with --sketch-table: after the fold, "
                         "garbage-collect snapshot versions, keeping the "
                         "newest N (replay idempotence is preserved via "
                         "the compacted log checkpoint); 0 = never vacuum")
    args = ap.parse_args(argv)
    if args.vacuum_keep > 0 and not args.sketch_table:
        ap.error("--vacuum-keep only applies to --sketch-table mode "
                 "(nothing to vacuum otherwise)")
    if args.multi and args.checkpoint_dir:
        ap.error("--multi cannot be combined with --checkpoint-dir "
                 "(partition-resume checkpoints are single-family); "
                 "use --multi with --sketch-table for persistent "
                 "multi-family maintenance")
    if args.trending and (args.multi or args.sketch_table
                          or args.checkpoint_dir):
        ap.error("--trending is a one-shot ranked report; it cannot be "
                 "combined with --multi / --sketch-table / "
                 "--checkpoint-dir")
    if args.retention and (args.trending or args.multi or args.sketch_table
                           or args.checkpoint_dir):
        ap.error("--retention is a one-shot report; it cannot be combined "
                 "with --trending / --multi / --sketch-table / "
                 "--checkpoint-dir")
    if args.window_activity and (args.retention or args.trending
                                 or args.multi or args.sketch_table
                                 or args.checkpoint_dir):
        ap.error("--window-activity is a one-shot report; it cannot be "
                 "combined with --retention / --trending / --multi / "
                 "--sketch-table / --checkpoint-dir")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("zetasketch-hll").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from zetasketch_spark.sketches.base import HllFamily
    from zetasketch_spark.sources.tables import with_day
    from zetasketch_spark.sources.transcripts import load_transcripts

    def make_family(name: str):
        if name == "hll":
            return HllFamily(precision=args.precision,
                             sparse_precision=args.sparse_precision)
        from zetasketch_spark.sketches.base import get_family

        extra = {"theta": {"k": args.k},
                 "ddsketch": {"alpha": args.alpha}}.get(name, {})
        return get_family(name, **extra)

    keys = [k.strip() for k in args.keys.split(",") if k.strip()]

    if args.window_activity:
        from zetasketch_spark.operators.window_distinct import (
            window_activity_report,
        )

        windows = tuple(int(w) for w in args.windows.split(","))
        result = window_activity_report(
            load_transcripts(spark, args.input), args.col, "ts",
            k=args.k, windows=windows, as_of=args.as_of, group_keys=keys)
        if args.output:
            result.write.mode("overwrite").parquet(args.output)
            print(f"WROTE {args.output}")
        else:
            for row in result.orderBy(*keys, "window_days").collect():
                print("ROW " + json.dumps(
                    {k: str(row[k]) for k in row.asDict()}))
        spark.stop()
        return

    if args.retention:
        from zetasketch_spark.operators.retention import retention_report
        from zetasketch_spark.sources.transcripts import load_transcripts

        horizons = tuple(int(h) for h in args.horizons.split(","))
        result = retention_report(load_transcripts(spark, args.input),
                                  args.col, "ts", k=args.k,
                                  horizons=horizons)
        if args.output:
            result.write.mode("overwrite").parquet(args.output)
            print(f"WROTE {args.output}")
        else:
            for row in result.orderBy("horizon", "day_prev").collect():
                print("ROW " + json.dumps(
                    {k: str(row[k]) for k in row.asDict()}))
        spark.stop()
        return

    if args.trending:
        from zetasketch_spark.operators.trending import decayed_topk_verified
        from zetasketch_spark.sources.transcripts import load_transcripts

        result = decayed_topk_verified(
            load_transcripts(spark, args.input), args.col, "ts",
            k=args.top, half_life_days=args.half_life, cap=args.cap)
        if args.output:
            result.write.mode("overwrite").parquet(args.output)
            print(f"WROTE {args.output}")
        else:
            for row in result.orderBy("rank").collect():
                print("ROW " + json.dumps(
                    {k: str(row[k]) for k in row.asDict()}))
        spark.stop()
        return

    if args.multi:
        specs = {}
        for entry in args.multi.split(","):
            entry = entry.strip()
            try:
                name, rest = entry.split("=", 1)
                family, col = rest.split(":", 1)
            except ValueError:
                ap.error(f"--multi entry {entry!r} is not name=family:col")
            if family.strip() == "timetheta":
                # needs (key, time) PAIRS — the one-column scan stage
                # would die with a worker-side TypeError much later
                ap.error("--multi cannot build 'timetheta' (it updates "
                         "from (key, time) pairs); use --window-activity "
                         "for the trailing-window activity report")
            if col.startswith("length(") and col.endswith(")"):
                col = ("length", col[len("length("):-1])
            specs[name.strip()] = (col, make_family(family.strip()))

        if args.sketch_table:
            # persistent mode: one delta scan maintains one SketchTable
            # per spec under <table-dir>/<name> (shared fingerprint —
            # exactly-once per table even across crash-interrupted runs)
            import os as _os

            from zetasketch_spark.operators.checkpoint import (
                input_fingerprint)
            from zetasketch_spark.operators.incremental import (
                SketchTable, update_tables)
            from zetasketch_spark.sources.tables import with_day
            from zetasketch_spark.sources.transcripts import load_transcripts

            df = load_transcripts(spark, args.input)
            if "day" in keys:
                df = with_day(df)
            tables = {}
            for name, (col, fam2) in specs.items():
                if isinstance(col, tuple):
                    # materialize the derived value as a stable column so
                    # the table identity stays a plain (keys, col, family)
                    mat = f"__{col[0]}_{col[1]}"
                    if mat not in df.columns:
                        from pyspark.sql import functions as _F

                        df = df.withColumn(
                            mat, _F.length(col[1]).cast("double"))
                    col = mat
                tables[name] = SketchTable(
                    _os.path.join(args.sketch_table, name), keys, col, fam2)
            metrics = update_tables(
                spark, df, tables,
                fingerprint=input_fingerprint([args.input]),
                tree_levels=args.tree_levels)
            print("METRICS " + json.dumps(metrics))
            if args.vacuum_keep > 0:
                print("VACUUM " + json.dumps(
                    {n: t.vacuum(keep_versions=args.vacuum_keep)
                     for n, t in tables.items()}))
            if args.output:
                for name, t in tables.items():
                    t.results(spark).write.mode("overwrite").parquet(
                        _os.path.join(args.output, name))
                print(f"WROTE {args.output}")
            spark.stop()
            return

        from zetasketch_spark.operators.fastscan import multi_sketch_agg_rdd

        dk = {"day": ("to_date", "ts")} if "day" in keys else None
        result = multi_sketch_agg_rdd(spark, args.input, keys, specs,
                                      derived_keys=dk)
        if args.output:
            result.write.mode("overwrite").parquet(args.output)
            print(f"WROTE {args.output}")
        else:
            for row in result.orderBy(*keys).collect():
                print("ROW " + json.dumps(
                    {k: str(row[k]) for k in row.asDict()}))
        spark.stop()
        return

    fam = make_family(args.family)

    df = load_transcripts(spark, args.input)
    if "day" in keys:
        df = with_day(df)

    if args.sketch_table:
        from zetasketch_spark.operators.checkpoint import input_fingerprint
        from zetasketch_spark.operators.incremental import SketchTable

        table = SketchTable(args.sketch_table, keys, args.col, fam)
        metrics = table.update(spark, df,
                               fingerprint=input_fingerprint([args.input]),
                               tree_levels=args.tree_levels)
        print("METRICS " + json.dumps(metrics))
        if args.vacuum_keep > 0:
            print("VACUUM " + json.dumps(
                table.vacuum(keep_versions=args.vacuum_keep)))
        result = table.results(spark)
    elif args.checkpoint_dir:
        from zetasketch_spark.operators.checkpoint import checkpointed_sketch_agg

        result, metrics = checkpointed_sketch_agg(
            spark, df, keys, args.col, fam, args.checkpoint_dir,
            [args.input], job="transcripts_hll", tree_levels=args.tree_levels)
        print("METRICS " + json.dumps(metrics))
    else:
        from zetasketch_spark.operators.agg import sketch_agg

        result = sketch_agg(df, keys, args.col, fam,
                            tree_levels=args.tree_levels)

    if args.output:
        result.write.mode("overwrite").parquet(args.output)
        print(f"WROTE {args.output}")
    else:
        for row in result.orderBy(*keys).collect():
            print("ROW " + json.dumps({k: str(row[k]) for k in row.asDict()}))
    spark.stop()


if __name__ == "__main__":
    main()
