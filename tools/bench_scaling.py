"""Two-cluster-size scaling benchmark (BASELINE.json north_rule).

Runs the flagship sketch job — HLL++ approx COUNT DISTINCT conv_id per
(role, day) over the synthetic transcripts table — at two parallelism
levels (local[N] and local[4N]; the sandbox proxy for N vs 4N executors),
reports turns/sec at both plus scaling efficiency, and writes
BENCH/scaling_latest.json (BASELINE.md is hand-maintained).

Each level runs in a fresh SparkSession (JVM reuse would share caches);
the first run at each level is a warm-up, the best of `trials` is scored.

Usage: python tools/bench_scaling.py [n_turns] [N] [trials] [--multi]

``--multi`` scales the one-scan multi-sketch job instead (HLL distinct
conv_id + Count-Min tool heavy hitters + DDSketch length quantiles in a
single pass, `multi_sketch_agg_rdd`) and writes
BENCH/scaling_multi_latest.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from zetasketch_spark.session import get_spark
from zetasketch_spark.operators.fastscan import sketch_agg_rdd
from zetasketch_spark.sketches.base import HllFamily

cpus = {cpus}
spark = get_spark(app=f"scaling-{{cpus}}", cpus=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
fam = HllFamily(precision=15)
times = []
for trial in range({trials} + 1):
    t0 = time.time()
    out = sketch_agg_rdd(spark, {tdir!r}, ["role", "day"], "conv_id", fam,
                         derived_keys={{"day": ("to_date", "ts")}})
    n_groups = out.count()
    times.append(time.time() - t0)
best = min(times[1:])  # drop warm-up
print("RESULT " + json.dumps({{"cpus": cpus, "best_sec": best,
                              "all_sec": times, "groups": n_groups}}))
spark.stop()
"""


RUNNER_MULTI = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from zetasketch_spark.session import get_spark
from zetasketch_spark.operators.fastscan import multi_sketch_agg_rdd
from zetasketch_spark.sketches.base import HllFamily
from zetasketch_spark.sketches.countmin import CountMinFamily
from zetasketch_spark.sketches.ddsketch import DDSketchFamily

cpus = {cpus}
spark = get_spark(app=f"scaling-multi-{{cpus}}", cpus=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
times = []
for trial in range({trials} + 1):
    t0 = time.time()
    out = multi_sketch_agg_rdd(spark, {tdir!r}, ["role", "day"], {{
        "convs": ("conv_id", HllFamily(precision=15)),
        "tools": ("tool", CountMinFamily(width=4096, depth=5,
                                         max_candidates=256)),
        "lens": (("length", "text"),
                 DDSketchFamily(alpha=0.01, quantiles=(0.5, 0.9, 0.99))),
    }}, derived_keys={{"day": ("to_date", "ts")}})
    n_groups = out.count()
    times.append(time.time() - t0)
best = min(times[1:])  # drop warm-up
print("RESULT " + json.dumps({{"cpus": cpus, "best_sec": best,
                              "all_sec": times, "groups": n_groups}}))
spark.stop()
"""


def run_level(repo: str, tdir: str, cpus: int, trials: int,
              multi: bool = False) -> dict:
    tmpl = RUNNER_MULTI if multi else RUNNER
    code = tmpl.format(repo=repo, cpus=cpus, tdir=tdir, trials=trials)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")


def main():
    multi = "--multi" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--multi"]
    n_turns = int(args[0]) if len(args) > 0 else 600_000_000
    n_small = int(args[1]) if len(args) > 1 else 8
    trials = int(args[2]) if len(args) > 2 else 3
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    tdir = os.path.join(repo, "data", f"scaling_{n_turns // 1_000_000}m")

    from zetasketch_spark.sources.transcripts import write_transcripts_parquet
    write_transcripts_parquet(tdir, n_turns=n_turns, seed=42,
                              rows_per_file=10_000_000, text_mode="pool")

    small = run_level(repo, tdir, n_small, trials, multi)
    large = run_level(repo, tdir, n_small * 4, trials, multi)
    tp_small = n_turns / small["best_sec"]
    tp_large = n_turns / large["best_sec"]
    efficiency = tp_large / (4 * tp_small)
    report = {
        "job": ("one-scan multi-sketch: HLL(conv_id,p15) + CM(tool) + "
                "DDSketch(length(text)) by (role, day)") if multi
               else "hll_count_distinct(conv_id) by (role, day), p=15",
        "n_turns": n_turns,
        "small": {"cpus": small["cpus"], "sec": round(small["best_sec"], 2),
                  "turns_per_sec": int(tp_small)},
        "large": {"cpus": large["cpus"], "sec": round(large["best_sec"], 2),
                  "turns_per_sec": int(tp_large)},
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(report, indent=2))

    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    # Append-only: record the run as JSON next to BASELINE.md; the prose
    # document is hand-maintained (an earlier version of this tool
    # clobbered it wholesale).
    out_json = os.path.join(
        repo, "BENCH",
        "scaling_multi_latest.json" if multi else "scaling_latest.json")
    with open(out_json, "w") as f:
        json.dump({**report, "raw": {"small": small, "large": large}}, f,
                  indent=2)
    print("wrote", out_json, "- update the BENCH/BASELINE.md table by hand")


if __name__ == "__main__":
    main()
