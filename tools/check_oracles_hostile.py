"""Hostile-environment replay of the driver's correctness gate.

Round 3 failed 7 gate rows that matched under every configuration the
builder and the judge could construct locally — the divergence lived in
the *driver's* environment (its TZ, session confs, partitioning, or
DuckDB build), not in the code. The round-4 fix made every gate output
order-free and integer/boolean/string-typed; this tool is the empirical
proof: it re-runs ALL queries() x oracle_sql() comparisons under a
matrix of deliberately-perturbed environments and requires that every
query's value hash is IDENTICAL across all of them (and that Spark
matches DuckDB within each).

Perturbation axes (each run picks one combination):
* process TZ (exported before JVM start, so java.util.TimeZone differs)
* spark.sql.session.timeZone
* spark.sql.shuffle.partitions (1 forces single-partition aggregation
  order; 97 forces a different partition count than the replica's 8)
* core count (local[1] vs local[N] — changes input split order)
* DuckDB thread count

Usage: python tools/check_oracles_hostile.py [--quick] [sf_dir] [scen1,scen2]
  --quick runs a 3-scenario subset for the inner loop; default is all 6.
Each scenario execs a fresh interpreter (the JVM TZ is frozen at first
SparkSession), emits JSON {query: hash}, and the parent asserts
cross-scenario equality. Expect "HOSTILE OK: <n> queries x <k>
scenarios, all hashes identical".
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SCENARIOS = {
    # name: (TZ env, session timeZone, shuffle partitions, cores, duck threads)
    "baseline-utc": ("UTC", "UTC", 8, 8, 4),
    "us-pacific": ("America/Los_Angeles", "America/Los_Angeles", 8, 8, 4),
    "kolkata-1part": ("Asia/Kolkata", "Asia/Kolkata", 1, 4, 1),
    "tokyo-97part-1core": ("Asia/Tokyo", "UTC", 97, 1, 8),
    "mixed-tz": ("America/New_York", "Australia/Sydney", 32, 8, 4),
    # cores=0 => a completely vanilla SparkSession.builder (no repo confs:
    # default ANSI mode, AQE, 200 shuffle partitions, local[*]) — the
    # closest replica of "the driver imports queries() into its own
    # session" available here.
    "vanilla-driver": ("UTC", "UTC", 200, 0, 4),
}

CHILD = r"""
import json, os, sys
sys.path.insert(0, os.getcwd())
import duckdb
import __spark_entry__ as entrymod
from zetasketch_spark.session import get_spark
from tools.check_oracles import frame_hash

sf_dir, tz_session, nshuf, cores, duckthreads = sys.argv[1:6]
if int(cores) == 0:
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[*]")
             .appName("hostile-vanilla").getOrCreate())
else:
    spark = get_spark(app="hostile", cpus=int(cores),
                      shuffle_partitions=int(nshuf))
spark.conf.set("spark.sql.session.timeZone", tz_session)
con = duckdb.connect()
con.execute(f"SET threads TO {int(duckthreads)}")
con.execute(f"SET TimeZone='{tz_session}'")
for t in entrymod.TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM "
        f"read_parquet('{sf_dir}/{t}.parquet')")
out = {}
oracles = entrymod.oracle_sql()
for name, fn in entrymod.queries().items():
    df = fn(spark, sf_dir)
    h_spark = frame_hash(df.columns, [tuple(r) for r in df.collect()])
    row = {"spark": h_spark}
    if name in oracles:
        res = con.execute(oracles[name])
        row["duck"] = frame_hash([d[0] for d in res.description],
                                 res.fetchall())
    out[name] = row
print("HOSTILE_JSON:" + json.dumps(out))
spark.stop()
"""


def run_scenario(name, cfg, sf_dir):
    tz_env, tz_session, nshuf, cores, duckthreads = cfg
    env = dict(os.environ, TZ=tz_env)
    p = subprocess.run(
        [sys.executable, "-c", CHILD, sf_dir, tz_session, str(nshuf),
         str(cores), str(duckthreads)],
        env=env, capture_output=True, text=True, timeout=1800)
    for line in p.stdout.splitlines():
        if line.startswith("HOSTILE_JSON:"):
            return json.loads(line[len("HOSTILE_JSON:"):])
    sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
    raise SystemExit(f"scenario {name} produced no result")


QUICK = ["baseline-utc", "kolkata-1part", "vanilla-driver"]


def main():
    args = [a for a in sys.argv[1:] if a != "--quick"]
    quick = "--quick" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    # --quick: 3-scenario subset (~8 min) for the inner loop — one TZ+DST
    # perturbation, the 1-partition ordering stress, and the vanilla
    # driver-style session; run the full matrix before round end
    only = (args[1].split(",") if len(args) > 1
            else QUICK if quick else list(SCENARIOS))
    results = {}
    for name in only:
        results[name] = run_scenario(name, SCENARIOS[name], sf_dir)
        n_ok = sum(1 for r in results[name].values()
                   if r.get("duck", r["spark"]) == r["spark"])
        print(f"scenario {name}: {n_ok}/{len(results[name])} "
              f"spark==duck (rows w/o oracle count as ok)")
    bad = []
    base = results[only[0]]
    for q in base:
        hashes = {s: results[s][q]["spark"] for s in only}
        if len(set(hashes.values())) != 1:
            bad.append((q, "cross-scenario spark drift", hashes))
        for s in only:
            r = results[s][q]
            if "duck" in r and r["duck"] != r["spark"]:
                bad.append((q, f"spark!=duck in {s}", r))
    if bad:
        for b in bad:
            print("FAIL", *b)
        return 1
    print(f"HOSTILE OK: {len(base)} queries x {len(only)} scenarios, "
          f"all hashes identical")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
