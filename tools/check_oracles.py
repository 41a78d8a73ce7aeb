"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and, where oracle_sql() has a match, on DuckDB; compare
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [--only name1,name2]

Scale note: the gate contract is sf0.01 (the driver's comparison scale),
but as of round 4 every certificate boolean is scale-free (true by
construction at any sf when the operator is correct) — the round-3
simhash `no_false_positives` flag asserted a claim simhash theory does
not make and honestly failed off the gate scale; it is now
`candidates_sound` (every emitted pair truly at signature Hamming <= k,
normalized, duplicate-free — the precision theorem simhash DOES make).
50/50 verified at sf0.001, sf0.01 AND sf0.1.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def canon(val):
    import datetime
    import math

    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        if val == int(val) and abs(val) < 1e15:
            return repr(float(val))
        return repr(val)
    if isinstance(val, bool):
        return str(val).lower()
    if isinstance(val, (datetime.datetime, datetime.date)):
        return val.isoformat()
    return str(val)


def frame_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main():
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        if i + 1 >= len(args):
            raise SystemExit("usage: check_oracles.py [sf_dir] "
                             "--only name1,name2")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import duckdb

    import __spark_entry__ as entrymod
    from zetasketch_spark.session import get_spark

    spark = get_spark(app="oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    if only:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit(f"--only names not in queries(): {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows, {el:.1f}s (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols {sorted(cols)} != {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} != {len(orows)}")
        if not problems:
            h1, h2 = frame_hash(cols, rows), frame_hash(ocols, orows)
            if h1 != h2:
                problems.append(f"hash {h1} != {h2}")
                # show first differing line for debugging
                order1 = sorted(range(len(cols)), key=lambda i: cols[i])
                order2 = sorted(range(len(ocols)), key=lambda i: ocols[i])
                l1 = sorted("|".join(canon(r[i]) for i in order1) for r in rows)
                l2 = sorted("|".join(canon(r[i]) for i in order2) for r in orows)
                for a, b in zip(l1, l2):
                    if a != b:
                        problems.append(f"  spark:  {a}")
                        problems.append(f"  duckdb: {b}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
        else:
            print(f"OK    {name}: {len(rows)} rows, {el:.1f}s")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} ok; failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
