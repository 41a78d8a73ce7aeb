"""Strict pandas-path dtype audit for the driver gate.

The driver's canonicalization is dtype-sensitive through pandas: DuckDB's
``fetchdf()`` converts HUGEINT (the result type of any integer ``sum``)
to float64, so ``12345`` on the Spark side hashes differently from
``12345.0`` on the oracle side even though ``fetchall()`` (the old
check_oracles path) returns a plain int. Round-3 postmortem: the seven
driver hash-red queries were exactly the seven whose oracles contained an
uncast integer sum.

This audit runs every queries()/oracle_sql() pair through BOTH engines'
pandas conversions and demands:
  * identical pandas dtype per column (sorted by name), and
  * identical canonical values.

Usage: python tools/audit_dtypes.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd


def canon_cell(v):
    """Dtype-sensitive canonicalization (stricter than check_oracles)."""
    import datetime
    import math

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date, pd.Timestamp)):
        return v.isoformat()
    return str(v)


def frame_lines(df: pd.DataFrame) -> list[str]:
    df = df[sorted(df.columns)]
    lines = sorted(
        "|".join(canon_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return lines


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import duckdb

    import __spark_entry__ as entrymod
    from zetasketch_spark.session import get_spark

    spark = get_spark(app="dtype-audit", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle")
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            bad.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            bad.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        el = time.time() - t0
        probs = []
        if sorted(sdf.columns) != sorted(odf.columns):
            probs.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        else:
            for c in sorted(sdf.columns):
                ds, do = str(sdf[c].dtype), str(odf[c].dtype)
                if ds != do:
                    probs.append(f"dtype[{c}]: spark={ds} duckdb={do}")
            if len(sdf) != len(odf):
                probs.append(f"rows {len(sdf)} != {len(odf)}")
            # any all-null-free numeric column must not be object dtype
            for c in sorted(sdf.columns):
                if str(sdf[c].dtype) == "object" and len(sdf) and isinstance(
                    sdf[c].iloc[0], (int, float)
                ):
                    probs.append(f"object-dtype numeric col {c} (spark)")
        if not probs:
            l1, l2 = frame_lines(sdf), frame_lines(odf)
            if l1 != l2:
                probs.append("value hash mismatch")
                for a, b in zip(l1, l2):
                    if a != b:
                        probs.append(f"  spark:  {a}")
                        probs.append(f"  duckdb: {b}")
                        break
        if probs:
            bad.append(name)
            print(f"FAIL  {name}: " + "; ".join(probs[:1]))
            for p in probs[1:]:
                print("      " + p)
        else:
            print(f"OK    {name}: {len(sdf)} rows, {el:.1f}s")
    n = len([q for q in qs if q in oracles and (not only or q in only)])
    print(f"\n{n - len(bad)}/{n} strict-ok; failures: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
