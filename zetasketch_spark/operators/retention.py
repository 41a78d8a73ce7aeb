"""Day-over-day retention / churn from daily theta sketches.

The product-analytics question behind the north-star's "distinct
conv_id/user per role and time bucket": *of the users active on day d,
how many came back on day d+1, how many churned, how many on d+1 are
new?* Exactly (COUNT DISTINCT self-joins per day pair) this is
O(days²·users) and re-scans the table per pair; with theta (KMV)
sketches it is ONE scan — per-day partials, ≤ fan_in merge — and every
set operation happens driver-side on k-sized samples, because theta
sketches (unlike HLL) support DIRECT intersection / difference with
per-op error estimates (`sketches/theta.py:132,143`).

Estimates carry the KMV relative standard error of the FINAL sample
(`rse = sqrt(1/(kept-1))` on the intersection's own retained-hash
count), so each row is self-describing: retained/churned/new are
point estimates, `rse` bounds them.

Scale shape: the per-day sketch table is bounded (days × k hashes);
the scan itself is the same salted partial→merge tree every family
uses (no shuffle of raw keys; hot days absorb into partials)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_SCHEMA = ("horizon int, day_prev string, day string, active_prev bigint, "
           "active bigint, retained bigint, new_users bigint, "
           "churned bigint, retention_rate double, rse double")


def retention_report(df: DataFrame, key_col: str, ts_col: str,
                     k: int = 4096, horizons=(1,),
                     group_keys=()) -> DataFrame:
    """One row per (horizon h, calendar day pair d -> d+h) present in
    the data: ``active_prev/active`` (per-day distinct estimates),
    ``retained`` (|prev ∩ cur|), ``new_users`` (|cur ∖ prev|),
    ``churned`` (|prev ∖ cur|), ``retention_rate`` = retained /
    active_prev, and the intersection sample's rse. The default
    ``horizons=(1,)`` is day-over-day; ``(1, 7, 30)`` yields the
    classic cohort retention curve — all horizons reuse the SAME
    one-scan daily sketches, so extra horizons cost only driver-side
    set ops on k-sized samples. Pairs whose d+h day is absent from the
    data emit nothing; inputs without any matching pair return an
    empty frame.

    ``group_keys`` (e.g. ``["role"]``) computes an independent curve per
    group — the north-star "per role and time bucket" shape: daily
    sketches are built per (group, day) in the same one scan, and the
    pairwise set ops stay driver-side because groups × days × k hashes
    is bounded by the schema and the calendar, not the data. Group
    values are rendered as strings in the report (nulls as '(null)')."""
    import datetime

    from zetasketch_spark.operators.agg import (collect_merged_states,
                                                sketch_partial)
    from zetasketch_spark.sketches.theta import ThetaFamily

    spark = df.sparkSession
    fam = ThetaFamily(k=k)
    gcols = list(group_keys)
    keyed = df.select(
        *[F.coalesce(F.col(g).cast("string"), F.lit("(null)")).alias(g)
          for g in gcols],
        F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
        F.col(key_col)).filter(F.col("day").isNotNull())
    # bounded driver state: (groups x days) sketches of k hashes each,
    # so the pairwise set ops run driver-side on k-sized hash samples.
    # collect_merged_states folds partials driver-side under its fan_in
    # bound (r6: the distributed merge was one more Python crossing to
    # produce the same handful of states) and tree-merges beyond it.
    states = collect_merged_states(
        sketch_partial(keyed, [*gcols, "day"], key_col, fam),
        [*gcols, "day"], fam)
    sketches: dict[tuple, dict[str, object]] = {}
    for key, s in states.items():
        sketches.setdefault(key[:-1], {})[key[-1]] = s

    rows = []
    for h in sorted({int(h) for h in horizons}):
        if h < 1:
            raise ValueError(f"horizons must be >= 1 day, got {h}")
        for g in sorted(sketches):
            by_day = sketches[g]
            for prev in sorted(by_day):
                cur = (datetime.date.fromisoformat(prev)
                       + datetime.timedelta(days=h)).isoformat()
                if cur not in by_day:
                    continue
                a, b = by_day[prev], by_day[cur]
                inter = a.intersect(b)
                retained = inter.estimate()
                active_prev = a.estimate()
                rows.append([
                    *g, h, prev, cur, active_prev, b.estimate(), retained,
                    b.a_not_b(a).estimate(), a.a_not_b(b).estimate(),
                    float(retained / active_prev) if active_prev else 0.0,
                    float(inter.rse()),
                ])
    schema = ", ".join([f"`{g}` string" for g in gcols] + [_SCHEMA])
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=[*gcols,
                                    *[c.split()[0] for c in
                                      _SCHEMA.split(", ")]])
        if rows else [], schema=schema)
