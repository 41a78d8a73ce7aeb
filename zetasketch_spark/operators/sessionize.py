"""Sessionization: split each user's event stream into sessions separated
by an inactivity gap, as pure Catalyst plans.

Two equivalent constructions (tested equal):

* ``sessionize`` — gaps-and-islands: ``lag`` + running sum of
  new-session flags over a per-user window. One shuffle on the user key,
  one in-partition sort; identical SQL runs on any engine, which is what
  the DuckDB oracle pins.
* ``sessionize_native`` — Spark's built-in ``session_window`` aggregate,
  the same physical shape but usable in Structured Streaming with a
  watermark (late-data-safe session merging is handled by the state
  store).

Scale: both shuffle once on ``user_col``. Skewed users (one key with
millions of events) bound the task size — the window sort is O(n log n)
per key but stays in-executor; for adversarial skew, pre-split by
(user, day) first and merge adjacent sessions across the seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
               gap_s: int = 1800) -> DataFrame:
    """Per-session rows ``(user, session_id, session_start, session_end,
    n_events, duration_s)``. A new session starts when the gap since the
    user's previous event exceeds ``gap_s`` seconds (strictly greater,
    matching ``session_window``'s closed-open semantics)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    ts = F.col(ts_col).cast("timestamp")
    prev = F.lag(ts).over(w)
    new_session = (prev.isNull()
                   | (ts.cast("double") - prev.cast("double") > gap_s))
    sess = (df
            .withColumn("_new", new_session.cast("long"))
            .withColumn("session_id",
                        F.sum("_new").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy(F.col(user_col).alias("user"), "session_id")
            .agg(F.min(ts).alias("session_start"),
                 F.max(ts).alias("session_end"),
                 F.count("*").alias("n_events"),
                 (F.max(ts).cast("double")
                  - F.min(ts).cast("double")).alias("duration_s")))


def sessionize_native(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", gap_s: int = 1800) -> DataFrame:
    """Same sessions via Spark's ``session_window`` aggregate (the
    streaming-capable form; add ``withWatermark`` upstream for streams).
    Emits the same columns as :func:`sessionize` except ``session_id``
    (the native form identifies sessions by their window, not an
    ordinal)."""
    ts = F.col(ts_col).cast("timestamp")
    return (df
            .withColumn("_ts", ts)
            .groupBy(F.col(user_col).alias("user"),
                     F.session_window("_ts", f"{gap_s} seconds"))
            .agg(F.min("_ts").alias("session_start"),
                 F.max("_ts").alias("session_end"),
                 F.count("*").alias("n_events"))
            .withColumn("duration_s",
                        F.col("session_end").cast("double")
                        - F.col("session_start").cast("double"))
            .drop("session_window"))
