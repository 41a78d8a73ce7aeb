"""Sketch-powered ANALYZE TABLE: per-column statistics in ONE scan.

Planning-grade column statistics — approximate distinct count for every
column, quantiles for numeric columns, null counts and row count — all
from a single pass over the table via the multi-sketch fabric
(`operators/multi.py`). At 100 TB the scan dominates; a per-column
ANALYZE loop would re-read the table N times for N columns. Here every
executor updates all sketches per Arrow batch, and only the fixed-size
sketch states (KiB per column) travel to the merge stage, so cost is
one scan + one O(columns) shuffle regardless of row count.

The final reshape (wide single row -> one row per column) happens on
exactly one collected row of sketch states — bounded by construction,
independent of table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, ByteType, DateType, DoubleType, FloatType, IntegerType,
    LongType, ShortType, StringType, TimestampType)

from zetasketch_spark.operators.multi import multi_sketch_agg
from zetasketch_spark.sketches.base import HllFamily
from zetasketch_spark.sketches.kll import KllFamily

_NUMERIC = (ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
_QUANTILES = (0.25, 0.5, 0.75)


def _ref(df, name: str):
    """Exact-name column reference: backtick-quote names containing dots
    (JSON ingestion) so neither F.col nor df[...] parses a nested path."""
    if "." in name or "`" in name:
        return F.col("`" + name.replace("`", "``") + "`")
    return df[name]


def group_count_estimate(df: DataFrame, cols: list[str],
                         k: int = 4096) -> tuple[int, float]:
    """How many groups would ``GROUP BY cols`` produce? The number that
    sizes shuffle partitions and decides whether a two-level merge is
    worth it — answered BEFORE the aggregation at theta cost: a
    US-separated tuple rendering with a NUL null-sentinel and a
    per-partition theta partial pass with NO shuffle
    (`joinprofile._global_theta`). Returns ``(estimate, rse)``.

    Rendering caveat (shared with `tuple_distinct_col`): values
    containing the U+001F separator, or a literal '\\u0000N' string,
    can collide with a neighboring tuple / the null sentinel — both are
    control-character patterns that don't occur in normal key columns;
    if yours can contain them, pre-escape the columns."""
    from zetasketch_spark.operators.joinprofile import _global_theta

    # GROUP BY keeps (1, NULL) and (NULL, 1) as DISTINCT groups, so nulls
    # get a sentinel — tuple_distinct_col's concat_ws would collapse both
    # to '1' (right for COUNT(DISTINCT a, b) companions, wrong here)
    rendered = [F.coalesce(_ref(df, c).cast("string"), F.lit("\u0000N"))
                for c in cols]
    keyed = df.select(F.concat_ws("\u001f", *rendered).alias("__k"))
    sk = _global_theta(keyed, "__k", k)
    return sk.estimate(), sk.rse()


class _HllWithN(HllFamily):
    """HLL that also reports how many non-null values it absorbed
    (`HllSketch.num_values`, the reference's numValues) — null counts per
    column then fall out of rows_seen - n with no extra aggregation."""

    result_fields = [("estimate", "bigint"), ("n", "bigint")]

    def result(self, state):
        return (int(state.estimate()), int(state.num_values))


def analyze_table(df: DataFrame, cols: list[str] | None = None,
                  precision: int = 13, kll_k: int = 200) -> DataFrame:
    """One-scan column statistics. Returns one row per analyzed column:

    ``column, n_rows, n_nulls, approx_distinct, q25, q50, q75``

    (quantiles NULL for non-numeric columns). ``approx_distinct`` is an
    HLL++ estimate at ``precision`` (envelope 1.04/sqrt(2^p)); quantiles
    come from a KLL sketch at ``kll_k`` (normalized rank error ~1.5/k).
    """
    spark = df.sparkSession
    if cols is None:
        cols = [f.name for f in df.schema.fields
                if not str(f.dataType).startswith(("ArrayType", "MapType",
                                                   "StructType", "BinaryType"))]
    # resolve requested names: exact match first, then case-insensitive
    # ONLY when unambiguous (a case-sensitive schema with 'A' and 'a'
    # must never silently attribute one column's stats to the other)
    names = [f.name for f in df.schema.fields]
    lowered: dict[str, list[str]] = {}
    for nm in names:
        lowered.setdefault(nm.lower(), []).append(nm)
    resolved = []
    for c in cols:
        if c in names:
            resolved.append(c)
            continue
        cands = lowered.get(c.lower(), [])
        if len(cands) == 1:
            resolved.append(cands[0])
        elif not cands:
            raise ValueError(
                f"analyze_table: no column {c!r}; table has {names}")
        else:
            raise ValueError(
                f"analyze_table: {c!r} is case-ambiguous between {cands}")
    cols = resolved
    by_name = {f.name: f.dataType for f in df.schema.fields}
    numeric = {c for c in cols if isinstance(by_name[c], _NUMERIC)}
    # types the HLL Arrow kernel hashes natively; everything else
    # (decimal, ...) distinct-counts through its string form — a
    # deterministic cast, so the estimate is over the same value set
    hashable = (_NUMERIC + (StringType, TimestampType, DateType, BooleanType))

    specs = {}
    proj = []
    # positional internal names: user column names (dots, unicode, spec
    # suffix collisions) never leak into spec/result column identifiers
    safe_of = {c: f"c{i}" for i, c in enumerate(cols)}
    for c in cols:
        safe = safe_of[c]
        if isinstance(by_name[c], hashable):
            proj.append(_ref(df, c).alias(safe))
        else:
            proj.append(_ref(df, c).cast("string").alias(safe))
        specs[f"{safe}__d"] = (safe, _HllWithN(precision=precision))
        if c in numeric:
            qcol = f"{safe}__num"
            proj.append(_ref(df, c).cast("double").alias(qcol))
            specs[f"{safe}__q"] = (qcol, KllFamily(k=kll_k, quantiles=_QUANTILES))

    got = multi_sketch_agg(
        df.select(*proj).withColumn("__g", F.lit(1)), ["__g"], specs
    ).collect()  # at most one row: the global group
    if not got:  # empty table: all-zero stats, no quantiles
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame([(c, 0, 0, 0, None, None, None) for c in cols],
                         columns=["column", "n_rows", "n_nulls",
                                  "approx_distinct", "q25", "q50", "q75"])
            .astype({"q25": "float64", "q50": "float64", "q75": "float64"}))
    wide = got[0]

    # n_rows comes from the fabric's rows_seen; per-column null counts
    # fall out of the sketches' own num_values (non-null values absorbed),
    # so NOTHING here needed a second scan
    n_rows = int(wide["rows_seen"])
    rows = []
    for c in cols:
        safe = safe_of[c]
        q = [None, None, None]
        if c in numeric:
            q = [float(wide[f"{safe}__q_q{round(p * 100):02d}"]) for p in _QUANTILES]
        rows.append((c, n_rows, n_rows - int(wide[f"{safe}__d_n"]),
                     int(wide[f"{safe}__d_estimate"]), *q))
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["column", "n_rows", "n_nulls",
                                    "approx_distinct", "q25", "q50", "q75"])
        .astype({"q25": "float64", "q50": "float64", "q75": "float64"}))
