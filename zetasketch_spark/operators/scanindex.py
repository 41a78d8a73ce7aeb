"""Sketch-accelerated scan pruning: a per-file Bloom + min/max index.

The zone-map / Bloom-index pattern (Graefe's small materialized
aggregates; the same role as Iceberg/Delta file-level column stats and
parquet bloom filters, built here from this library's own Bloom sketch):
for a selective point or IN-list predicate on a high-cardinality,
unsorted key column, parquet min/max row-group stats prune almost
nothing — every file's [min, max] spans the key space. A tiny per-file
Bloom filter answers "can this FILE contain key v?" with zero false
negatives, so a 100 TB table lookup touches only the files that might
match instead of all of them.

Why this shape scales:

* **Build** is two column-pruned scans of the indexed column only
  (``input_file_name()`` + count/min/max, then the Bloom build through
  the standard ``sketch_agg`` fabric), shuffling on the file name — one
  compact row per data file. The index for an 800k-file table is 800k
  rows of a few KB each: a metadata-scale table, stored as parquet.
* **Probe** is a job over the index rows (never the data): one Bloom
  deserialize per row, vectorized membership over the broadcast probe
  values. Only matching file PATHS are collected — bounded by the match
  count, and additionally by ``max_kept_fraction``: when pruning would
  keep more than that fraction of files, the probe returns "scan
  everything" instead of collecting a giant path list that saves
  nothing.
* **Zero false negatives** (the Bloom guarantee + min/max are both
  conservative), so ``pruned_read(...)`` is provably equal to the
  full-scan filter for ``col IN values`` / ``lo <= col <= hi`` — the
  invariant the tests and the gate row assert.

Intended workloads: point lookups, decontamination-probe IN-lists, and
range slices, with probe lists up to ~10^4 values (the values ride to
executors as a broadcast and are checked vectorized per index row). For
probe SETS at data scale use ``operators/decontaminate.py``'s broadcast
Bloom join instead — that is the row-level twin of this file-level
index.

Nulls: SQL ``IN`` and range predicates never match NULL, so null values
are correctly invisible to the index (they are dropped by the sketch
fabric and ignored by min/max).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from zetasketch_spark.operators.agg import (
    ROWS_COL,
    SKETCH_COL,
    sketch_merge,
    sketch_partial,
)
from zetasketch_spark.sketches.bloom import BloomFamily, optimal_params

_FILE_COL = "_sgi_file"


def build_scan_index(spark: SparkSession, table_path: str, col: str,
                     index_dir: str, fpr: float = 0.01) -> dict:
    """Build a per-file (bloom, min, max, n_rows) index over ``col``.

    One global (m, k) Bloom geometry is sized from the LARGEST file's
    row count at the target ``fpr`` (per-file distinct counts are <= row
    counts, so every file's realized FPR is at or below target). Two
    column-pruned passes: stats (count/min/max per file), then the Bloom
    build through the standard mergeable-sketch fabric grouped by
    ``input_file_name()`` — rows of one file split across scan tasks
    re-combine in the merge, exactly like any other group key.

    Writes ``index_dir/index.parquet`` (file, n_rows, vmin, vmax,
    sketch) + ``index_dir/meta.json``; returns build metrics.
    """
    df = spark.read.parquet(table_path).select(
        F.input_file_name().alias(_FILE_COL), F.col(col))

    stats = (df.groupBy(_FILE_COL)
             .agg(F.count(col).alias("n_rows"),
                  F.min(col).alias("vmin"),
                  F.max(col).alias("vmax")))
    stat_rows = stats.collect()  # one row per data file: metadata-scale
    if not stat_rows:
        raise ValueError(f"no files under {table_path}")
    max_rows = max(r["n_rows"] for r in stat_rows) or 1
    m, k = optimal_params(max_rows, fpr)

    fam = BloomFamily(m=m, k=k)
    blooms = sketch_merge(
        sketch_partial(df, [_FILE_COL], col, fam), [_FILE_COL], fam)

    index = (blooms.join(stats, _FILE_COL)
             .select(F.col(_FILE_COL).alias("file"), "n_rows",
                     "vmin", "vmax", SKETCH_COL, ROWS_COL))
    os.makedirs(index_dir, exist_ok=True)
    ipath = os.path.join(index_dir, "index.parquet")
    index.write.mode("overwrite").parquet(ipath)

    n_files = len(stat_rows)
    meta = {"table_path": table_path, "col": col, "m": m, "k": k,
            "fpr": fpr, "n_files": n_files, "max_rows": max_rows,
            "coltype": df.schema[col].dataType.simpleString(),
            "index_bytes_per_file": m // 8}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _probe_keep_udf(fam: BloomFamily, values: list, coltype: str):
    """Boolean keep-this-file predicate over index rows: min/max range
    admits some probe value AND the file's Bloom may contain it.
    Vectorized over the (small, broadcast) probe list per index row.

    The probe batch hashes the SAME domain the build batches did
    (``SPARK_TYPE_TO_HASH_DOMAIN`` on the indexed column's declared
    type, the rule every sketch fabric pins through) — the zero-FN
    invariant requires it."""
    from zetasketch_spark.functions.sketch_udfs import (
        SPARK_TYPE_TO_HASH_DOMAIN)

    domain = SPARK_TYPE_TO_HASH_DOMAIN.get(coltype)
    if coltype == "bigint":
        probe = pd.Series(np.asarray(values, dtype=np.int64))
    elif coltype in ("int", "smallint", "tinyint"):
        probe = pd.Series(np.asarray(values, dtype=np.int32))
    elif coltype in ("double", "float"):
        probe = pd.Series(np.asarray(values, dtype=np.float64))
    else:
        probe = pd.Series(values, dtype=object)

    @F.pandas_udf("boolean")
    def keep(sketch: pd.Series, vmin: pd.Series,
             vmax: pd.Series) -> pd.Series:
        out = np.zeros(len(sketch), dtype=bool)
        for i in range(len(sketch)):
            lo, hi = vmin.iloc[i], vmax.iloc[i]
            if lo is None or hi is None:
                continue  # all-null file: IN never matches NULL
            cand = probe[(probe >= lo) & (probe <= hi)]
            if cand.empty:
                continue
            bf = fam.deserialize(bytes(sketch.iloc[i]))
            out[i] = bool(bf.contains_series(cand, value_type=domain).any())
        return pd.Series(out)

    return keep


def prune_candidates(spark: SparkSession, index_dir: str,
                     values: list | None = None,
                     lo=None, hi=None,
                     max_kept_fraction: float = 0.5
                     ) -> tuple[list[str] | None, dict]:
    """File paths that might satisfy the predicate, or ``None`` when
    pruning keeps more than ``max_kept_fraction`` of the files (then a
    plain full scan is cheaper than materializing the path list).

    Exactly one of ``values`` (IN-list / point lookup, Bloom + min/max)
    or ``lo``/``hi`` (range, min/max only — Blooms cannot answer range)
    must be given. Never drops a matching file (zero false negatives).
    """
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    index = spark.read.parquet(os.path.join(index_dir, "index.parquet"))
    if values is not None:
        if lo is not None or hi is not None:
            raise ValueError("pass values OR lo/hi, not both")
        fam = BloomFamily(m=meta["m"], k=meta["k"])
        keep = _probe_keep_udf(fam, values, meta["coltype"])
        kept_df = index.filter(keep(F.col(SKETCH_COL), F.col("vmin"),
                                    F.col("vmax")))
    elif lo is not None or hi is not None:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("vmax") >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col("vmin") <= F.lit(hi))
        kept_df = index.filter(cond)
    else:
        raise ValueError("pass values or lo/hi")

    kept = [r["file"] for r in kept_df.select("file").collect()]
    stats = {"n_files": meta["n_files"], "n_kept": len(kept),
             "kept_fraction": len(kept) / meta["n_files"]}
    if len(kept) > max_kept_fraction * meta["n_files"]:
        return None, stats  # pruning not worthwhile: full scan
    return kept, stats


def pruned_read(spark: SparkSession, table_path: str, index_dir: str,
                values: list | None = None, lo=None, hi=None,
                max_kept_fraction: float = 0.5) -> DataFrame:
    """The table rows satisfying ``col IN values`` (or
    ``lo <= col <= hi``), read through the index: only candidate files
    are scanned, and the residual predicate is applied on top — so the
    result is provably EQUAL to the same filter over a full scan (zero
    false negatives), just cheaper. Falls back to the full scan when
    pruning would keep most files."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    col = meta["col"]
    kept, _stats = prune_candidates(spark, index_dir, values=values,
                                    lo=lo, hi=hi,
                                    max_kept_fraction=max_kept_fraction)
    if kept is not None and not kept:
        # no candidate files: empty result with the table's schema
        return spark.read.parquet(table_path).where(F.lit(False))
    src = spark.read.parquet(*kept) if kept is not None \
        else spark.read.parquet(table_path)
    if values is not None:
        return src.where(F.col(col).isin(values))
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(col) >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(col) <= F.lit(hi))
    return src.where(cond)


def expected_file_fpr(meta: dict) -> float:
    """Analytic worst-file false-positive rate at the sized geometry:
    (1 - e^(-kn/m))^k with n = the largest file's row count (the count
    the geometry was sized from, so every file is at or below this)."""
    m, k, n = meta["m"], meta["k"], meta["max_rows"]
    return (1.0 - math.exp(-k * n / m)) ** k
