"""Columnar fast path for sketch partials: decode parquet inside the
Python workers.

Why this exists: sketch partial aggregation is an update-heavy leaf — every
input row crosses into Python, but only tiny serialized states come back.
Measured on this machine, Spark's JVM->Python Arrow handoff tops out around
~3M rows/s *regardless of core count* (the JVM decodes fast and Python
hashes fast, but the boundary is a shared ceiling), which caps scaling.
Reading the parquet row groups directly with pyarrow inside each worker
removes the boundary from the per-row path entirely: the JVM ships only
(file, row-group) split descriptors out and sketch blobs back.

Scope and honesty:
* This is a *leaf-scan short circuit* for plain parquet inputs with a
  column-pruned projection — exactly the pushdown Catalyst would do, done
  by the source itself (the same trick a DataSourceV2 "python-native scan"
  would implement). Everything after the partial stage (shuffle, merge,
  result, joins, windows) stays DataFrame/Catalyst.
* Filters or non-parquet sources fall back to the mapInArrow path in
  `zetasketch_spark.operators.agg` (same semantics; tests assert
  state-level equality between the two paths).
* At cluster scale the split planning below is what Spark's own
  FileSourceScan does: row-group-aligned splits, bin-packed by bytes.

Derived keys: a small expression language (("to_date", col)) covers the
day-bucket case so `(role, days(ts))` grouping needs no JVM round trip.
Derived values: the sketched column itself can be an expression —
``col=("length", "text")`` sketches the per-row string length (the KLL
turn-length case) without materializing it through the JVM first.
"""

from __future__ import annotations

import glob as _glob
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StructField, StructType)

from zetasketch_spark.operators.agg import (
    PARTITION_COL, ROWS_COL, SKETCH_COL, sketch_merge, sketch_result)
from zetasketch_spark.sketches.base import SketchFamily


def partition_values(f: str, root: str) -> dict[str, str]:
    """Hive/Iceberg-style partition values from ``key=value`` path
    segments between ``root`` and the file."""
    rel = os.path.relpath(f, root)
    out: dict[str, str] = {}
    for seg in rel.split(os.sep)[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            out[k] = v
    return out


def plan_splits(path: str, target_bytes: int = 96 << 20,
                partition_filter: dict | None = None,
                ) -> list[tuple[str, list[int]]]:
    """Row-group-aligned splits bin-packed to ~target_bytes, like
    FileSourceScan's openCost/maxPartitionBytes planning. Handles flat
    AND Hive/Iceberg-partitioned (``key=value`` directory) layouts;
    ``partition_filter={col: value-or-iterable}`` drops whole files at
    planning time — partition pruning with zero I/O, the parquet twin of
    Iceberg's partition-spec scan planning."""
    import pyarrow.parquet as pq

    if isinstance(path, (list, tuple)):
        # pre-resolved file list (the DataFrame-fabric leaf-scan short
        # circuit hands us df.inputFiles()); no partition columns
        files = sorted(path)
    elif os.path.isfile(path):
        # single-file table (e.g. the driver's sf*/events.parquet): one
        # file, still row-group split below; no partition columns
        files = [path]
    else:
        files = sorted(_glob.glob(os.path.join(path, "*.parquet"))) or \
            sorted(_glob.glob(os.path.join(path, "**", "*.parquet"),
                              recursive=True))
    norm = {}
    for k, v in (partition_filter or {}).items():
        vals = list(v) if isinstance(v, (list, tuple, set, frozenset)) else [v]
        norm[k] = {str(x) for x in vals}
    if norm and files:
        # a filter key absent from the layout would silently aggregate
        # everything while the caller believes it was pruned
        present = set(partition_values(files[0], path))
        missing = set(norm) - present
        if missing:
            raise ValueError(
                f"partition_filter keys {sorted(missing)} are not partition "
                f"columns of {path} (found: {sorted(present) or 'none — flat layout'})")
    splits: list[tuple[str, list[int]]] = []
    for f in files:
        if norm:
            pv = partition_values(f, path)
            if any(pv.get(k) not in want for k, want in norm.items()):
                continue
        md = pq.ParquetFile(f).metadata
        cur: list[int] = []
        cur_bytes = 0
        for rg in range(md.num_row_groups):
            sz = md.row_group(rg).total_byte_size
            if cur and cur_bytes + sz > target_bytes:
                splits.append((f, cur))
                cur, cur_bytes = [], 0
            cur.append(rg)
            cur_bytes += sz
        if cur:
            splits.append((f, cur))
    return splits


def _derive_key_arrays(tbl, keys, derived: dict, part_values: dict | None = None):
    """Returns dict key -> pandas-able arrow array for grouping. Keys
    naming partition columns come from the path (constant per file)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out = {}
    for k in keys:
        if part_values and k in part_values and k not in derived \
                and k not in tbl.column_names:
            out[k] = pa.array([part_values[k]] * tbl.num_rows)
        elif k in derived:
            op, src = derived[k]
            if op == "to_date":
                out[k] = pc.cast(pc.floor_temporal(tbl[src], unit="day"), pa.date32())
            elif op == "date_str":
                out[k] = pc.strftime(tbl[src], format="%Y-%m-%d")
            else:
                raise ValueError(f"unknown derived-key op {op!r}")
        else:
            out[k] = tbl[k]
    return out


def _value_source(col) -> str:
    """The parquet column a (possibly derived) value expression reads."""
    return col[1] if isinstance(col, tuple) else col


def _derive_value_array(tbl, col):
    """The sketched value as a single pyarrow Array. ``col`` is a plain
    column name or ``(op, source_col)`` with op in {"length",
    "cast_double"} — "length" matches Spark's ``length()`` (code points,
    cast to double for the quantile families)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, tuple):
        op, src = col
        if op == "length":
            src_arr = tbl[src]
            if pa.types.is_dictionary(src_arr.type):
                # dictionary-encoded strings (parquet's default for
                # repetitive text): length each dictionary VALUE once,
                # gather by index — pc.utf8_length has no dictionary
                # kernel, and this is O(dict) instead of O(rows) anyway.
                # Null rows have null indices, which take() preserves.
                if isinstance(src_arr, pa.ChunkedArray):
                    src_arr = src_arr.combine_chunks()
                chunks = (src_arr.chunks
                          if isinstance(src_arr, pa.ChunkedArray)
                          else [src_arr])
                val = pa.chunked_array([
                    pc.take(pc.cast(pc.utf8_length(c.dictionary),
                                    pa.float64()), c.indices)
                    for c in chunks] or
                    [pa.array([], type=pa.float64())])
            else:
                val = pc.cast(pc.utf8_length(src_arr), pa.float64())
        elif op == "cast_double":
            val = pc.cast(tbl[src], pa.float64())
        else:
            raise ValueError(f"unknown derived-value op {op!r}")
    else:
        val = tbl[col]
    if isinstance(val, pa.ChunkedArray):
        val = val.combine_chunks()
    if isinstance(val, pa.ChunkedArray):  # combine_chunks may keep the type
        val = val.chunk(0) if val.num_chunks else pa.array([], type=val.type)
    return val


# arrow physical type -> Spark DDL for group-key columns materialized from
# the RDD fabric (unmapped exotic types fall back to their string form
# rather than failing at planning time)
_ARROW_TO_DDL = {"string": "string", "large_string": "string",
                 "int64": "bigint", "int32": "int", "int16": "int",
                 "int8": "int", "bool": "boolean",
                 "double": "double", "float": "float",
                 "timestamp[us]": "timestamp", "timestamp[ns]": "timestamp",
                 "timestamp[ms]": "timestamp", "date32[day]": "date"}


def _plan_key_types(splits, keys, derived, part_keys) -> list[str]:
    """Spark DDL type per group key, resolved from the first split's
    parquet footer (derived keys and path-materialized partition keys
    have fixed types)."""
    import pyarrow.parquet as pq

    sample_schema = pq.read_schema(splits[0][0]) if splits else None

    def _key_type(k: str) -> str:
        if k in derived:
            return "date" if derived[k][0] == "to_date" else "string"
        if k in part_keys:
            return "string"
        if sample_schema is None:
            return "string"
        return _ARROW_TO_DDL.get(str(sample_schema.field(k).type), "string")

    return [_key_type(k) for k in keys]


def _coerce_key(v, t):
    # pandas surfaces nullable int keys as floats with NaN — restore
    # the declared type (None for NaN) so the explicit schema accepts it
    import math

    if isinstance(v, np.generic):
        v = v.item()
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if t in ("bigint", "int") and isinstance(v, float):
        return int(v)
    if t == "string" and not isinstance(v, str):
        return str(v)
    return v


def sketch_partial_fastscan(
    spark: SparkSession,
    path: str,
    keys: list[str],
    col: str,
    family: SketchFamily,
    key_schema: list[tuple[str, str]] | None = None,
    derived_keys: dict | None = None,
    target_split_bytes: int = 96 << 20,
) -> DataFrame:
    """Stage 1 over a parquet directory, decoding in the workers.

    ``derived_keys``: {out_name: (op, source_col)} with op in
    {"to_date", "date_str"}. ``key_schema``: [(name, spark_type_str)] for
    derived keys (plain columns are inferred by reading one footer)."""
    import pyarrow.parquet as pq

    derived = derived_keys or {}
    splits = plan_splits(path, target_split_bytes)
    read_cols = sorted({_value_source(col),
                        *[k for k in keys if k not in derived],
                        *[src for (_, src) in derived.values()]})

    # output schema: derive plain key types from the parquet schema
    sample_schema = pq.read_schema(splits[0][0])
    type_map = {"string": "string", "large_string": "string", "int64": "bigint",
                "int32": "int", "double": "double", "float": "float",
                "timestamp[us]": "timestamp", "date32[day]": "date"}
    ks = dict(key_schema or [])
    fields = []
    from pyspark.sql.types import _parse_datatype_string

    for k in keys:
        if k in ks:
            fields.append(StructField(k, _parse_datatype_string(ks[k])))
        elif k in derived:
            op = derived[k][0]
            fields.append(StructField(k, _parse_datatype_string(
                "date" if op == "to_date" else "string")))
        else:
            pa_t = str(sample_schema.field(k).type)
            fields.append(StructField(k, _parse_datatype_string(type_map[pa_t])))
    out_schema = StructType(fields + [
        StructField(SKETCH_COL, BinaryType()),
        StructField(ROWS_COL, LongType()),
        StructField(PARTITION_COL, IntegerType()),
    ])

    sc = spark.sparkContext
    n_parts = len(splits)
    rdd = sc.parallelize(list(enumerate(splits)), n_parts)

    keys_t = tuple(keys)

    def run_split(it):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq  # noqa: F811

        for pid, (f, rgs) in it:
            pf = pq.ParquetFile(f)
            tbl = pf.read_row_groups(rgs, columns=read_cols, use_threads=False)
            tbl = tbl.combine_chunks()
            prepared = family.prepare_arrow(_derive_value_array(tbl, col))
            acc: dict = {}
            rows: dict = {}
            if keys_t:
                from zetasketch_spark.operators.grouping import \
                    arrow_group_indices
                karrs = _derive_key_arrays(tbl, keys_t, derived)
                groups = arrow_group_indices(karrs)
            else:
                groups = {(): np.arange(tbl.num_rows)}
            for key, idx in groups.items():
                if not isinstance(key, tuple):
                    key = (key,)
                state = acc.get(key)
                if state is None:
                    state = family.make()
                    acc[key] = state
                    rows[key] = 0
                family.update_prepared(state, prepared[idx])
                rows[key] += len(idx)
            for k, s in acc.items():
                yield (*k, family.serialize(s), rows[k], pid)

    return spark.createDataFrame(rdd.mapPartitions(run_split), out_schema)


def sketch_partial_filescan(spark, files, keys, col, family,
                            key_fields: list[StructField],
                            target_split_bytes: int = 96 << 20) -> DataFrame:
    """Stage-1 partials over an explicit parquet FILE LIST — the leaf-scan
    short circuit behind ``operators.agg.sketch_partial``: when a
    DataFrame is provably a plain column projection of a parquet scan,
    the partial stage reads the files directly in the RDD runner (no
    JVM->Python Arrow handoff of every row) and returns the SAME
    ``keys + (sketch, rows_seen, partition_id)`` DataFrame the
    ``mapInArrow`` path produces, so merge/result compose unchanged.
    Splits are row-group-aligned and binned into one wave of ``cpus``
    tasks; states accumulate across a task's splits, so partial-state
    volume matches the task count, not the split count."""
    sc = spark.sparkContext
    splits = plan_splits(files, target_split_bytes)
    if 0 < len(splits) < sc.defaultParallelism:
        # under-parallel input: re-plan at row-group granularity so a
        # 2-row-group table uses 2 tasks instead of 1 (the bin packing
        # targets bytes, not cores)
        splits = plan_splits(files, 1)
    out_schema = StructType(list(key_fields) + [
        StructField(SKETCH_COL, BinaryType()),
        StructField(ROWS_COL, LongType()),
        StructField(PARTITION_COL, IntegerType()),
    ])
    if not splits:
        return spark.createDataFrame([], out_schema)
    read_cols = sorted({col, *keys})
    keys_t = tuple(keys)
    cpus = sc.defaultParallelism
    n_tasks = max(1, min(len(splits), cpus))
    rdd = sc.parallelize(splits, n_tasks)

    def run_task(it):
        import pyarrow.parquet as pq  # noqa: F811
        from pyspark import TaskContext

        from zetasketch_spark.operators.grouping import arrow_group_indices

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        acc: dict = {}
        rows: dict = {}
        for f, rgs in it:
            pf = pq.ParquetFile(f)
            tbl = pf.read_row_groups(rgs, columns=read_cols,
                                     use_threads=False).combine_chunks()
            prepared = family.prepare_arrow(_derive_value_array(tbl, col))
            if keys_t:
                groups = arrow_group_indices({k: tbl[k] for k in keys_t})
            else:
                groups = {(): np.arange(tbl.num_rows)}
            for key, idx in groups.items():
                if not isinstance(key, tuple):
                    key = (key,)
                state = acc.get(key)
                if state is None:
                    state = family.make()
                    acc[key] = state
                    rows[key] = 0
                family.update_prepared(state, prepared[idx])
                rows[key] += len(idx)
        for k, s in acc.items():
            yield (*k, family.serialize(s), rows[k], pid)

    return spark.createDataFrame(rdd.mapPartitions(run_task), out_schema)


def sketch_agg_filescan(spark, files, keys, col, family,
                        key_fields: list[StructField],
                        target_split_bytes: int = 96 << 20) -> DataFrame:
    """Full partial->merge->result over an explicit parquet file list,
    entirely in the RDD runner — the fused twin of
    ``sketch_partial_filescan`` for ``sketch_agg(keep_sketch=False)``:
    the SQL-layer exchange + applyInPandas merge crossing cost ~1.7 s of
    a 2 s query at sf1 while the actual kernel work was ~0.3 s; here only
    serialized states cross the reduceByKey shuffle and the result rows
    materialize straight from the reducer."""
    sc = spark.sparkContext
    splits = plan_splits(files, target_split_bytes)
    fields = list(key_fields) + [StructField(ROWS_COL, LongType())] + [
        StructField(n, _parse_dt(t)) for n, t in family.result_fields]
    schema = StructType(fields)
    if not splits:
        return spark.createDataFrame([], schema)
    if len(splits) < sc.defaultParallelism:
        splits = plan_splits(files, 1)
    read_cols = sorted({col, *keys})
    keys_t = tuple(keys)
    cpus = sc.defaultParallelism
    n_tasks = max(1, min(len(splits), cpus))
    rdd = sc.parallelize(splits, n_tasks)

    def run_task(it):
        import pyarrow.parquet as pq  # noqa: F811

        from zetasketch_spark.operators.grouping import arrow_group_indices

        acc: dict = {}
        rows: dict = {}
        for f, rgs in it:
            pf = pq.ParquetFile(f)
            tbl = pf.read_row_groups(rgs, columns=read_cols,
                                     use_threads=False).combine_chunks()
            prepared = family.prepare_arrow(_derive_value_array(tbl, col))
            if keys_t:
                groups = arrow_group_indices({k: tbl[k] for k in keys_t})
            else:
                groups = {(): np.arange(tbl.num_rows)}
            for key, idx in groups.items():
                if not isinstance(key, tuple):
                    key = (key,)
                state = acc.get(key)
                if state is None:
                    state = family.make()
                    acc[key] = state
                    rows[key] = 0
                family.update_prepared(state, prepared[idx])
                rows[key] += len(idx)
        for k, s in acc.items():
            yield (k, (family.serialize(s), rows[k]))

    def merge_pair(a, b):
        return (family.serialize(family.merge(family.deserialize(a[0]),
                                              family.deserialize(b[0]))),
                a[1] + b[1])

    n_red = max(4, min(64, max(cpus // 2, 4), len(splits)))
    merged = rdd.mapPartitions(run_task).reduceByKey(
        merge_pair, numPartitions=n_red)

    def to_row(kv):
        key, (blob, rows_seen) = kv
        rec = [v.item() if isinstance(v, np.generic) else v for v in key]
        rec.append(int(rows_seen))
        rec += [x.item() if isinstance(x, np.generic) else x
                for x in family.result(family.deserialize(blob))]
        return tuple(rec)

    return spark.createDataFrame(merged.map(to_row), schema)


def _parse_dt(t: str):
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(t)


def sketch_agg_fastscan(spark, path, keys, col, family,
                        derived_keys=None, tree_levels: int = 1,
                        target_split_bytes: int = 96 << 20,
                        keep_sketch: bool = False) -> DataFrame:
    partials = sketch_partial_fastscan(
        spark, path, keys, col, family, derived_keys=derived_keys,
        target_split_bytes=target_split_bytes)
    merged = sketch_merge(partials, keys, family, tree_levels=tree_levels)
    return sketch_result(merged, family, keep_sketch=keep_sketch)


def sketch_agg_rdd(spark, path, keys, col, family,
                   derived_keys=None, target_split_bytes: int = 96 << 20,
                   reduce_partitions: int | None = None,
                   keep_sketch: bool = False,
                   partition_filter: dict | None = None):
    """Flagship execution fabric: parquet-split scan + ``reduceByKey`` tree
    merge, entirely in the RDD runner.

    Measured on this sandbox, Spark's SQL Arrow runner adds a ~2-3 s
    constant per data-bearing Python stage (independent of bytes, cores,
    and batch size), which dominates wall time and destroys the N->4N
    scaling signal. The plain RDD pipe has ~5 ms/task overhead, so this
    pipeline keeps the treeAggregate shape (partial per split -> pairwise
    state merge -> estimate) with only serialized sketch states crossing
    process boundaries. State equality with the DataFrame path is
    asserted in tests (same cores, same bytes, same estimates).

    Returns a Spark DataFrame of ``keys + (rows_seen, estimate fields)``.

    Partitioned (Hive/Iceberg ``key=value`` directory) layouts are read
    natively: ``partition_filter`` prunes whole files at planning time
    (zero I/O), and group keys naming partition columns are materialized
    from the path instead of the file.
    """
    derived = derived_keys or {}
    splits = plan_splits(path, target_split_bytes, partition_filter)
    if 0 < len(splits) < spark.sparkContext.defaultParallelism:
        # under-parallel input (e.g. one ~150MB file): re-plan at
        # row-group granularity so every row group is its own task
        # instead of 1-2 byte-binned splits (measured 4.5 s -> ~1 s on a
        # 10M-row single-file table at sf10)
        splits = plan_splits(path, 1, partition_filter)
    part_cols = set(partition_values(splits[0][0], path)) if splits else set()
    part_keys = {k for k in keys if k in part_cols and k not in derived}
    read_cols = sorted({_value_source(col),
                        *[k for k in keys
                          if k not in derived and k not in part_keys],
                        *[src for (_, src) in derived.values()]})
    sc = spark.sparkContext
    # several splits per task: one accumulated state per (task, key) crosses
    # the boundary instead of one per (split, key) — partial-state volume
    # shrinks by the splits-per-task factor
    cpus = sc.defaultParallelism
    # one wave of cpus tasks, not two: more tasks means more per-task
    # partial states (every (task, key) state is serialized, shuffled and
    # re-merged) plus scheduling overhead — measured 0.9 s -> 0.63 s for
    # the map stage at 80 splits / 32 cores. Splits are size-binned, so
    # one wave stays balanced; huge inputs still get len(splits) >> cpus
    # rebalancing via the size-capped splits themselves.
    n_tasks = max(1, min(len(splits), cpus))
    items = [(f, rgs, partition_values(f, path) if part_keys else None)
             for f, rgs in splits]
    rdd = sc.parallelize(items, n_tasks)
    keys_t = tuple(keys)

    def run_split(it):
        import pyarrow as pa
        import pyarrow.parquet as pq  # noqa: F811

        acc: dict = {}
        rows: dict = {}
        for f, rgs, pv in it:
            pf = pq.ParquetFile(f)
            tbl = pf.read_row_groups(rgs, columns=read_cols, use_threads=False)
            tbl = tbl.combine_chunks()
            prepared = family.prepare_arrow(_derive_value_array(tbl, col))
            if keys_t:
                from zetasketch_spark.operators.grouping import \
                    arrow_group_indices
                karrs = _derive_key_arrays(tbl, keys_t, derived, pv)
                groups = arrow_group_indices(karrs)
            else:
                groups = {(): np.arange(tbl.num_rows)}
            for key, idx in groups.items():
                if not isinstance(key, tuple):
                    key = (key,)
                state = acc.get(key)
                if state is None:
                    state = family.make()
                    acc[key] = state
                    rows[key] = 0
                family.update_prepared(state, prepared[idx])
                rows[key] += len(idx)
        for key, state in acc.items():
            yield (key, (family.serialize(state), rows[key]))

    def merge_pair(a, b):
        sa = family.deserialize(a[0])
        sb = family.deserialize(b[0])
        return (family.serialize(family.merge(sa, sb)), a[1] + b[1])

    # reduce-side width: every reduce partition is a Python-worker round
    # trip; with key counts far below the partition count most trips carry
    # almost nothing (measured 1.6 s -> 1.3 s going 64 -> 16 at 465 keys).
    # Scale-adaptive: half the cores locally, capped at 64 on big clusters
    # (callers with known huge key cardinality pass reduce_partitions).
    n_red = reduce_partitions or max(4, min(64, max(cpus // 2, 4), len(splits)))
    merged = rdd.mapPartitions(run_split).reduceByKey(merge_pair, numPartitions=n_red)

    # estimate extraction stays distributed: map over the merged states and
    # build the DataFrame from the RDD with an explicit schema — no driver
    # collect, so a high-cardinality group key is as safe here as in the
    # DataFrame path (the old collect() shortcut capped this fabric at
    # driver-memory group counts).
    from pyspark.sql.types import _parse_datatype_string

    key_types = _plan_key_types(splits, keys, derived, part_keys)
    fields = [StructField(k, _parse_datatype_string(t))
              for k, t in zip(keys, key_types)]
    fields.append(StructField(ROWS_COL, LongType()))
    fields += [StructField(n, _parse_datatype_string(t))
               for n, t in family.result_fields]
    if keep_sketch:
        fields.append(StructField(SKETCH_COL, BinaryType()))

    def to_row(kv):
        key, (blob, rows_seen) = kv
        rec = [_coerce_key(v, t) for v, t in zip(key, key_types)]
        rec.append(int(rows_seen))
        rec += [x.item() if isinstance(x, np.generic) else x
                for x in family.result(family.deserialize(blob))]
        if keep_sketch:
            rec.append(blob)
        return tuple(rec)

    return spark.createDataFrame(merged.map(to_row), StructType(fields))


def multi_sketch_agg_rdd(spark, path, keys, specs,
                         derived_keys=None,
                         target_split_bytes: int = 96 << 20,
                         reduce_partitions: int | None = None,
                         partition_filter: dict | None = None):
    """One parquet scan, many sketches, on the flagship RDD fabric.

    ``specs``: ``{output_name: (value_col_or_derived, family)}`` — the
    same shape as ``operators.multi.multi_sketch_agg`` (result columns
    are prefixed by the spec name: spec ``users`` with an HLL family
    yields ``users_estimate``), with the fast fabric's derived-value
    forms allowed (``("length", "text")``).

    Why: at 100 TB the scan dominates every north-star job, and the
    daily rollup wants HLL distinct + Count-Min heavy hitters + KLL/DD
    quantiles over the SAME transcripts table. Run separately that is
    3-4 full scans; here each split is decoded once, every family's
    ``prepare_arrow`` kernel runs on the shared Arrow batch, and only a
    tuple of serialized states per (task, key) crosses the process
    boundary. State equality with per-family ``sketch_agg_rdd`` runs is
    asserted in tests (same splits, same batches, same estimates).
    """
    derived = derived_keys or {}
    names = list(specs)
    splits = plan_splits(path, target_split_bytes, partition_filter)
    if 0 < len(splits) < spark.sparkContext.defaultParallelism:
        # under-parallel input (e.g. one ~150MB file): re-plan at
        # row-group granularity so every row group is its own task
        # instead of 1-2 byte-binned splits (measured 4.5 s -> ~1 s on a
        # 10M-row single-file table at sf10)
        splits = plan_splits(path, 1, partition_filter)
    part_cols = set(partition_values(splits[0][0], path)) if splits else set()
    part_keys = {k for k in keys if k in part_cols and k not in derived}
    read_cols = sorted({*[_value_source(c) for c, _ in specs.values()],
                        *[k for k in keys
                          if k not in derived and k not in part_keys],
                        *[src for (_, src) in derived.values()]})
    sc = spark.sparkContext
    cpus = sc.defaultParallelism
    # one wave of cpus tasks, not two: more tasks means more per-task
    # partial states (every (task, key) state is serialized, shuffled and
    # re-merged) plus scheduling overhead — measured 0.9 s -> 0.63 s for
    # the map stage at 80 splits / 32 cores. Splits are size-binned, so
    # one wave stays balanced; huge inputs still get len(splits) >> cpus
    # rebalancing via the size-capped splits themselves.
    n_tasks = max(1, min(len(splits), cpus))
    items = [(f, rgs, partition_values(f, path) if part_keys else None)
             for f, rgs in splits]
    rdd = sc.parallelize(items, n_tasks)
    keys_t = tuple(keys)

    def run_split(it):
        import pyarrow as pa
        import pyarrow.parquet as pq  # noqa: F811

        acc: dict = {}
        rows: dict = {}
        for f, rgs, pv in it:
            pf = pq.ParquetFile(f)
            tbl = pf.read_row_groups(rgs, columns=read_cols, use_threads=False)
            tbl = tbl.combine_chunks()
            prepared = {n: fam.prepare_arrow(_derive_value_array(tbl, c))
                        for n, (c, fam) in specs.items()}
            if keys_t:
                from zetasketch_spark.operators.grouping import \
                    arrow_group_indices
                karrs = _derive_key_arrays(tbl, keys_t, derived, pv)
                groups = arrow_group_indices(karrs)
            else:
                groups = {(): np.arange(tbl.num_rows)}
            for key, idx in groups.items():
                if not isinstance(key, tuple):
                    key = (key,)
                states = acc.get(key)
                if states is None:
                    states = {n: specs[n][1].make() for n in names}
                    acc[key] = states
                    rows[key] = 0
                for n in names:
                    specs[n][1].update_prepared(states[n], prepared[n][idx])
                rows[key] += len(idx)
        for key, states in acc.items():
            yield (key, (tuple(specs[n][1].serialize(states[n])
                               for n in names), rows[key]))

    def merge_pair(a, b):
        blobs = tuple(
            specs[n][1].serialize(
                specs[n][1].merge(specs[n][1].deserialize(ba),
                                  specs[n][1].deserialize(bb)))
            for n, ba, bb in zip(names, a[0], b[0]))
        return (blobs, a[1] + b[1])

    # reduce-side width: every reduce partition is a Python-worker round
    # trip; with key counts far below the partition count most trips carry
    # almost nothing (measured 1.6 s -> 1.3 s going 64 -> 16 at 465 keys).
    # Scale-adaptive: half the cores locally, capped at 64 on big clusters
    # (callers with known huge key cardinality pass reduce_partitions).
    n_red = reduce_partitions or max(4, min(64, max(cpus // 2, 4), len(splits)))
    merged = rdd.mapPartitions(run_split).reduceByKey(
        merge_pair, numPartitions=n_red)

    from pyspark.sql.types import _parse_datatype_string

    key_types = _plan_key_types(splits, keys, derived, part_keys)
    fields = [StructField(k, _parse_datatype_string(t))
              for k, t in zip(keys, key_types)]
    fields.append(StructField(ROWS_COL, LongType()))
    for n in names:
        fields += [StructField(f"{n}_{fn}", _parse_datatype_string(t))
                   for fn, t in specs[n][1].result_fields]

    def to_row(kv):
        key, (blobs, rows_seen) = kv
        rec = [_coerce_key(v, t) for v, t in zip(key, key_types)]
        rec.append(int(rows_seen))
        for n, blob in zip(names, blobs):
            fam = specs[n][1]
            rec += [x.item() if isinstance(x, np.generic) else x
                    for x in fam.result(fam.deserialize(blob))]
        return tuple(rec)

    return spark.createDataFrame(merged.map(to_row), StructType(fields))
