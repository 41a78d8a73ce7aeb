"""Lineage-truncation seam for big intermediates (signatures, edge lists,
per-round labels).

Iterative and multiply-referenced DataFrames need their lineage cut: the
plan would otherwise grow per round, and expensive UDF stages would
re-execute once per downstream reference. Two seams, same call site:

* ``localCheckpoint(eager=True)`` — fast, blocks pinned in executor
  storage. Fine at gate scale, NOT fault-tolerant: at 100 TB a lost
  executor cannot recompute a truncated lineage, so the job dies instead
  of retrying.
* ``checkpoint_dir`` given — write parquet and read it back. Durable:
  any executor can re-read a lost partition from storage, which is the
  seam to use on a real cluster (point it at HDFS/S3/DBFS). Files are
  namespaced per call so one directory serves a whole pipeline run.

Operators take ``checkpoint_dir: str | None`` and thread it here; the
default (None) keeps the fast path so local iteration and the benchmarks
never touch disk.
"""

from __future__ import annotations

import itertools
import uuid

from pyspark.sql import DataFrame

# Paths are namespaced by a per-process run token + a counter: a rerun
# after a driver crash (the exact scenario the durable seam exists for)
# must not collide with the previous run's files, and two concurrent
# pipelines may share a checkpoint_dir. Callers own cleanup of the dir.
_RUN_TOKEN = uuid.uuid4().hex[:8]
_seq = itertools.count()


def materialize(df: DataFrame, checkpoint_dir: str | None = None,
                name: str = "intermediate") -> DataFrame:
    """Materialize ``df`` and return a lineage-free DataFrame over it.

    The localCheckpoint is LAZY: it piggybacks on the first downstream
    action instead of paying a dedicated job (this sandbox charges a
    multi-second constant per job, and a dedup pipeline has several
    truncation points). Subsequent references reuse the checkpointed
    blocks either way."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=False)
    path = f"{checkpoint_dir.rstrip('/')}/{name}_{_RUN_TOKEN}_{next(_seq)}"
    df.write.mode("error").parquet(path)
    return df.sparkSession.read.parquet(path)
