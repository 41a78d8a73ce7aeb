"""Scale-aware input parallelization for Python-kernel stages.

A small parquet table (one or two 128 MB splits) gives Catalyst a 1-2
task scan — fine for JVM expressions, but a vectorized pandas-UDF kernel
(shingling, minhash, simhash) then runs on 1-2 of the machine's cores.
``ensure_parallelism`` repartitions ONLY when the plan is
under-parallelized relative to the cluster: at 100 TB the scan already
has thousands of splits and this is a no-op; at gate/bench scale it
spreads the kernel across every core for the price of shuffling a few
megabytes of text once.

Apply it ONLY where the per-row kernel cost is heavy enough to amortize
this box's per-worker stage constants — minhash/simhash signatures and
shingle sets (measured sf1 wins: minhash 19.5->8.7 s). For light kernels
(Bloom membership probes) the spread measurably LOSES (decontaminate
3.6 s -> 8.2 s warm at sf0.1), so those call sites deliberately skip it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_parts`` (default: the session's
    ``sparkContext.defaultParallelism``) iff its current plan has fewer
    partitions. Never repartitions downward — an already-parallel scan
    keeps its (possibly locality-aware) partitioning."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
