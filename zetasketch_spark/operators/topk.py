"""Distributed exact top-k by frequency: sketch-guided candidates, exact
re-rank.

The production-grade heavy-hitters shape at 100 TB:

1. **candidate generation** — Count-Min partials with bounded candidate
   sets per partition, merged associatively (only sketch states shuffle;
   the Misra-Gries-style union keeps any key with share >
   1/(max_candidates+1), so every possible top-k member survives when
   k ≪ max_candidates).
2. **exact re-rank** — the merged candidate set (≤ max_candidates keys) is
   broadcast back as a semi-join filter and the survivors are counted
   EXACTLY in one aggregation over the data. Shuffle volume: candidate
   keys only.

The result is exact (not an estimate) whenever the true top-k all clear
the candidate-survival bar — and the output CHECKS this: the Misra-Gries
prune guarantees any key absent from the candidate set has true count
≤ ⌊N/(max_candidates+1)⌋, so when the k-th returned exact count exceeds
that bound no pruned key can displace the ranking and the
``provably_complete`` column is true. A false flag means a flat
distribution where pruned keys *could* tie into the top-k (raise
``max_candidates`` or fall back to an exact group-by).

Same contract the reference's Aggregator pattern implies for distributed
use (`Aggregator.java:31-106`): partial state per worker, associative
merge, small serialized states across the wire.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def topk_exact_rerank(df: DataFrame, col: str, k: int = 10,
                      width: int = 4096, depth: int = 5,
                      max_candidates: int = 512, with_total: bool = False):
    """Exact top-k ``(key, exact_count, rank)`` (count desc, key asc
    tiebreak), computed with sketch-bounded shuffle.

    Keys are compared in string form (the CM candidate domain).
    ``with_total=True`` additionally returns ``(df, total)`` where total
    is the exact non-null row count — the CM pass counts it anyway, so
    callers needing it (e.g. `operators/skew.py`) save a full scan."""
    from zetasketch_spark.operators.agg import sketch_merge, sketch_partial
    from zetasketch_spark.sketches.countmin import CountMinFamily

    fam = CountMinFamily(width=width, depth=depth,
                         max_candidates=max_candidates)
    # NOT ensure_parallelism'd (measured, sf1): spreading the keyed rows
    # costs a 1M-row string shuffle plus 32x more CM partial states and
    # loses ~0.7 s against the single-task kernel it parallelizes; heavy
    # upstream producers (e.g. token explodes) spread BEFORE this call
    keyed = df.select(F.col(col).cast("string").alias("key"))
    partials = sketch_partial(keyed, [], "key", fam)
    merged = sketch_merge(partials, [], fam)
    rows = merged.collect()  # at most ONE global sketch — tiny by construction
    if not rows:  # empty input: empty (provably complete) report
        spark = df.sparkSession
        empty = spark.createDataFrame(
            [], "key string, exact_count bigint, rank bigint, provably_complete boolean")
        return (empty, 0) if with_total else empty
    cm = fam.deserialize(bytes(rows[0]["sketch"]))
    candidates = list(cm.candidates.keys())

    spark = df.sparkSession
    cand_df = spark.createDataFrame([(c,) for c in candidates], "key string")
    exact = (
        keyed.join(F.broadcast(cand_df), "key", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("exact_count"))
    )
    w = Window.orderBy(F.col("exact_count").desc(), F.col("key"))
    topk = (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
    # completeness certificate: every non-candidate key's true count is
    # ≤ ⌊N/(m+1)⌋ (Misra-Gries survival bar), so the ranking is provably
    # complete iff the k-th (smallest returned) exact count clears it
    bound = cm.total // (max_candidates + 1)
    out = topk.withColumn(
        "provably_complete",
        F.min("exact_count").over(Window.partitionBy()) > F.lit(bound))
    return (out, cm.total) if with_total else out
