"""Pre-join key-overlap profiling: approximate join diagnostics in two
table scans and O(k) driver state.

Before running (or even planning) a 100 TB join, the questions that
matter are: how many distinct keys does each side have, how many are
shared, and is the foreign-key side fully contained in the primary
side? Exact answers cost a full shuffle of both key sets; two theta
sketches (`sketches/theta.py`) answer all of them within published
envelopes from one scan per side, shipping exactly TWO k-bounded states
(≤ 8·k bytes each) to the driver — no key ever crosses the network.

Output (one row):

``distinct_a, distinct_b, overlap, a_not_b, b_not_a,
containment_a_in_b, containment_b_in_a, jaccard, rse``

* distinct_* : KMV estimates, relative error ~1/sqrt(k-1);
* overlap / differences: direct theta set ops (binomial-thinning sd);
* containment_a_in_b = |A∩B| / |A| — 1.0 means every a-key exists in b
  (FK integrity); estimated on the common sample so the thinning rate
  cancels, like Jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def join_key_profile(df_a: DataFrame, key_a: str, df_b: DataFrame,
                     key_b: str, k: int = 4096) -> DataFrame:
    import pandas as pd

    from zetasketch_spark.functions.sketch_udfs import theta_init_agg
    from zetasketch_spark.sketches.theta import ThetaSketch

    spark = df_a.sparkSession

    def _global_sketch(df, key):
        row = df.agg(theta_init_agg(key, k).alias("sk")).collect()[0]
        return (ThetaSketch.deserialize(bytes(row["sk"]))
                if row["sk"] is not None else ThetaSketch(k=k))

    a = _global_sketch(df_a, key_a)
    b = _global_sketch(df_b, key_b)

    union = ThetaSketch.deserialize(a.serialize())
    union.merge(b)
    inter = a.intersect(b)
    # containment on the common sample (min-theta), so the thinning rate
    # cancels exactly as in jaccard()
    theta = min(a.theta, b.theta)
    import numpy as np

    t = np.uint64(theta) if theta < (1 << 64) else None
    ra = a.retained if t is None else a.retained[a.retained < t]
    rb = b.retained if t is None else b.retained[b.retained < t]
    shared = len(np.intersect1d(ra, rb))
    cont_a = shared / len(ra) if len(ra) else 0.0
    cont_b = shared / len(rb) if len(rb) else 0.0

    return spark.createDataFrame(pd.DataFrame([[
        a.estimate(), b.estimate(), inter.estimate(),
        a.a_not_b(b).estimate(), b.a_not_b(a).estimate(),
        float(cont_a), float(cont_b), float(a.jaccard(b)), float(a.rse()),
    ]], columns=["distinct_a", "distinct_b", "overlap", "a_not_b",
                 "b_not_a", "containment_a_in_b", "containment_b_in_a",
                 "jaccard", "rse"]))
