"""Key-skew diagnosis before a join or group-by.

Salting, AQE skew hints, and broadcast decisions all need the same
fact: which keys are hot, and how hot. `key_skew_report` answers it
with EXACT counts for the top keys at sketch cost: the Count-Min +
Misra-Gries candidate pass (`operators/topk.py::topk_exact_rerank`)
bounds the shuffle to candidate keys only (mergeable-summaries
guarantee: any key with share > 1/(max_candidates+1) survives), and an
exact re-rank confirms the counts — so the report is exact for every
key hot enough to matter, plus a provably_complete certificate.

Output (one row per reported key, hottest first):

``key, exact_count, share, skewed, provably_complete``

``skewed`` flags share > ``threshold`` — the keys that would overload
one reducer; the caller salts exactly those (DESIGN.md §2). NULL keys
are reported as the key ``'(null)'`` (often the hottest key of all —
outer joins, optional fields — and one a groupBy still shuffles);
shares are computed over ALL rows including nulls."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_report(df: DataFrame, key: str, top: int = 10,
                    threshold: float = 0.01,
                    max_candidates: int = 512) -> DataFrame:
    from zetasketch_spark.operators.topk import topk_exact_rerank

    # NULL is often the hottest key (outer joins, optional fields) and the
    # one a groupBy still shuffles — render it as a countable sentinel so
    # the report can flag it ('(null)' collides only with a literal
    # '(null)' string value, which would land in the same reducer anyway)
    keyed = df.select(F.coalesce(F.col(key).cast("string"),
                                 F.lit("(null)")).alias(key))
    # the CM pass counts all rows exactly — no separate count scan
    ranked, total = topk_exact_rerank(keyed, key, k=top,
                                      max_candidates=max_candidates,
                                      with_total=True)
    return (ranked
            .withColumn("share", F.col("exact_count") / F.lit(float(max(total, 1))))
            .withColumn("skewed", F.col("share") > F.lit(float(threshold)))
            .select("key", "exact_count", "share", "skewed",
                    "provably_complete"))
