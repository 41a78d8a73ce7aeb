"""Deterministic sampling for training-data mixtures.

``weighted_sample``: per-source keep fractions (mixture weights) decided
by a hash of the row id — reproducible across runs, engines, and
cluster sizes (no RNG state, no seed plumbing): the SAME rows are kept
wherever the job runs, which is what makes train/val splits and
mixture re-runs auditable. Pure Catalyst: one projection + filter, no
shuffle; the md5-derived uniform is the same expression DuckDB
evaluates, so membership is exactly verifiable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_uniform(id_col: str | Column) -> Column:
    """Deterministic uniform in [0, 1): the first 8 md5 hex chars of the
    id as a 32-bit integer, scaled. Identical in any engine with md5."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
            .cast("double") / float(1 << 32))


def bottomk_sample(df: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    """EXACT-k deterministic uniform sample: the k rows with the smallest
    md5(id) — a distributed bottom-k ("KMV") sample.

    Properties that matter at 100 TB:

    * mergeable: bottom-k of a union == bottom-k of per-partition
      bottom-ks, so Spark executes it as per-partition top-k + a k-row
      driver/single-partition combine (``TakeOrderedAndProject``) — NO
      global sort, NO full shuffle; each executor ships at most k rows.
    * deterministic: same members on any cluster size / engine (md5 is
      portable), so the sample is auditable and re-runnable, unlike
      ``df.sample`` whose membership depends on partitioning.
    * uniform: md5 order is independent of any data attribute.

    Ties on the full 32-hex digest are impossible for distinct ids; the
    id itself breaks ties between identical ids."""
    h = F.md5((F.col(id_col) if isinstance(id_col, str) else id_col)
              .cast("string"))
    return (df.withColumn("__h", h)
            .orderBy("__h", id_col)
            .limit(k)
            .drop("__h"))


def stratified_bottomk_sample(df: DataFrame, k: int, group_col: str,
                              id_col: str = "doc_id") -> DataFrame:
    """EXACT-k-per-group deterministic uniform sample: within each group,
    the k rows with the smallest md5(id). The balanced-mixture companion
    to :func:`bottomk_sample` (e.g. "500 docs per language" eval sets).

    Scale shape: ONE hash-partitioned shuffle on ``group_col`` + a
    per-partition sort (rank window); no global sort, no driver state.
    Skewed group sizes only affect the sort width of their partition —
    for pathological single-group skew, pre-filter that group through
    ``bottomk_sample`` instead. Same determinism/auditability guarantees
    as bottom-k: membership is a pure function of the ids.

    Precondition (shared with :func:`bottomk_sample`): ids are unique
    within a group — duplicate (group, id) rows exhaust the tie-break,
    and WHICH physical duplicate survives a cutoff landing between them
    is partition-order-dependent."""
    from pyspark.sql import Window

    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(idc.cast("string"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), idc.asc())
    return (df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .drop("__rk"))


def weighted_sample(df: DataFrame, weights: dict[str, float],
                    group_col: str = "source",
                    id_col: str = "doc_id",
                    default_weight: float = 0.0) -> DataFrame:
    """Keep each row with its group's probability, deterministically by
    id hash. ``weights`` maps group value -> keep fraction in [0, 1];
    unlisted groups use ``default_weight``. The weight table is tiny by
    definition (one row per source) and folds into the plan as a literal
    CASE — no join, no shuffle."""
    u = hash_uniform(id_col)
    frac = F.lit(float(default_weight))
    for k, v in sorted(weights.items()):
        frac = F.when(F.col(group_col) == k, F.lit(float(v))).otherwise(frac)
    return df.filter(u < frac)
