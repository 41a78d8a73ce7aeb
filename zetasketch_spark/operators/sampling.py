"""Deterministic sampling for training-data mixtures.

``weighted_sample``: per-source keep fractions (mixture weights) decided
by a hash of the row id — reproducible across runs, engines, and
cluster sizes (no RNG state, no seed plumbing): the SAME rows are kept
wherever the job runs, which is what makes train/val splits and
mixture re-runs auditable. Pure Catalyst: one projection + filter, no
shuffle; the md5-derived uniform is the same expression DuckDB
evaluates, so membership is exactly verifiable.

``priority_sample``: weighted exact-k with per-row unbiased subset-sum
estimates (Duffield-Lund-Thorup priority sampling) — same determinism,
same TakeOrderedAndProject scale shape, estimates verifiable exactly.
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


def priority_sample(df: DataFrame, k: int, weight_col: str,
                    id_col: str = "doc_id") -> DataFrame:
    """Weighted EXACT-k sample with unbiased subset-sum estimates —
    priority sampling (Duffield, Lund, Thorup, "Priority sampling for
    estimation of arbitrary subset sums", JACM 54(6), 2007).

    Each row draws priority ``q = w / u`` where ``u`` is a deterministic
    md5 uniform of its id, strictly inside (0, 1); the sample is the k
    largest priorities and ``tau`` is the (k+1)-th. The returned rows
    carry ``est_weight = max(w, tau)``, which is an UNBIASED estimator
    of the row's contribution to ANY subset sum: for every subset S,
    ``E[sum over sample∩S of est_weight] = sum over S of w`` (the
    paper's Theorem 1 — conditioning on tau, a row with w < tau is
    sampled with probability exactly w/tau and then reports tau). So one
    k-row sample answers every later "total tokens in segment X?"
    question unbiasedly, which is the auditable-subsample primitive a
    training-data pipeline wants. Rows with NULL or non-positive weight
    carry no mass and are excluded (q would be undefined).

    Properties at 100 TB, shared with :func:`bottomk_sample`:

    * mergeable: top-k of a union == top-k of per-partition top-ks, so
      the cut executes as ``TakeOrderedAndProject`` — each executor
      ships at most k+1 rows, no global sort, no full shuffle; the
      tau/rank window afterwards touches only those k+1 survivors.
    * deterministic: u has no RNG state, so membership AND estimates
      are a pure function of the ids — identical on any cluster size,
      any partitioning, and in any engine with md5 (the DuckDB oracle
      reproduces both exactly; see ``docs_sampling_report``).
    * certain coverage of heavy rows: w >= tau implies q = w/u > w >=
      tau, so every row at least as heavy as the threshold is in the
      sample with probability 1 (its estimate is its exact weight).
    """
    from pyspark.sql import Window

    idc = F.col(id_col) if isinstance(id_col, str) else F.col(id_col)
    w = F.col(weight_col).cast("double")
    # +0.5 keeps u strictly positive (a 2^-32 fluke of all-zero leading
    # md5 bits would otherwise divide by zero) and strictly below 1;
    # the same two exactly-rounded IEEE ops render in the SQL twin
    u = ((F.conv(F.substring(F.md5(idc.cast("string")), 1, 8), 16, 10)
          .cast("double") + 0.5) / float(1 << 32))
    top = (df.filter(w > 0)
           .withColumn("__q", w / u)
           .orderBy(F.desc("__q"), idc.asc())
           .limit(k + 1))
    # rank + threshold over the <= k+1 survivors only: the unpartitioned
    # windows are a deliberate single-partition pass over a k-bounded set
    rk = Window.orderBy(F.desc("__q"), idc.asc())
    full = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = top.withColumn("__rk", F.row_number().over(rk))
    tau = F.coalesce(
        F.max(F.when(F.col("__rk") == k + 1, F.col("__q"))).over(full),
        F.lit(0.0))
    return (ranked.withColumn("__tau", tau)
            .filter(F.col("__rk") <= k)
            .withColumn("est_weight",
                        F.greatest(F.col(weight_col).cast("double"),
                                   F.col("__tau")))
            .drop("__q", "__rk", "__tau"))


def stratified_priority_sample(df: DataFrame, k: int, weight_col: str,
                               group_col: str,
                               id_col: str = "doc_id") -> DataFrame:
    """Weighted EXACT-k-per-group priority sampling: within each group,
    the k largest priorities ``q = w / u`` (same deterministic md5
    uniform as :func:`priority_sample`), with per-group threshold
    ``tau_g`` = the group's (k+1)-th priority and per-row unbiased
    ``est_weight = max(w, tau_g)`` — so every group's subset sums are
    estimable from its own k rows. This is the balanced-mixture builder
    ("k docs per source, weighted by token count") with the audit
    property: membership and estimates are pure functions of the ids.

    Scale shape (same as :func:`stratified_bottomk_sample`): ONE
    hash-partitioned shuffle on ``group_col``, then a rank window and a
    full-frame window max over the SAME partitioning (Catalyst fuses
    them onto the one exchange — the plan guard pins a single shuffle);
    no global sort, no driver state, no self-join. Skewed group sizes
    only widen their partition's sort.
    """
    from pyspark.sql import Window

    idc = F.col(id_col) if isinstance(id_col, str) else F.col(id_col)
    w = F.col(weight_col).cast("double")
    u = ((F.conv(F.substring(F.md5(idc.cast("string")), 1, 8), 16, 10)
          .cast("double") + 0.5) / float(1 << 32))
    win = Window.partitionBy(group_col).orderBy(F.desc("__q"), idc.asc())
    grp = Window.partitionBy(group_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    # every kept row reads the SAME tau_g: the group's (k+1)-th
    # priority, or 0.0 when the group has <= k rows (sample == group)
    return (df.filter(w > 0)
            .withColumn("__q", w / u)
            .withColumn("__rk", F.row_number().over(win))
            .withColumn("__tau", F.coalesce(
                F.max(F.when(F.col("__rk") == k + 1, F.col("__q")))
                .over(grp), F.lit(0.0)))
            .filter(F.col("__rk") <= k)
            .withColumn("est_weight",
                        F.greatest(F.col(weight_col).cast("double"),
                                   F.col("__tau")))
            .drop("__q", "__rk", "__tau"))


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
