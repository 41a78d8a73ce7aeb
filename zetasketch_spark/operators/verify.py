"""Self-verifying gate queries: sketch estimates folded into exact,
SQL-reproducible outputs.

The driver's correctness gate hash-compares a Spark DataFrame against a
DuckDB oracle, so a query is only *hard*-checkable if every output column
is an exact function of the input tables. Sketch estimates are not — but
their published guarantees are decidable. Each builder here therefore
emits (a) exact companion columns (counts, exact distincts, exact
quantiles) that DuckDB recomputes verbatim, and (b) boolean columns that
assert the sketch guarantee (HLL++ error envelope, KLL/t-digest rank
error, CM overcount bound, Bloom zero-false-negatives, LSH recall on
deterministically planted near-duplicates). The oracle emits the same
exact columns plus literal ``true``; any estimate outside its bound flips
a boolean and fails the hash.

This mirrors how the reference pins correctness: ZetaSketch's own tests
compare estimates against precomputed exact cardinalities within the
published envelope (HyperLogLogPlusPlusTest.java — the `assertEstimate`
helpers), rather than demanding estimate==exact.
"""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# planted near-duplicate scheme (shared by Spark + DuckDB oracle SQL):
# for vec_id < PLANT_N, add a copy with id += PLANT_OFFSET and
# v'[i] = v[i] + PLANT_EPS * v[(i+1) mod dim], computed in float64.
PLANT_N = 20
PLANT_OFFSET = 10_000
PLANT_EPS = 0.08


# ---------------------------------------------------------------------------
# HLL: exact distinct + error envelope
# ---------------------------------------------------------------------------

def hll_envelope_bound(precision: int) -> float:
    """The GATE bound: 3x the published RMS error 1.04/sqrt(2^p).
    1.04/sqrt(m) is a standard deviation, not a hard bound — a 1-sigma
    gate would flip false for ~32% of dense-mode groups on perfectly
    healthy sketches. 3-sigma (99.7%) matches the pytest envelope."""
    return 3 * 1.04 / math.sqrt(2 ** precision)


def hll_verified(df: DataFrame, keys: list[str], col: str, precision: int,
                 tree_levels: int = 1) -> DataFrame:
    """keys + (n_rows, exact_distinct, within_envelope)."""
    from zetasketch_spark.operators.agg import hll_count_distinct

    approx = hll_count_distinct(df, keys, col, precision=precision,
                                tree_levels=tree_levels)
    exact = df.groupBy(*keys).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(col).alias("exact_distinct"))
    bound = hll_envelope_bound(precision)
    return (
        exact.join(approx.select(*keys, "approx_distinct"), keys)
        # exact_distinct == 0 (all-null column): the ratio is a
        # null-producing division — the healthy outcome is approx == 0,
        # not a null boolean that hash-mismatches the oracle's true
        .withColumn("within_envelope",
                    F.when(F.col("exact_distinct") == 0,
                           F.col("approx_distinct") == 0)
                    .otherwise(
                        F.abs(F.col("approx_distinct")
                              / F.col("exact_distinct") - 1.0)
                        <= F.lit(bound)))
        .select(*keys, "n_rows", "exact_distinct", "within_envelope")
    )


# ---------------------------------------------------------------------------
# quantile sketches: rank-error bracket against the raw data
# ---------------------------------------------------------------------------

def rank_check(df: DataFrame, keys: list[str], value_col: str,
               estimates: DataFrame, qcols: dict[str, float],
               eps: dict[str, float] | float, ok_col: str) -> DataFrame:
    """Join quantile estimates back to the data and assert the rank-error
    bracket: for each φ-estimate q̂, φ must fall within
    [rank(< q̂) − ε, rank(≤ q̂) + ε]. Returns keys + (n_rows, <ok_col>).

    The estimate table is tiny (one row per group) and broadcast; the check
    is one aggregate pass over the data — the same shape at any scale."""
    if not isinstance(eps, dict):
        eps = {c: eps for c in qcols}
    est = estimates.select(*keys, *qcols.keys())
    j = df.select(*keys, value_col).join(F.broadcast(est), keys)
    # the bracket denominator must be the NON-NULL value count (what the
    # sketch actually saw): the _lo/_hi sums skip null comparisons, so
    # dividing by count(*) on null-bearing data halves the fractions and
    # flips the certificate red on a healthy sketch. n_rows stays
    # count(*) — it is the oracle-matched output column.
    aggs = [F.count("*").alias("n_rows"),
            F.count(value_col).alias("_nn")]
    for c in qcols:
        aggs.append(F.sum((F.col(value_col) < F.col(c)).cast("long")).alias(f"_lo_{c}"))
        aggs.append(F.sum((F.col(value_col) <= F.col(c)).cast("long")).alias(f"_hi_{c}"))
    g = j.groupBy(*keys).agg(*aggs)
    ok = F.lit(True)
    for c, phi in qcols.items():
        lo = F.col(f"_lo_{c}") / F.col("_nn") - F.lit(eps[c])
        hi = F.col(f"_hi_{c}") / F.col("_nn") + F.lit(eps[c])
        ok = ok & (F.lit(phi) >= lo) & (F.lit(phi) <= hi)
    # a group with zero non-null values passes vacuously (the sketch saw
    # nothing; null/0 division would otherwise yield a null boolean)
    ok = F.when(F.col("_nn") == 0, F.lit(True)).otherwise(ok)
    return g.select(*keys, "n_rows", ok.alias(ok_col))


def quantile_sketch_verified(df: DataFrame, keys: list[str], value_col: str,
                             family, qcols: dict[str, float],
                             eps: dict[str, float] | float,
                             ok_col: str) -> DataFrame:
    """keys + (n_rows, exact_p50, <ok_col>): the sketch runs distributed,
    its estimates are rank-bracket-checked, and an exact interpolated
    median rides along for the oracle hash."""
    from zetasketch_spark.operators.agg import sketch_agg

    est = sketch_agg(df, keys, value_col, family)
    checked = rank_check(df, keys, value_col, est, qcols, eps, ok_col)
    exact = df.groupBy(*keys).agg(
        F.round(F.expr(f"percentile({value_col}, 0.5)"), 6).alias("exact_p50"))
    return checked.join(exact, keys).select(*keys, "n_rows", "exact_p50", ok_col)


def relative_error_quantiles_verified(df: DataFrame, keys: list[str],
                                      value_col: str, family,
                                      qcols: dict[str, float],
                                      ok_col: str) -> DataFrame:
    """keys + (n_rows, exact_p50, <ok_col>): the DDSketch certificate —
    each quantile estimate within ``family.alpha`` RELATIVE error of the
    exact order statistic at rank floor(q·(n−1)) (Masson et al. VLDB
    2019, Theorem 1; rank convention matches DDSketch.quantiles).

    The sketch runs distributed (``sketch_agg``); the exact companion is
    one window sort per group plus a broadcast join of the tiny
    (group × quantile) target-rank table. Like every *_verified oracle
    here, the exact pass is the gate-scale verification payload — the
    production path is the sketch alone."""
    from zetasketch_spark.operators.agg import sketch_agg

    if not keys:
        raise ValueError("relative_error_quantiles_verified needs at "
                         "least one grouping key (the all-group left "
                         "joins below are keyed)")
    est = sketch_agg(df, keys, value_col, family)
    # align the exact side with what the SKETCH saw: the families drop
    # null AND NaN (NaN is not null, so isNotNull alone would shift every
    # target rank and let Spark's sort-NaN-last pick NaN as a tail order
    # statistic, nulling the certificate boolean)
    finite = F.col(value_col).isNotNull()
    if df.schema[value_col].dataType.simpleString() in ("double", "float"):
        finite = finite & ~F.isnan(value_col)
    vals = df.select(*keys, value_col).where(finite)
    counts = vals.groupBy(*keys).agg(
        F.count("*").alias("n_rows"),
        F.round(F.expr(f"percentile({value_col}, 0.5)"), 6).alias("exact_p50"))
    # tiny (one row per group) but referenced twice (targets + final
    # join): materialize it ONCE driver-side — .cache() has no unpersist
    # path from a lazy builder and would leak executor storage across
    # the 50-query gate / hostile replays (same eager pattern as
    # cm_topk_verified)
    spark = df.sparkSession
    counts = spark.createDataFrame(counts.collect(), schema=counts.schema)
    targets = counts.select(
        *keys,
        F.explode(F.array(*[
            F.struct(F.lit(f"exact_{c}").alias("_qc"),
                     (F.floor(F.lit(q) * (F.col("n_rows") - 1)) + 1
                      ).alias("_rk"))
            for c, q in qcols.items()])).alias("_t")
    ).select(*keys, "_t._qc", "_t._rk")
    w = Window.partitionBy(*keys).orderBy(F.col(value_col))
    ranked = vals.withColumn("_rk", F.row_number().over(w))
    exact_q = (ranked.join(F.broadcast(targets), [*keys, "_rk"])
               .groupBy(*keys)
               .pivot("_qc", [f"exact_{c}" for c in qcols])
               .agg(F.first(value_col)))
    ok = F.lit(True)
    for c in qcols:
        # alpha*1.0001: ~1 ulp of log() can shift a bucket-boundary value
        # one bucket (midpoint still within alpha + float noise); the
        # bare bound would flip a healthy sketch's gate row red for
        # boundary values with |exact| large enough that the noise
        # exceeds the 1e-9 absolute slack (same factor as the unit test)
        ok = ok & (F.abs(F.col(c) - F.col(f"exact_{c}"))
                   <= F.lit(family.alpha * 1.0001)
                   * F.abs(F.col(f"exact_{c}")) + F.lit(1e-9))
    # LEFT joins from the full group set: a group whose values are all
    # null/NaN has no exact companion rows, and an inner join would drop
    # it while the SQL oracle still emits it (row-count mismatch). Such
    # a group passes vacuously — the sketch saw nothing.
    groups = df.select(*keys).distinct()
    ok = F.when(F.coalesce(F.col("n_rows"), F.lit(0)) == 0,
                F.lit(True)).otherwise(ok)
    return (groups.join(est, keys, "left")
            .join(exact_q, keys, "left").join(counts, keys, "left")
            .select(*keys,
                    F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
                    "exact_p50", ok.alias(ok_col)))


# ---------------------------------------------------------------------------
# Count-Min: exact top-k + overcount bound
# ---------------------------------------------------------------------------

def cm_topk_verified(df: DataFrame, key_col: str, k: int,
                     width: int, depth: int, max_candidates: int) -> DataFrame:
    """Exact top-k keys (count desc, key asc) with booleans asserting the
    CM guarantee: estimate ∈ [exact, exact + ⌈εN⌉] (ε = e/width; CM never
    undercounts) and the key survived candidate tracking."""
    from zetasketch_spark.operators.agg import sketch_merge, sketch_partial
    from zetasketch_spark.sketches.countmin import CountMinFamily

    fam = CountMinFamily(width=width, depth=depth, max_candidates=max_candidates)
    keyed = df.select(F.col(key_col).cast("string").alias("key"))
    partials = sketch_partial(keyed, [], "key", fam)
    merged = sketch_merge(partials, [], fam)
    [row] = merged.collect()
    cm = fam.deserialize(bytes(row["sketch"]))

    # orderBy + limit compiles to TakeOrderedAndProject (per-partition
    # heaps, no global sort): the key set after the groupBy is unbounded
    # at 10^12 rows, so a global row_number window (one partition holding
    # EVERY distinct key) is the wrong plan; ranks are assigned from the
    # already-sorted driver list instead
    top = (keyed.groupBy("key").agg(F.count("*").alias("exact_count"))
           .orderBy(F.col("exact_count").desc(), F.col("key"))
           .limit(k).collect())
    est = cm.point_query_series(pd.Series([r["key"] for r in top]))
    # the published bound is P(over > eN) <= e^-depth per key; doubling
    # the slack drives the per-key gate failure probability to ~e^-2depth
    slack = math.ceil(2 * math.e / width * cm.total)
    rows = [
        [r["key"], r["exact_count"], i + 1,
         bool(r["exact_count"] <= e <= r["exact_count"] + slack),
         r["key"] in cm.candidates]
        for i, (r, e) in enumerate(zip(top, est))
    ]
    spark = df.sparkSession
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "exact_count", "rank",
                                    "est_ok", "in_candidates"])
        .astype({"key": str, "exact_count": "int64", "rank": "int64"}))


# ---------------------------------------------------------------------------
# Bloom: zero false negatives + bounded false-positive rate
# ---------------------------------------------------------------------------

def bloom_verified(build: DataFrame, build_col: str, probe: DataFrame,
                   probe_col: str, m: int, k: int) -> DataFrame:
    """One row: (n_probed, n_actual_members, no_false_negatives,
    fp_bounded). False negatives are forbidden by construction; the FP rate
    must stay within 1.5× the analytic (1−e^{−kn/m})^k (floored at 1%)."""
    from zetasketch_spark.operators.agg import sketch_merge, sketch_partial
    from zetasketch_spark.sketches.bloom import BloomFamily

    fam = BloomFamily(m=m, k=k)
    partials = sketch_partial(build, [], build_col, fam)
    merged = sketch_merge(partials, [], fam)
    [row] = merged.collect()
    blob = bytes(row["sketch"])

    from pyspark.sql.functions import pandas_udf

    _bf_cache: dict = {}  # survives across batches within a python worker

    @pandas_udf("boolean")
    def probe_udf(keys: pd.Series) -> pd.Series:
        # deserialize the filter once per worker, not once per ~10k-row
        # pandas batch — a large-m filter re-parsed per batch dominates
        # the probe pass
        if "bf" not in _bf_cache:
            _bf_cache["bf"] = fam.deserialize(blob)
        return pd.Series(_bf_cache["bf"].contains_series(keys))

    actual_keys = build.select(F.col(build_col).alias("_k")).distinct()
    flagged = (
        probe.select(F.col(probe_col).alias("_k"))
        .join(actual_keys.withColumn("_actual", F.lit(True)), "_k", "left")
        .withColumn("_actual", F.coalesce(F.col("_actual"), F.lit(False)))
        .withColumn("_member", probe_udf(F.col("_k")))
    )
    stats = flagged.agg(
        F.count("*").alias("n_probed"),
        F.sum(F.col("_actual").cast("long")).alias("n_actual_members"),
        F.sum((F.col("_actual") & ~F.col("_member")).cast("long")).alias("_fn"),
        F.sum((~F.col("_actual") & F.col("_member")).cast("long")).alias("_fp"),
    )
    bf = fam.deserialize(blob)
    fp_bound = 1.5 * max(bf.expected_fpr(), 0.01)
    return stats.select(
        "n_probed", "n_actual_members",
        (F.col("_fn") == 0).alias("no_false_negatives"),
        (F.col("_fp") <= F.greatest(
            F.ceil(F.lit(fp_bound) * (F.col("n_probed") - F.col("n_actual_members"))),
            F.lit(0))).alias("fp_bounded"),
    )


# ---------------------------------------------------------------------------
# near-dup ground truth + SimHash theorem check
# ---------------------------------------------------------------------------

def exact_jaccard_pairs(docs: DataFrame, threshold: float,
                        shingle_k: int = 5, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Brute-force exact shingle-Jaccard pairs ≥ threshold (gate-scale
    ground truth; O(n²) on purpose — the production path is the LSH
    pipeline this verifies)."""
    from zetasketch_spark.operators.dedup import verify_jaccard

    ids = docs.select(F.col(id_col))
    pairs = (
        ids.select(F.col(id_col).alias("id_a"))
        .crossJoin(ids.select(F.col(id_col).alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    return verify_jaccard(pairs, docs, text_col, id_col, shingle_k, threshold)


def simhash_verified(docs: DataFrame, max_hamming: int = 3,
                     gt_threshold: float = 0.5) -> DataFrame:
    """Ground-truth near-dup pairs (exact shingle Jaccard ≥ gt_threshold)
    with two booleans pinned true by construction when the pipeline is
    correct — at EVERY corpus scale:

    * ``blocking_ok`` — the 16-bit-prefix blocking theorem: any pair at
      Hamming ≤ max_hamming shares an intact block, so if the signatures
      land that close the pair MUST appear in the operator output.
    * ``candidates_sound`` — the signature-level precision theorem (the
      only precision guarantee simhash makes): every pair the operator
      emits really is at Hamming ≤ max_hamming between the two
      signatures, normalized (id_a < id_b) and duplicate-free. Sensitive
      to bugs anywhere in the block/bucket/refine/filter chain — a
      blocking join that leaked a far pair, or a hot-bucket reroute that
      emitted an unchecked pair, flips it false. (SimHash makes NO
      Jaccard-level false-positive guarantee — on large corpora short
      docs legitimately collide at Hamming ≤ 3, which is why production
      exact-verifies candidates; the round-3 global ``no_false_positives``
      flag asserted that theory-free claim and honestly failed at
      sf0.1.)"""
    from zetasketch_spark.operators.dedup import simhash64, simhash_near_dups

    gt = exact_jaccard_pairs(docs, gt_threshold).localCheckpoint(eager=True)
    found = simhash_near_dups(docs, max_hamming=max_hamming) \
        .select("id_a", "id_b").localCheckpoint(eager=True)

    sigs = simhash64(docs)
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("_sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("_sig_b"))

    ham = F.bit_count(F.col("_sig_a").bitwiseXOR(F.col("_sig_b")))
    n_unsound = (
        found.join(sa, "id_a").join(sb, "id_b")
        .filter((ham > max_hamming) | (F.col("id_a") >= F.col("id_b")))
        .count()
    )
    n_dup = found.count() - found.distinct().count()
    candidates_sound = n_unsound == 0 and n_dup == 0

    fm = found.withColumn("_found", F.lit(True))
    return (
        gt.join(sa, "id_a").join(sb, "id_b")
        .join(fm, ["id_a", "id_b"], "left")
        .withColumn("_ham", ham)
        .select(
            "id_a", "id_b", "jaccard",
            ((F.col("_ham") > max_hamming) | F.coalesce(F.col("_found"), F.lit(False))
             ).alias("blocking_ok"),
            F.lit(candidates_sound).alias("candidates_sound"),
        )
    )


# ---------------------------------------------------------------------------
# planted embedding near-duplicates (ANN / near-dup gates)
# ---------------------------------------------------------------------------

def planted_corpus(emb: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Corpus ∪ deterministic near-duplicates of the first PLANT_N vectors
    (cosine ≈ 0.997 to their originals): v'[i] = v[i] + ε·v[(i+1) mod d],
    in float64 so the DuckDB oracle reproduces it bit-for-bit."""
    base = emb.select(F.col(id_col),
                      F.expr(f"transform({vec_col}, x -> cast(x as double))")
                      .alias(vec_col))
    planted = base.filter(F.col(id_col) < PLANT_N).select(
        (F.col(id_col) + PLANT_OFFSET).alias(id_col),
        F.expr(
            f"transform({vec_col}, (x, i) -> x + cast({PLANT_EPS} as double) * "
            f"element_at({vec_col}, pmod(i + 1, size({vec_col})) + 1))"
        ).alias(vec_col),
    )
    return base.unionByName(planted)
