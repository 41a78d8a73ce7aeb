"""Deduplication operators for training-data pipelines.

Four tiers, cheapest first — at 100 TB you run them in this order because
each narrows the candidate set for the next:

* **exact** — md5 fingerprint group-by. One shuffle on a 16-byte key.
* **normalized** — same, after lowercase/strip/collapse normalization.
* **MinHash + LSH** — shingle -> minhash signature (vectorized Pandas UDF
  over fingerprint2011 with Kirsch-Mitzenmacher permutations) -> band
  buckets -> self-join on (band, bucket) -> exact-Jaccard verification of
  candidates only. The band join shuffles only (band, bucket, id) rows, and
  candidate verification touches only colliding pairs — never all pairs.
* **SimHash** — 64-bit signature; near-dups = small Hamming distance. A
  prefix-bucket join (4 rotations x 16-bit prefix) bounds the candidate set
  the same way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf

from zetasketch_spark.functions.text import doc_fingerprint, normalized_text
from zetasketch_spark.hashing import fingerprint_str_series
from zetasketch_spark.operators.materialize import materialize

U64 = np.uint64


# --- exact / normalized ---------------------------------------------------------

def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (fingerprint, dup_count, keep_id)."""
    return (
        df.select(doc_fingerprint(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("dup_count"), F.min(id_col).alias("keep_id"))
        .filter(F.col("dup_count") > 1)
    )


def normalized_dup_groups(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    return (
        df.select(F.md5(normalized_text(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("dup_count"), F.min(id_col).alias("keep_id"))
        .filter(F.col("dup_count") > 1)
    )


# --- shingles + MinHash -----------------------------------------------------------

def _shingle_hashes(texts: pd.Series, k: int = 5) -> list[np.ndarray]:
    """Per-doc sorted unique uint64 hashes of word k-shingles.

    Fully vectorized ACROSS the batch (``hashing.kgram_window_hashes``:
    two fingerprint passes total, zero-copy gram windows); per-doc dedupe
    is a single lexsort over (doc, hash). No per-document Python loop, no
    shingle strings ever materialized."""
    from zetasketch_spark.hashing import kgram_window_hashes, unique_per_doc

    h, doc_of, n_docs = kgram_window_hashes(texts, k)
    if len(h) == 0:
        return [np.empty(0, dtype=np.uint64)] * n_docs
    return unique_per_doc(h, doc_of, n_docs)


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, shingle_k: int = 5) -> DataFrame:
    """(id, signature array<bigint>) — vectorized Pandas UDF stage: one
    permutation pass over the whole batch's shingle hashes with per-doc
    ``np.minimum.reduceat`` (no per-doc matrices)."""

    from zetasketch_spark.operators.parallelize import ensure_parallelism

    df = ensure_parallelism(df)

    @pandas_udf("array<long>")
    def _sig_udf(texts: pd.Series) -> pd.Series:
        hsets = _shingle_hashes(texts, k=shingle_k)
        counts = np.array([len(h) for h in hsets], dtype=np.int64)
        n_docs = len(hsets)
        sigs = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        nonempty = counts > 0
        if nonempty.any():
            hs = np.concatenate([h for h in hsets if len(h)])
            ne_counts = counts[nonempty]
            starts = np.concatenate([[0], np.cumsum(ne_counts)[:-1]])
            ends = np.cumsum(ne_counts)
            rng = np.random.default_rng(0xD1CE)
            a = (rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) << U64(1)) | U64(1)
            b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
            ne_rows = np.flatnonzero(nonempty)
            # cache-blocked permutation loop (identical arithmetic, so
            # byte-identical signatures): the streaming form re-read the
            # whole batch's hash array once per permutation (~64 full
            # passes of memory traffic); doc-aligned ~256KB blocks keep
            # the slice L2-resident across all 64 permutations — measured
            # 2.6x on the kernel.
            n_ne = len(ne_counts)
            CHUNK = 1 << 15
            buf = np.empty(CHUNK + int(ne_counts.max()), dtype=np.uint64)
            sd = 0
            while sd < n_ne:
                ed = sd
                base = starts[sd]
                while ed < n_ne and ends[ed] - base <= CHUNK:
                    ed += 1
                if ed == sd:
                    ed += 1
                lo, hi = starts[sd], ends[ed - 1]
                hs_blk = hs[lo:hi]
                st_blk = starts[sd:ed] - lo
                bb = buf[:len(hs_blk)]
                tmp = np.empty((ed - sd, num_perm), dtype=np.uint64)
                for i in range(num_perm):
                    np.multiply(hs_blk, a[i], out=bb)
                    bb += b[i]
                    tmp[:, i] = np.minimum.reduceat(bb, st_blk)
                sigs[ne_rows[sd:ed]] = tmp
                sd = ed
        # empty-shingle docs get NULL signatures: a shared sentinel
        # signature would collide every empty doc in every LSH band —
        # an O(n²) candidate blowup on short/empty texts
        out = [row.view(np.int64).tolist() if ne else None
               for row, ne in zip(sigs, nonempty)]
        return pd.Series(out)

    # non-deterministic marking (guide §4.4): the downstream
    # `signature.isNotNull` filter in lsh_candidate_pairs is otherwise
    # pushed below the ensure_parallelism exchange and DUPLICATES the UDF —
    # one copy running on the unrepartitioned scan (measured: the whole
    # corpus in ONE task, 4 s single-threaded at sf1) plus the parallel
    # copy above. Output is unchanged (the UDF is pure); the flag only
    # forbids the optimizer from copying/reordering it.
    sig_udf = _sig_udf.asNondeterministic()

    return df.select(F.col(id_col), sig_udf(F.col(text_col)).alias("signature"))


def bounded_bucket_pairs(exploded: DataFrame, id_col: str,
                         bucket_cols: list[str], max_bucket: int = 512,
                         name: str = "hot_buckets",
                         refine_col: str | None = None,
                         carry_col: str | None = None,
                         distinct: bool = True) -> DataFrame:
    """Distinct candidate pairs ``(id_a < id_b)`` from intra-bucket
    self-joins, with per-bucket cost BOUNDED: a bucket with more than
    ``max_bucket`` members is rerouted away from the quadratic self-join.
    Without the cap, one degenerate bucket of m members makes the join
    emit m²/2 rows before the exact-verify stage can prune — the classic
    100 TB LSH failure mode.

    Hot-bucket routing, with ``refine_col`` (a per-row full-signature
    hash): members are sub-grouped by the refine key — exact signature
    duplicates, i.e. copies of the same boilerplate variant — each copy
    pairs with its variant's min-id representative (O(n) pairs, every one
    verifies at Jaccard ~1), and the variant representatives pair among
    themselves through a recursive bounded join, so DISTINCT variant
    families that share a hot bucket still connect. Duplicate clusters
    are preserved exactly as long as a hot bucket holds ≤ ``max_bucket``
    distinct signatures; beyond that the representatives themselves
    star-reroute (logged), which can only thin cross-variant pairs in a
    bucket with >max_bucket DISTINCT near-identical variants.

    Without ``refine_col`` the whole hot bucket stars against its min-id
    member — correct for exact-copy pileups, thinner for mixed buckets.

    The hot-bucket list is tiny by construction (≤ rows/max_bucket
    entries), so it broadcasts; the cold path is exactly the ordinary
    bucket self-join. Capped volume is observable in the same job via a
    ``DataFrame.observe`` node named ``name`` (metrics:
    ``star_pairs``, ``max_bucket_rows``) — no extra action needed.

    ``carry_col`` (must equal ``refine_col`` when both are given): carry
    that column's per-row value into the pair output as ``carry_a`` /
    ``carry_b`` — the caller then needs NO join back to the signature
    table (measured at sf1: two broadcast joins over ~8M candidate rows,
    ~15 s of executor CPU, gone). ``distinct=False`` returns the raw
    (possibly per-band duplicated) pair stream so a caller applying a
    selective pair-level filter (Hamming, Jaccard) can dedupe AFTER the
    filter — distinct-then-filter and filter-then-distinct are equal for
    a pure pair predicate, and the post-filter distinct touches orders of
    magnitude fewer rows."""
    if carry_col is not None and refine_col is not None \
            and carry_col != refine_col:
        raise ValueError("carry_col must equal refine_col when both are "
                         "given (the star path reads the carried value "
                         "from the refine group key)")
    out_cols = ["id_a", "id_b"] + (
        ["carry_a", "carry_b"] if carry_col else [])

    def self_join_pairs(df):
        a = df.alias("a")
        b = df.alias("b")
        carry = ([F.col(f"a.{carry_col}").alias("carry_a"),
                  F.col(f"b.{carry_col}").alias("carry_b")]
                 if carry_col else [])
        return (
            a.join(b, on=[F.col(f"a.{c}") == F.col(f"b.{c}")
                          for c in bucket_cols]
                   + [F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"), *carry)
        )

    def _maybe_distinct(df):
        return df.distinct() if distinct else df

    rep_aggs = [F.count("*").alias("_bn"), F.min(id_col).alias("_rep")]
    if carry_col is not None:
        # the star path pairs members with the min-id representative; with
        # a carried payload the rep's value rides along (ids are unique,
        # so min_by is deterministic)
        rep_aggs.append(F.min_by(carry_col, id_col).alias("_rep_carry"))
    hot = (
        exploded.groupBy(*bucket_cols)
        .agg(*rep_aggs)
        .filter(F.col("_bn") > max_bucket)
    )
    # ONE census job: the hot list is ≤ rows/max_bucket entries by
    # construction, so up to a generous cap we collect it and rebuild it
    # as a LOCAL relation (joins against it need no shuffle or extra
    # checkpoint job); a pathological corpus with more hot buckets than
    # the cap falls back to a distributed checkpointed list.
    _HOT_COLLECT_CAP = 100_000
    hot_local = hot.limit(_HOT_COLLECT_CAP + 1).collect()
    if not hot_local:
        # common case — no bucket over the cap: the plan is EXACTLY the
        # plain bucket self-join (no anti-join, no star branch, no refine
        # window), so clean corpora pay only the census job for the bound
        return _maybe_distinct(self_join_pairs(exploded))
    if len(hot_local) <= _HOT_COLLECT_CAP:
        hot = exploded.sparkSession.createDataFrame(hot_local, hot.schema)
    else:
        hot = hot.localCheckpoint(eager=True)
    cold = exploded.join(F.broadcast(hot.select(*bucket_cols)),
                         bucket_cols, "left_anti")
    pairs_cold = self_join_pairs(cold)
    members = exploded.join(F.broadcast(hot), bucket_cols)
    if refine_col is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(*bucket_cols, refine_col)
        grp = members.withColumn("_rep2", F.min(id_col).over(w))
        # carried payload: the star pair's two sides share the refine
        # group, and carry_col == refine_col, so both carries ARE the
        # group's refine value — no lookup needed
        star_carry = ([F.col(refine_col).alias("carry_a"),
                       F.col(refine_col).alias("carry_b")]
                      if carry_col else [])
        star = (
            grp.filter(F.col(id_col) != F.col("_rep2"))
            .select(F.col("_rep2").alias("id_a"), F.col(id_col).alias("id_b"),
                    *star_carry, F.col("_bn"))
        )
        # variant representatives pair among themselves with the SAME
        # bounded rule, resolved inline with window functions over the
        # tiny reps frame (r6: this was a recursive bounded_bucket_pairs
        # call whose census cost a separate collect JOB per hot level;
        # the window census produces the identical pair set — per-bucket
        # rep count decides cold self-join vs star-to-min-rep)
        rep_cols = [*bucket_cols] + ([refine_col] if carry_col else [])
        reps = (
            grp.select(*rep_cols, F.col("_rep2").alias(id_col))
            .distinct()
            .localCheckpoint(eager=False)
        )
        wb = Window.partitionBy(*bucket_cols)
        rep_min = [F.col(id_col)] + ([F.col(refine_col)] if carry_col else [])
        reps = (reps.withColumn("_bnr", F.count("*").over(wb))
                    .withColumn("_minrep", F.min(F.struct(*rep_min)).over(wb)))
        cold_reps = reps.filter(F.col("_bnr") <= max_bucket) \
            .select(*rep_cols, id_col)
        rep_star_carry = ([F.col("_minrep")[refine_col].alias("carry_a"),
                           F.col(refine_col).alias("carry_b")]
                          if carry_col else [])
        star_reps = (
            reps.filter((F.col("_bnr") > max_bucket)
                        & (F.col(id_col) != F.col("_minrep")[id_col]))
            .select(F.col("_minrep")[id_col].alias("id_a"),
                    F.col(id_col).alias("id_b"), *rep_star_carry,
                    F.col("_bnr"))
            .observe(f"{name}_reps",
                     F.count(F.lit(1)).alias("star_pairs"),
                     F.max("_bnr").alias("max_bucket_rows"))
            .drop("_bnr")
        )
        cross = self_join_pairs(cold_reps).unionByName(
            star_reps.select(*out_cols))
        pairs_hot = (
            star.observe(name,
                         F.count(F.lit(1)).alias("star_pairs"),
                         F.max("_bn").alias("max_bucket_rows"))
            .drop("_bn")
            .unionByName(cross)
        )
    else:
        star_carry = ([F.col("_rep_carry").alias("carry_a"),
                       F.col(carry_col).alias("carry_b")]
                      if carry_col else [])
        pairs_hot = (
            members.filter(F.col(id_col) != F.col("_rep"))
            .select(F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b"),
                    *star_carry, F.col("_bn"))
            .observe(name,
                     F.count(F.lit(1)).alias("star_pairs"),
                     F.max("_bn").alias("max_bucket_rows"))
            .drop("_bn")
        )
    return _maybe_distinct(
        pairs_cold.select(*out_cols).unionByName(pairs_hot.select(*out_cols)))


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id",
                        num_perm: int = 64, bands: int = 16,
                        max_bucket: int = 512,
                        checkpoint_dir: str | None = None) -> DataFrame:
    """Band the signatures and self-join on (band, bucket-hash). Returns
    distinct candidate (id_a, id_b) with id_a < id_b. Only bucket collisions
    shuffle — the classic LSH trick that replaces the O(n^2) cross join —
    and buckets wider than ``max_bucket`` are star-rerouted
    (:func:`bounded_bucket_pairs`) so a boilerplate-heavy corpus cannot go
    quadratic."""
    rows_per_band = num_perm // bands
    # Empty-shingle docs carry NULL signatures and cannot be near-dups of
    # anything — drop them before banding. `_sig` (full-signature hash) is
    # the hot-bucket refine key: exact signature duplicates = copies of
    # the same boilerplate variant.
    banded = signatures.filter(F.col("signature").isNotNull()).select(
        F.col(id_col),
        F.xxhash64(*[F.col("signature")[i] for i in range(num_perm)])
        .alias("_sig"),
        F.posexplode(
            F.array(*[
                F.xxhash64(*[
                    F.col("signature")[i]
                    for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                ])
                for b in range(bands)
            ])
        ).alias("band", "bucket"),
    )
    # materialize the BANDED rows (4 small columns): the bounded pair join
    # references them three times (hot census, cold self-join, star side),
    # so without the cut the minhash UDF and the band hashing would re-run
    # per reference.
    banded = materialize(banded, checkpoint_dir, "minhash_bands")
    return bounded_bucket_pairs(banded, id_col, ["band", "bucket"],
                                max_bucket=max_bucket,
                                name="lsh_hot_buckets",
                                refine_col="_sig")


def shingle_sets(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", shingle_k: int = 5) -> DataFrame:
    """(id, shingles array<long>) — sorted unique shingle hashes per doc,
    computed ONCE per document (batch-vectorized)."""

    from zetasketch_spark.operators.parallelize import ensure_parallelism

    docs = ensure_parallelism(docs)

    @pandas_udf("array<long>")
    def sh_udf(texts: pd.Series) -> pd.Series:
        hs = _shingle_hashes(texts, k=shingle_k)
        return pd.Series([h.view(np.int64).tolist() for h in hs])

    return docs.select(F.col(id_col), sh_udf(F.col(text_col)).alias("shingles"))


def verify_jaccard(pairs: DataFrame, docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", shingle_k: int = 5,
                   threshold: float = 0.7,
                   checkpoint_dir: str | None = None) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs only. Shingle sets are
    computed once per CANDIDATE document (docs semi-joined to the pair
    ids first — at 100 TB the candidate set is a sliver of the corpus,
    and with zero candidates no shingling runs at all) and joined to the
    pair list; the Jaccard itself is a JVM ``array_intersect``
    expression, so no Python runs in the per-pair loop."""
    pairs = materialize(pairs, checkpoint_dir, "lsh_candidates")
    # no .distinct(): a LEFT SEMI join is set-semantics on the right side
    # already, and the dedupe cost an extra exchange + aggregate stage
    # for an identical candidate-doc set (r6)
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
    )
    sh = materialize(
        shingle_sets(docs.join(ids, id_col, "left_semi"),
                     text_col, id_col, shingle_k),
        checkpoint_dir, "shingle_sets")
    joined = (
        pairs
        .join(sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    denom = F.size("sh_a") + F.size("sh_b") - inter
    # two empty shingle sets share no evidence of similarity: 0, not 1
    # (exact dedup is the operator for identical-empty detection)
    jac = F.when(denom > 0, inter.cast("double") / denom).otherwise(F.lit(0.0))
    return (
        joined.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_near_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                      threshold: float = 0.7, max_bucket: int = 512,
                      checkpoint_dir: str | None = None) -> DataFrame:
    """Full pipeline: signatures -> LSH candidates -> exact verification.

    ``checkpoint_dir`` switches the lineage-truncation seam from
    localCheckpoint (fast, executor-pinned) to durable parquet spill —
    the fault-tolerant choice on a real cluster (see
    ``operators.materialize``)."""
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_k)
    pairs = lsh_candidate_pairs(sigs, id_col, num_perm, bands,
                                max_bucket=max_bucket,
                                checkpoint_dir=checkpoint_dir)
    return verify_jaccard(pairs, df, text_col, id_col, shingle_k, threshold,
                          checkpoint_dir=checkpoint_dir)


# --- dup clusters ------------------------------------------------------------------

def _symmetrize(e: DataFrame) -> DataFrame:
    return (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star (Kiveris et al. 2014, 'Connected Components in MapReduce
    and Beyond', alg. 2): every node links its LARGER neighbors to the min
    of its neighborhood. Input must be symmetric."""
    m = (
        e.groupBy("src").agg(F.min("dst").alias("_nm"))
        .select("src", F.least(F.col("src"), F.col("_nm")).alias("_m"))
    )
    return (
        e.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star (ibid., alg. 3): canonicalize each edge to (larger ->
    smaller); every node links its smaller neighbors AND itself to the min
    of those neighbors. Output is canonical (src > dst)."""
    c = (
        e.select(F.greatest("src", "dst").alias("src"),
                 F.least("src", "dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    m = c.groupBy("src").agg(F.min("dst").alias("_m"))
    relink = (
        c.join(m, "src")
        .select(F.col("dst").alias("v"), F.col("_m").alias("mn"))
        .union(m.select(F.col("src").alias("v"), F.col("_m").alias("mn")))
        .filter(F.col("v") != F.col("mn"))
        .distinct()
    )
    return relink.select(F.col("v").alias("src"), F.col("mn").alias("dst"))


def dup_clusters(pairs: DataFrame, max_iterations: int = 25,
                 checkpoint_dir: str | None = None) -> DataFrame:
    """Connected components over near-dup pairs -> ``(doc_id, cluster_id)``
    where cluster_id = min doc id in the component (the canonical keeper).

    Alternating large-star / small-star rounds (Kiveris et al. 2014): each
    round is two group-bys + joins, and the edge set collapses toward
    per-component stars in O(log² n) rounds REGARDLESS of component
    diameter — unlike min-label propagation, whose round count is the
    graph diameter (a 100-link plagiarism chain would need 100 shuffles).
    Lineage is truncated per round via :func:`materialize`
    (``checkpoint_dir`` switches the seam to durable parquet).
    """
    edges = materialize(
        _symmetrize(pairs.select(F.col("id_a").alias("src"),
                                 F.col("id_b").alias("dst"))),
        checkpoint_dir, "cc_edges")
    # every vertex of the input graph (star roots drop out of the src side
    # of the converged edge list, so remember them up front)
    vertices = materialize(
        edges.select(F.col("src").alias("doc_id")).distinct(),
        checkpoint_dir, "cc_vertices")
    prev = None
    for _ in range(max_iterations):
        stars = materialize(_small_star(_large_star(_symmetrize(edges))),
                            checkpoint_dir, "cc_round")
        if prev is not None:
            changed = (
                stars.exceptAll(prev).count() + prev.exceptAll(stars).count()
            )
            if changed == 0:
                break
        prev = stars
        edges = stars
    else:
        raise RuntimeError(
            f"dup_clusters did not converge within {max_iterations} "
            "alternating star rounds (theoretical bound is O(log² n)); "
            "raise max_iterations — silent partial labels would split "
            "real duplicate clusters")
    # converged: edges are (member -> component min) stars
    return (
        vertices.join(edges.select(F.col("src").alias("doc_id"),
                                   F.col("dst").alias("cluster_id")),
                      "doc_id", "left")
        .select("doc_id",
                F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"))
    )


# --- SimHash -----------------------------------------------------------------------

def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word hashes: bit j of the signature is the sign
    of sum over words of (+1/-1 depending on word-hash bit j)."""

    from zetasketch_spark.operators.parallelize import ensure_parallelism

    df = ensure_parallelism(df)

    @pandas_udf("long")
    def sim_udf(texts: pd.Series) -> pd.Series:
        # hash every word of the batch in one fingerprint pass, then
        # accumulate per-doc bit scores in cache-resident word chunks
        # (score = 2*popcount_sum - n_words, avoiding the signed matrix)
        word_lists = [(t or "").split() for t in texts]
        counts = np.array([len(w) for w in word_lists], dtype=np.int64)
        flat = [w for ws in word_lists for w in ws]
        out = np.zeros(len(texts), dtype=np.int64)
        if not flat:
            return pd.Series(out)
        hs = fingerprint_str_series(pd.Series(flat))
        n_docs = len(texts)
        doc_ids = np.repeat(np.arange(n_docs), counts)
        shifts = np.arange(64, dtype=np.uint64)[None, :]
        pos = np.zeros((n_docs, 64), dtype=np.int64)
        chunk = 65536
        for s in range(0, len(hs), chunk):
            e = min(s + chunk, len(hs))
            bits = ((hs[s:e, None] >> shifts) & U64(1)).astype(np.int32)
            ids = doc_ids[s:e]
            run_starts = np.flatnonzero(np.diff(ids, prepend=ids[0] - 1))
            sums = np.add.reduceat(bits, run_starts, axis=0)
            np.add.at(pos, ids[run_starts], sums)
        score = 2 * pos - counts[:, None]  # (n_docs, 64)
        sigs = ((score > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
        nonempty = counts > 0
        out[nonempty] = sigs[nonempty].view(np.int64)
        return pd.Series(out)

    return df.select(F.col(id_col), sim_udf(F.col(text_col)).alias("simhash"))


def simhash_near_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3, max_bucket: int = 512,
                      checkpoint_dir: str | None = None) -> DataFrame:
    """Candidate pairs by 16-bit prefix buckets over 4 rotations (any pair
    within Hamming distance 3 shares at least one intact 16-bit block),
    then exact Hamming filter via bit_count. Blocks wider than
    ``max_bucket`` are star-rerouted with the FULL simhash as the refine
    key (:func:`bounded_bucket_pairs`): identical-simhash copies star to
    their variant's representative (Hamming 0, always kept), distinct
    variants sharing a hot block still pair through the representatives —
    so a boilerplate pile cannot make the block join quadratic.

    Contract under capping: the Hamming-completeness theorem (every pair
    ≤ max_hamming appears) holds verbatim for pairs sharing at least one
    COLD block. Inside a hot block the emitted pair LIST is thinned, but
    the thinning is information-free: members of a refine group share the
    exact simhash, so a dropped cross pair (x_i, y_j) has the same
    Hamming distance as the emitted representative pair (rep_x, rep_y)
    and is implied by x_i–rep_x (0), rep_x–rep_y, rep_y–y_j (0) —
    connectivity and distances are fully recoverable. Star volume is
    surfaced via the ``simhash_hot_buckets`` observe node."""
    sigs = materialize(simhash64(df, text_col, id_col),
                       checkpoint_dir, "simhash_signatures")
    blocks = sigs.select(
        id_col, "simhash",
        F.posexplode(F.array(*[
            (F.shiftrightunsigned(F.col("simhash"), 16 * b).bitwiseAND(F.lit(0xFFFF)))
            for b in range(4)
        ])).alias("block", "key"),
    )
    # the signatures ride through pair generation (carry_col — they ARE
    # the refine key), so no join back to sigs is needed, and the raw
    # (per-block duplicated) pair stream is Hamming-filtered BEFORE the
    # distinct: dedupe cost scales with the ~1000x smaller survivor set
    # instead of the candidate set (measured at sf1: 7.9M candidates,
    # ~9k survivors — the candidate-set distinct + two broadcast joins
    # were ~30 s of executor CPU)
    cand = bounded_bucket_pairs(blocks, id_col, ["block", "key"],
                                max_bucket=max_bucket,
                                name="simhash_hot_buckets",
                                refine_col="simhash",
                                carry_col="simhash", distinct=False)
    return (
        cand.withColumn("hamming",
                        F.bit_count(F.col("carry_a").bitwiseXOR(F.col("carry_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
