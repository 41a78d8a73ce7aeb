"""Similarity search over embedding columns (array<float>).

* **brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set against the corpus, cosine via JVM-side ``aggregate``/``zip_with``
  expressions (whole-stage codegen, no Python), rank with a window.
  At 100 TB corpus scale this is one scan + a broadcast join — no shuffle of
  the corpus — and the window partitions by query id (tiny).
* **LSH-bucketed ANN** — the scale path: random-hyperplane signbit buckets
  (seeded planes, computed by a vectorized Pandas UDF), candidates =
  bucket collisions across a few hash tables, exact re-rank of candidates
  only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import pandas_udf


def cosine_expr(a: str, b: str):
    """Cosine similarity of two array<float/double> columns, pure-expression."""
    dot = F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
                 f"cast(0.0 as double), (acc, v) -> acc + v)")
    na = F.expr(f"sqrt(aggregate({a}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))")
    nb = F.expr(f"sqrt(aggregate({b}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))")
    return dot / (na * nb)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """For each query vector: top-k corpus neighbors by cosine (excluding
    itself). Queries are broadcast; deterministic tiebreak by neighbor id."""
    from zetasketch_spark.operators.parallelize import ensure_parallelism

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    # spread the corpus: the per-row cosine (higher-order aggregate over
    # the vector) is the expensive part, and a single-row-group parquet
    # corpus otherwise evaluates it all in one task (guide §2.5); the
    # per-row arithmetic and the window ordering are partitioning-
    # independent, so the result is identical
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")))
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_expr("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 4).alias("cosine"))
    )


def _hyperplanes(dim: int, bits: int, table: int) -> np.ndarray:
    rng = np.random.default_rng(0x51A7E5 + table)
    return rng.standard_normal((bits, dim))


def signbit_buckets(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
                    dim: int = 64, bits: int = 12, tables: int = 4,
                    with_sig: bool = False) -> DataFrame:
    """(id, table, bucket) rows: bucket = signbits of `bits` random
    hyperplane projections; `tables` independent repetitions. With
    ``with_sig`` each row also carries ``_sig``, a hash of the FULL code
    vector across all tables — the hot-bucket refine key (vectors with
    identical codes in every table are sign-pattern identical)."""
    planes = [np.ascontiguousarray(_hyperplanes(dim, bits, t)) for t in range(tables)]

    @pandas_udf("array<long>")
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = []
        codes = []
        for t in range(tables):
            proj = mat @ planes[t].T  # (n, bits)
            bitsarr = (proj > 0).astype(np.uint64)
            code = np.zeros(len(mat), dtype=np.uint64)
            for j in range(bits):
                code |= bitsarr[:, j] << np.uint64(j)
            codes.append(code.astype(np.int64))
        stacked = np.stack(codes, axis=1)  # (n, tables)
        return pd.Series([row.tolist() for row in stacked])

    coded = df.select(F.col(id_col), bucket_udf(F.col(vec_col)).alias("_codes"))
    cols = [F.col(id_col)]
    if with_sig:
        cols.append(F.xxhash64(F.concat_ws(",", F.col("_codes").cast("array<string>")))
                    .alias("_sig"))
    return coded.select(
        *cols,
        F.posexplode(F.col("_codes")).alias("table", "bucket"),
    )


def train_ivf_centroids(corpus: DataFrame, vec_col: str = "embedding",
                        n_centroids: int = 16, sample: int = 4096,
                        iters: int = 10, seed: int = 7,
                        id_col: str | None = "vec_id") -> np.ndarray:
    """Mini k-means on a driver-side sample (the IVF coarse quantizer).
    At 100 TB you train on a ~10^5-row sample — the quantizer is tiny and
    broadcast; only assignment is distributed.

    The sample is hash-ordered (TakeOrderedAndProject: per-partition top-k,
    no full sort and no shuffle of the corpus), so it is deterministic AND
    unbiased across partitions — ``limit(n)`` alone would train the
    quantizer on the head of one input file."""
    sel = corpus.select(vec_col) if id_col is None else (
        corpus.orderBy(F.xxhash64(F.col(id_col))).select(vec_col))
    rows = sel.limit(sample).collect()
    x = np.vstack([np.asarray(r[0], dtype=np.float64) for r in rows])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / (np.linalg.norm(v) or 1.0)
    return cent


def _ivf_assign(df: DataFrame, centroids: np.ndarray, id_alias: str,
                id_col: str, vec_col: str, nprobe: int) -> DataFrame:
    """(id, cell) rows: nprobe nearest coarse cells per vector."""

    @pandas_udf("array<int>")
    def cells_udf(vecs: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ centroids.T
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series([row.tolist() for row in top])

    return df.select(
        F.col(id_col).alias(id_alias),
        F.explode(cells_udf(F.col(vec_col))).alias("cell"),
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_centroids: int = 16, nprobe: int = 3,
             centroids: np.ndarray | None = None) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest coarse
    cell (nprobe=1), queries probe their ``nprobe`` nearest cells; exact
    cosine re-rank on the candidates. The corpus assignment is the only
    full pass; the probe join touches ~nprobe/n_centroids of the corpus."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, vec_col, n_centroids,
                                        id_col=id_col)
    cb = _ivf_assign(corpus, centroids, "neighbor_id", id_col, vec_col, nprobe=1)
    qb = _ivf_assign(queries, centroids, "query_id", id_col, vec_col, nprobe=nprobe)
    cand = (
        qb.join(cb, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cand.join(F.broadcast(qv), "query_id").join(cv, "neighbor_id")
        .withColumn("cosine", cosine_expr("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 4).alias("cosine"))
    )


def embedding_near_dups(df: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        dim: int = 64, bits: int = 10, tables: int = 8,
                        max_bucket: int = 512,
                        checkpoint_dir: str | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: signbit-LSH candidates, exact
    cosine filter at ``threshold``. Returns (id_a, id_b, cosine) with
    id_a < id_b. Near-parallel vectors collide in some table with high
    probability at these settings; only collisions are scored. Buckets
    wider than ``max_bucket`` (near-identical embeddings by construction)
    are star-rerouted against the bucket's min-id representative so a
    degenerate corpus cannot make the self-join quadratic
    (:func:`zetasketch_spark.operators.dedup.bounded_bucket_pairs`)."""
    from zetasketch_spark.operators.dedup import bounded_bucket_pairs
    from zetasketch_spark.operators.materialize import materialize

    # materialize once: the bounded pair join references the bucket rows
    # three times (hot census, cold side, star side) — without the cut the
    # projection UDF would run three times
    b = materialize(signbit_buckets(df, vec_col, id_col, dim, bits, tables,
                                    with_sig=True),
                    checkpoint_dir, "signbit_buckets")
    cand = bounded_bucket_pairs(b, id_col, ["table", "bucket"],
                                max_bucket=max_bucket,
                                name="signbit_hot_buckets",
                                refine_col="_sig")
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn("cosine", F.round(cosine_expr("vec_a", "vec_b"), 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _cap_bucket_width(exploded: DataFrame, id_col: str,
                      bucket_cols: list[str], max_bucket: int,
                      name: str) -> DataFrame:
    """Keep at most ``max_bucket`` members per bucket, chosen by
    deterministic hash order (unbiased, reproducible). Bounds the
    per-query candidate volume when a degenerate corpus piles millions of
    near-identical vectors into one bucket; the survivors are still
    near-identical to the dropped members, so top-k quality degrades
    gracefully. Only hot buckets (tiny list, broadcast) pay the ranking
    window; cold buckets pass through untouched. Dropped volume is
    observable via the ``name`` observe node (``kept_hot_rows``,
    ``max_bucket_rows``)."""
    hot = (
        exploded.groupBy(*bucket_cols).agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") > max_bucket)
    )
    cold = exploded.join(F.broadcast(hot.select(*bucket_cols)),
                         bucket_cols, "left_anti")
    w = Window.partitionBy(*bucket_cols).orderBy(F.xxhash64(F.col(id_col)))
    kept = (
        exploded.join(F.broadcast(hot), bucket_cols)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_bucket)
        .observe(name,
                 F.count(F.lit(1)).alias("kept_hot_rows"),
                 F.max("_bn").alias("max_bucket_rows"))
        .drop("_rn", "_bn")
    )
    return cold.unionByName(kept)


def ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, bits: int = 10, tables: int = 6,
             max_bucket: int = 4096,
             checkpoint_dir: str | None = None) -> DataFrame:
    """Approximate top-k: candidates from bucket collisions, exact cosine
    re-rank of candidates only. Recall grows with `tables`; cost is the
    bucket join instead of the full cross product. Corpus buckets wider
    than ``max_bucket`` are hash-order truncated (:func:`_cap_bucket_width`)
    so one degenerate bucket cannot flood every query probing it."""
    from zetasketch_spark.operators.materialize import materialize

    # materialize once: the capping references the corpus bucket rows three
    # times (hot census, cold anti-join, kept window), which would re-run
    # the projection UDF per reference otherwise
    cb = materialize(
        signbit_buckets(corpus, vec_col, id_col, dim, bits, tables)
        .withColumnRenamed(id_col, "neighbor_id"),
        checkpoint_dir, "ann_corpus_buckets")
    cb = _cap_bucket_width(cb, "neighbor_id", ["table", "bucket"],
                           max_bucket, "ann_hot_buckets")
    qb = signbit_buckets(queries, vec_col, id_col, dim, bits, tables) \
        .withColumnRenamed(id_col, "query_id")
    cand = (
        qb.join(cb, on=["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cand.join(F.broadcast(qv), "query_id").join(cv, "neighbor_id")
        .withColumn("cosine", cosine_expr("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 4).alias("cosine"))
    )
