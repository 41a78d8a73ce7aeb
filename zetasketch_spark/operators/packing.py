"""Sequence packing: assign documents to fixed-token-budget training
chunks (the concat-then-chunk packer used to build LLM training
batches).

Semantics: within each shard (``group_col``), documents are concatenated
in ``id_col`` order into one token stream, which is then cut into
consecutive ``budget``-token chunks. A document's span
``[cum_before, cum_after)`` maps to chunks
``floor(cum_before/budget) .. floor((cum_after-1)/budget)``; a document
whose span crosses a cut is ``split``. This definition is a pure window
cumulative sum — one shuffle on the shard key, exact arithmetic, and
the identical SQL runs on any engine (the DuckDB oracle recomputes it).

At 100 TB each shard packs independently (the standard practice —
packers operate per output shard), so parallelism is the shard count
and no global coordination exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from zetasketch_spark.functions.text import unicode_words


def pack_sequences(docs: DataFrame, budget: int,
                   text_col: str = "text", id_col: str = "doc_id",
                   group_col: str = "source") -> DataFrame:
    """Per-document packing assignment: ``(group, id, n_tokens,
    cum_before, start_chunk, end_chunk, is_split)``."""
    w = (Window.partitionBy("group").orderBy("id")
         .rowsBetween(Window.unboundedPreceding, 0))
    n_tok = F.size(unicode_words(text_col))
    d = (docs.select(F.col(group_col).alias("group"),
                     F.col(id_col).alias("id"),
                     n_tok.alias("n_tokens"))
         .withColumn("cum_after", F.sum("n_tokens").over(w))
         .withColumn("cum_before", F.col("cum_after") - F.col("n_tokens"))
         .withColumn("start_chunk", F.floor(F.col("cum_before") / budget))
         # a zero-token doc occupies no span: clamp so end >= start (and
         # engines agree — floor(-1/b) differs between SQL dialects)
         .withColumn("end_chunk",
                     F.greatest(F.col("start_chunk"),
                                F.floor((F.col("cum_after") - 1) / budget))))
    return (d.withColumn("is_split", F.col("start_chunk") != F.col("end_chunk"))
            .drop("cum_after"))


def packing_stats(docs: DataFrame, budget: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  group_col: str = "source") -> DataFrame:
    """Per-shard packing report: docs, tokens, chunks needed, split
    documents, and mean chunk fill (total_tokens / (n_chunks*budget))."""
    p = pack_sequences(docs, budget, text_col, id_col, group_col)
    n_chunks = F.ceil(F.sum("n_tokens") / budget)  # 0 for an empty shard
    return (p.groupBy("group")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 n_chunks.alias("n_chunks"),
                 F.sum(F.col("is_split").cast("long")).alias("n_split_docs"),
                 F.when(n_chunks > 0,
                        F.round(F.sum("n_tokens") / (n_chunks * budget), 4))
                 .otherwise(F.lit(0.0)).alias("fill_ratio")))
