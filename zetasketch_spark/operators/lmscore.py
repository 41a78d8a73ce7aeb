"""Corpus language-model quality scoring (unigram log-likelihood).

The classic cheap stand-in for a KenLM perplexity filter: score every
document by its tokens' average log-probability under the corpus's own
unigram distribution. Boilerplate and fluent text score high; gibberish,
wrong-language, and character-noise documents score low (their tokens
are corpus-rare).

Pure Catalyst end to end: tokenize with the shared Unicode-whitespace
contract (``functions.text.UNICODE_WS``), one ``groupBy(token)`` for the
frequency table, one token-keyed join back, one ``groupBy(doc)``. Three
shuffles, all on compact keys; no Python. At 100 TB the frequency table
is too big to broadcast, so the join shuffles on the token key — AQE
converts it to a broadcast join automatically when a filtered vocabulary
is small enough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zetasketch_spark.functions.text import unicode_words


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token) rows, tokenized ONCE: the stream feeds both the
    frequency group-by and the scoring join, and without the lineage cut
    each reference re-ran the regex tokenizer + explode from the scan
    (measured 2×2.3 s single-task at sf1 — one-row-group inputs also
    need the row-group-aware spread for the explode to parallelize)."""
    from zetasketch_spark.operators.materialize import materialize
    from zetasketch_spark.operators.parallelize import ensure_parallelism

    toks = (ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
            .select(F.col(id_col),
                    F.explode(unicode_words(text_col)).alias("token")))
    return materialize(toks, None, "unigram_tokens")


def unigram_logprob(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document ``(id, n_tokens, avg_logprob)`` where ``avg_logprob``
    is the mean of ``ln(count(token) / total_tokens)`` under the corpus's
    own (MLE) unigram distribution — every scored token exists in the
    corpus by construction, so no smoothing is needed."""
    toks = _tokens(docs, text_col, id_col)
    freq = toks.groupBy("token").agg(F.count("*").alias("_tf"))
    total = freq.select(F.sum("_tf").alias("_total"))
    scored = (toks.join(freq, "token")
              .crossJoin(F.broadcast(total))
              .withColumn("_lp", F.log(F.col("_tf") / F.col("_total"))))
    return (scored.groupBy(id_col)
            .agg(F.count("*").alias("n_tokens"),
                 F.avg("_lp").alias("avg_logprob")))


def unigram_logprob_e4(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Order-free integer rendering of :func:`unigram_logprob` for
    cross-engine comparison: per-document ``(id, n_tokens, alp_e4)``
    where each token's log-prob is quantized to 1e-4 BEFORE any
    aggregate (``round(ln(tf/total)·10⁴)`` is one deterministic double
    op per token), the per-doc total is an integer SUM (associative in
    exact arithmetic — partition order cannot change it, unlike a float
    ``avg()``), and ``alp_e4`` is that sum divided by ``n_tokens`` and
    rounded (again a single deterministic op). The only cross-engine
    float exposure left is the libm ``ln`` ULP, which value-quantization
    makes a measure-zero risk."""
    toks = _tokens(docs, text_col, id_col)
    freq = toks.groupBy("token").agg(F.count("*").alias("_tf"))
    total = freq.select(F.sum("_tf").alias("_total"))
    scored = (toks.join(freq, "token")
              .crossJoin(F.broadcast(total))
              .withColumn("_lp_e4",
                          F.round(F.log(F.col("_tf") / F.col("_total"))
                                  * 10000).cast("long")))
    perdoc = (scored.groupBy(id_col)
              .agg(F.count("*").alias("n_tokens"),
                   F.sum("_lp_e4").alias("_sum_lp_e4")))
    return perdoc.select(
        id_col, "n_tokens",
        F.round(F.col("_sum_lp_e4") / F.col("n_tokens"))
         .cast("long").alias("alp_e4"))
