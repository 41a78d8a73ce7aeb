"""Text-analysis columns for training-data pipelines.

Everything here is built from JVM-side ``pyspark.sql.functions`` expressions
(whole-stage codegen, no Python in the hot path) so Catalyst can prune and
push down around them. Each helper returns a Column; the mirrored ANSI-SQL
forms live in ``__spark_entry__.oracle_sql`` so DuckDB can verify them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# small fixed stopword sets for the language-ID heuristic
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr": ("le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"),
    "es": ("el", "la", "los", "que", "de", "no", "una", "por", "con", "para"),
}

PUNCT_CLASS = "[.,!?;:]"


def tokens(text: str | Column) -> Column:
    return F.split(F.col(text) if isinstance(text, str) else text, " ")


def token_count(text: str | Column) -> Column:
    """Whitespace token count (the 'BPE-ish' proxy: ~0.75 tokens/word is a
    constant factor at corpus scale, so relative stats are unchanged)."""
    # LongType, not IntegerType: gate outputs must be int64 on both engines
    # (DuckDB's pandas path widens everything integral to int64 at best).
    return F.size(tokens(text)).cast("long")


BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def bpe_ish_token_count(text_col: str) -> Column:
    """Sub-word-ish token count: letter runs, single digits, and punctuation
    each count as one token (the regex family BPE tokenizers approximate;
    same pattern evaluates identically in Java regex and RE2/DuckDB)."""
    # Spark SQL string literals consume one level of backslash escaping
    sql_pattern = BPE_ISH_PATTERN.replace("\\", "\\\\")
    return F.expr(f"size(regexp_extract_all({text_col}, '{sql_pattern}', 0))")


def char_count(text: str | Column) -> Column:
    return F.length(F.col(text) if isinstance(text, str) else text)


def punct_count(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return (F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))).cast("long")


def stopword_hits(text_col: str, lang: str = "en") -> Column:
    """Count of tokens that are stopwords of ``lang`` (needs a plain column
    name — the lambda runs inside ``F.expr``)."""
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(f"size(filter(split({text_col}, ' '), w -> w in ({in_list})))").cast("long")


def quality_score(text_col: str) -> Column:
    """Composite quality heuristic in [0, ~1]: length sweet spot, low punct
    density, nonzero stopword ratio. Pure-expression, so it runs at scan
    speed and can gate a 100 TB filter without a shuffle."""
    n_tok = token_count(text_col).cast("double")
    n_chr = char_count(text_col).cast("double")
    punct = punct_count(text_col).cast("double")
    stop = stopword_hits(text_col).cast("double")
    length_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(n_chr > 0, 1.0 - F.least(F.lit(1.0), punct * 10.0 / n_chr)).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, F.least(F.lit(1.0), stop * 10.0 / n_tok)).otherwise(F.lit(0.0))
    return F.round((length_ok + punct_ok + stop_ratio) / 3.0, 4)


def lang_scores(text_col: str) -> dict[str, Column]:
    return {lang: stopword_hits(text_col, lang) for lang in STOPWORDS}


def lang_id(text_col: str) -> Column:
    """Argmax language by stopword hits, deterministic tiebreak en>de>fr>es.
    Mirrors the CASE cascade in the oracle SQL exactly."""
    s = lang_scores(text_col)
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), F.lit("en"))
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), F.lit("de"))
        .when(s["fr"] >= s["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def normalized_text(text: str | Column) -> Column:
    """Canonical form for near-dup detection: lowercase, strip non-alnum,
    collapse whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.lower(c)
    c = F.regexp_replace(c, "[^a-z0-9 ]", "")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def doc_fingerprint(text: str | Column) -> Column:
    """Exact-dedup fingerprint (md5 of the raw text) — cheap, exact,
    engine-portable."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


#: Java-regex class matching the characters Python str.split() treats as
#: whitespace (Java \s alone is ASCII-only) — the ONE tokenization
#: contract shared with hashing.kgram_window_hashes and the DuckDB
#: oracles' _WS_CLASS; NBSP/NEL/Unicode-space documents must count words
#: identically everywhere.
UNICODE_WS = (r"[\s\u001c-\u001f\u0085\u00a0\u1680"
              r"\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]+")


def unicode_words(text: str | Column) -> Column:
    """The ONE word-tokenization expression (split on UNICODE_WS, drop
    empties) shared by every operator and the DuckDB oracles' _WS_CLASS —
    change it here or nowhere."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, UNICODE_WS), lambda w: w != "")


def gopher_quality_flags(text_col: str) -> dict[str, Column]:
    """The document-level Gopher quality rules (Rae et al. 2021, table A1
    subset) as pure Catalyst expressions — word count bounds, mean word
    length bounds, and alphabetic-word ratio. Returns named boolean
    columns; a doc passes the filter when all are true. No Python, no
    shuffle: composes with any scan."""
    words = unicode_words(text_col)
    n_words = F.size(words)
    total_chars = F.aggregate(words, F.lit(0),
                              lambda acc, w: acc + F.length(w))
    mean_len = F.when(n_words > 0, total_chars / n_words).otherwise(F.lit(0.0))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    alpha_ratio = F.when(n_words > 0, alpha_words / n_words).otherwise(F.lit(0.0))
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(mean_len, 4),
        "alpha_ratio": F.round(alpha_ratio, 4),
        "words_ok": (n_words >= 50) & (n_words <= 100_000),
        "mean_len_ok": (mean_len >= 3) & (mean_len <= 10),
        "alpha_ok": alpha_ratio >= 0.8,
    }
