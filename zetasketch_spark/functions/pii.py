"""PII detection and redaction as pure Catalyst expressions.

The standard pre-training scrub: find/count/redact emails, phone numbers,
SSNs, credit-card numbers, and IPv4 addresses in a text column. Everything
is `regexp_count` / `regexp_replace` over JVM-side expressions — no Python
in the hot path, composes with any scan, and Catalyst pushes the
projection into the parquet reader.

Pattern dialect: every regex here is written in the common subset of Java
``java.util.regex`` (Spark) and RE2 (DuckDB/Go), so the same string drives
both the engine and the correctness oracle. Counting uses non-overlapping
left-to-right matches — identical semantics in both engines.

Redaction order is load-bearing: wider numeric patterns (credit card)
run before narrower ones (phone/SSN) so a partially-redacted long number
can't be re-matched by a shorter rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: name -> (pattern, redaction tag). Insertion order = redaction order.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
              "<EMAIL>"),
    "credit_card": (r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "<CC>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
}


def pii_counts(text: str | Column) -> dict[str, Column]:
    """Per-pattern match counts as named columns (``n_email`` ...)."""
    c = F.col(text) if isinstance(text, str) else text
    return {f"n_{name}": F.regexp_count(c, F.lit(pat))
            for name, (pat, _tag) in PII_PATTERNS.items()}


def redact_pii(text: str | Column) -> Column:
    """Replace every PII match with its tag, in PII_PATTERNS order."""
    c = F.col(text) if isinstance(text, str) else text
    for _name, (pat, tag) in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, tag)
    return c


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The full scrub: per-row counts + redacted text + a has_pii flag.
    One projection, zero shuffles."""
    counts = pii_counts(text_col)
    out = docs.select("*", *(c.alias(n) for n, c in counts.items()))
    any_pii = None
    for n in counts:
        any_pii = out[n] > 0 if any_pii is None else any_pii | (out[n] > 0)
    return (out.withColumn("has_pii", any_pii)
               .withColumn("redacted", redact_pii(text_col)))


def plant_pii(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Deterministically append synthetic PII to a subset of rows (the
    test corpora contain none). Mirrors the SQL in
    ``__spark_entry__.oracle_sql()['docs_pii']`` token for token, so the
    planted text is bit-identical in Spark and DuckDB."""
    i = F.col(id_col)
    s4 = F.lpad((i % 10000).cast("string"), 4, "0")
    t = F.col(text_col)
    t = F.when(i % 7 == 0,
               F.concat(t, F.lit(" user"), i.cast("string"),
                        F.lit("@example.com"))).otherwise(t)
    t = F.when(i % 11 == 3,
               F.concat(t, F.lit(" 415-555-"), s4)).otherwise(t)
    t = F.when(i % 13 == 5,
               F.concat(t, F.lit(" 10."), (i % 200).cast("string"),
                        F.lit(".0."), (i % 250).cast("string"))).otherwise(t)
    t = F.when(i % 17 == 2,
               F.concat(t, F.lit(" 123-45-"), s4)).otherwise(t)
    t = F.when(i % 19 == 7,
               F.concat(t, F.lit(" 4111-1111-1111-"), s4)).otherwise(t)
    return docs.withColumn(text_col, t)
