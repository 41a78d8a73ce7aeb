"""The DuckDB shingle oracle's tokenizer must agree with Python
str.split() — the engine-side tokenization in hashing.kgram_window_hashes
— for every whitespace character real text contains. A divergence here
silently breaks the minhash/decontaminate hash-match gates."""

from __future__ import annotations


def test_oracle_whitespace_class_matches_python_split():
    import duckdb

    import __spark_entry__ as entry

    torture = [
        "plain single spaces here ok",
        "tab\tand\nnewline\rand\x0bvt\x0cff",
        "nbsp\xa0separated\xa0words now",
        "nel\x85and em-space and　cjk",
        "fs\x1cgs\x1drs\x1eus\x1f separated",
        "  leading and trailing  ",
        "runs     of      spaces",
        "",
        "shortdoc",
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(torture):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    rows = con.execute(
        entry._SHINGLE_SETS
        + "SELECT doc_id, ws FROM w ORDER BY doc_id").fetchall()
    got = {doc_id: list(ws) for doc_id, ws in rows}
    for i, t in enumerate(torture):
        assert got[i] == t.split(), (i, t, got[i], t.split())

    # and the gram construction matches kgram semantics on word counts
    sh = con.execute(
        entry._SHINGLE_SETS
        + "SELECT doc_id, len(shingles) AS n FROM sh ORDER BY doc_id"
    ).fetchall()
    for doc_id, n in sh:
        w = len(torture[doc_id].split())
        want = 0 if w == 0 else max(w - 5 + 1, 1)
        # list_distinct may collapse duplicate grams; counts can only shrink
        assert n <= want and (n > 0) == (w > 0), (doc_id, n, want)
