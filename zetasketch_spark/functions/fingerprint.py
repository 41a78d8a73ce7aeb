"""Document fingerprinting by winnowing (Schleimer, Wilkerson, Aiken —
SIGMOD 2003): hash all word k-grams, slide a window of ``window`` hashes,
keep the minimum of each window. Any sufficiently long shared passage
between two documents is guaranteed to share fingerprints, which makes the
selected hash set a compact plagiarism / near-dup signal.

Fully batch-vectorized: positional gram hashes come from
``hashing.kgram_window_hashes`` (two fingerprint passes per batch,
zero-copy gram windows), the window minima from one strided min-reduce
over the whole batch, and per-doc dedupe from one lexsort — no
per-document Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from zetasketch_spark.hashing import kgram_window_hashes, unique_per_doc


def winnow_fingerprints_batch(texts, k: int = 5,
                              window: int = 4) -> list[np.ndarray]:
    """Per-doc sorted unique winnowed fingerprints for a batch of texts."""
    h, doc_of, n_docs = kgram_window_hashes(texts, k)
    empty = np.empty(0, dtype=np.uint64)
    if len(h) == 0:
        return [empty] * n_docs
    ng = np.bincount(doc_of, minlength=n_docs)
    doc_start = np.cumsum(ng) - ng

    # windows per doc: ng-window+1 full windows, or one whole-doc window
    # when 0 < ng <= window (Schleimer's boundary case)
    m = np.where(ng > window, ng - window + 1, np.where(ng > 0, 1, 0))
    tot = int(m.sum())
    dof = np.repeat(np.arange(n_docs, dtype=np.int64), m)
    within = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    flat_start = within + np.repeat(doc_start, m)

    mins = np.empty(tot, dtype=np.uint64)
    full = ng[dof] > window
    if full.any():
        view = np.lib.stride_tricks.sliding_window_view(h, window)
        mins[full] = view[flat_start[full]].min(axis=1)
    if (~full).any():
        # whole-doc minima via one paired reduceat: segments [s_i, e_i)
        sdocs = dof[~full]
        s = doc_start[sdocs]
        e = s + ng[sdocs]
        pairs = np.empty(2 * len(s), dtype=np.int64)
        pairs[0::2], pairs[1::2] = s, e
        if pairs[-1] == len(h):  # reduceat indices must stay < len
            pairs = pairs[:-1]
        mins[~full] = np.minimum.reduceat(h, pairs)[0::2]

    return unique_per_doc(mins, dof, n_docs)


def winnow_fingerprints(text: str, k: int = 5, window: int = 4) -> np.ndarray:
    """Selected fingerprint hashes of one document (sorted unique)."""
    return winnow_fingerprints_batch([text], k=k, window=window)[0]


def winnow_fingerprints_udf(k: int = 5, window: int = 4):
    """array<long> pandas UDF of the winnowed fingerprint set."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def fp_udf(texts: pd.Series) -> pd.Series:
        fps = winnow_fingerprints_batch(texts, k=k, window=window)
        return pd.Series([f.view(np.int64).tolist() for f in fps])

    return fp_udf
