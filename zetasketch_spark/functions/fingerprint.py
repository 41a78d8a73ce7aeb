"""Document fingerprinting by winnowing (Schleimer, Wilkerson, Aiken —
SIGMOD 2003): hash all word k-grams, slide a window of ``window`` hashes,
keep the minimum of each window. Any sufficiently long shared passage
between two documents is guaranteed to share fingerprints, which makes the
selected hash set a compact plagiarism / near-dup signal.

Vectorized: one fingerprint2011 pass over the k-grams + a
``sliding_window_view`` min-reduce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from zetasketch_spark.hashing import fingerprint_str_series


def kgram_hashes(text: str, k: int = 5) -> np.ndarray:
    words = (text or "").split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return fingerprint_str_series(pd.Series(grams))


def winnow_fingerprints(text: str, k: int = 5, window: int = 4) -> np.ndarray:
    """Selected fingerprint hashes (sorted unique uint64)."""
    hs = kgram_hashes(text, k=k)
    if len(hs) == 0:
        return hs
    if len(hs) <= window:
        return np.unique(hs.min(keepdims=True))
    win = np.lib.stride_tricks.sliding_window_view(hs, window)
    return np.unique(win.min(axis=1))


def winnow_fingerprints_udf(k: int = 5, window: int = 4):
    """array<long> pandas UDF of the winnowed fingerprint set."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def fp_udf(texts: pd.Series) -> pd.Series:
        return pd.Series([
            winnow_fingerprints(t, k=k, window=window).view(np.int64).tolist()
            for t in texts
        ])

    return fp_udf
