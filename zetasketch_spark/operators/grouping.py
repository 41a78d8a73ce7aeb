"""Vectorized group-index computation for the Arrow sketch fabrics.

The partial stages group each Arrow batch by the key columns and slice a
prepared (hashed/cast) value array per group. The original implementation
round-tripped the key columns through pandas (``to_pandas`` +
``groupby(...).indices``), which materializes Python objects for string
and date keys — measured ~0.3 s per million rows of (string, string)
keys, and worse for date32 (object dtype). Here each key column is
dictionary-encoded inside Arrow, the per-row dictionary codes are
combined into one int64 composite code, and a single stable argsort
yields every group's row indices as slices of one array.

Equivalence with the pandas path: the partition of row indices is
identical, and each group's indices are in ascending row order (stable
sort), so order-dependent sketch states are byte-identical. Only the
ITERATION order of groups differs (code order vs first-appearance), which
no caller depends on — partial rows are shuffled by key immediately
after.
"""

from __future__ import annotations

import numpy as np


def _codes_and_values(arr):
    """(codes int64 ndarray with -1 for null, lookup list) for one Arrow
    array/chunked array."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        d = arr
    else:
        d = arr.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False)
    if d.indices.null_count:
        codes = np.where(np.isnan(codes), -1, codes).astype(np.int64)
    else:
        codes = codes.astype(np.int64, copy=False)
    values = d.dictionary.to_pylist()
    return codes, values


def arrow_group_indices(key_arrays: dict) -> dict[tuple, np.ndarray]:
    """{key_tuple: ascending row indices} for the given ``{name: Arrow
    array}`` key columns — the drop-in replacement for
    ``pa.table(...).to_pandas().groupby(keys, sort=False,
    dropna=False).indices`` (nulls keep their groups, surfaced as None)."""
    cols = [_codes_and_values(a) for a in key_arrays.values()]
    if not cols:
        return {}
    n = len(cols[0][0])
    # composite-code capacity guard: several very-high-cardinality keys
    # could overflow int64 — fall back to the pandas path there
    cap = 1
    for _, values in cols:
        cap *= len(values) + 1
        if cap > (1 << 62):
            import pandas as pd  # noqa: F401
            import pyarrow as pa

            kpdf = pa.table(key_arrays).to_pandas()
            return kpdf.groupby(list(key_arrays), sort=False,
                                dropna=False).indices
    composite = np.zeros(n, dtype=np.int64)
    for codes, values in cols:
        composite = composite * (len(values) + 1) + (codes + 1)
    order = np.argsort(composite, kind="stable")
    sorted_comp = composite[order]
    starts = np.flatnonzero(
        np.diff(sorted_comp, prepend=sorted_comp[0] - 1 if n else 0))
    out = {}
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else n
        comp = sorted_comp[s]
        key = []
        for codes, values in reversed(cols):
            c = comp % (len(values) + 1) - 1
            comp //= len(values) + 1
            key.append(None if c < 0 else values[int(c)])
        out[tuple(reversed(key))] = order[s:e]
    return out
