"""Byte-exact parity against MACHINE-GENERATED reference states.

``tools/refgolden/ref_state_golden.tsv`` is produced by compiling the
reference's own HLL++ core UNMODIFIED (State / SparseRepresentation /
NormalRepresentation / Encoding / Data + the byte-slice and varint
helpers, see tools/refgolden/build_and_gen.sh) against small compile
shims, and running it over deterministic value streams. Each row is the
full serialized AggregatorStateProto in hex.

This replays every stream through our HllSketch and requires the
serialized bytes to match EXACTLY — pinning hash recipes, sparse
encodings (both formats), buffer-flush and upgrade boundaries, merge
(including cross-precision downgrades in both directions), and the proto
envelope, at realistic precisions (p in {10, 13, 15, 20}) far beyond the
hand-copied p=4 goldens in test_hll_core.py.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tools", "refgolden",
                      "ref_state_golden.tsv")


def _build(part: str):
    from zetasketch_spark.hll import HllSketch

    kind, arg, n, p, sp = part.split(":")
    n, p, sp = int(n), int(p), int(sp)
    sk = HllSketch(precision=p, sparse_precision=(sp if sp > 0 else None),
                   no_sparse=(sp == 0))
    if kind == "long":
        sk.add_longs(np.arange(int(arg), int(arg) + n, dtype=np.int64))
    elif kind == "int":
        sk.add_ints(np.arange(int(arg), int(arg) + n, dtype=np.int32))
    elif kind == "str":
        sk.add_strings(pd.Series([f"{arg}{i}" for i in range(n)]))
    else:
        raise ValueError(part)
    return sk


def _cases():
    with open(GOLDEN) as f:
        for line in f:
            name, p, sp, vt, spec, hexbytes = line.rstrip("\n").split("\t")
            yield pytest.param(spec, int(vt), hexbytes, id=name)


@pytest.mark.parametrize("spec,vt,hexbytes", _cases())
def test_reference_golden_state(spec, vt, hexbytes):
    from zetasketch_spark.hll import HllSketch

    parts = spec.split("|")
    sk = _build(parts[0])
    for part in parts[1:]:
        sk.merge(_build(part))
    blob = sk.serialize()
    assert blob.hex() == hexbytes
    # and the bytes round-trip through our parser to the same value type
    rt = HllSketch.deserialize(blob)
    assert rt.value_type == vt
    assert rt.serialize().hex() == hexbytes
