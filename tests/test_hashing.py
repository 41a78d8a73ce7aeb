"""Golden-vector tests for fingerprint2011.

Vectors come from two sources:
* the reference's own pinned values
  (`javatests/com/google/zetasketch/internal/hash/HashTest.java:30-57`);
* `tools/fp2011_golden.tsv`, generated from public Guava 33.4.8
  (`tools/GenHashGolden.java`) to cover all three length paths
  (<=32, 33..64, >64) and the batch entry points.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from zetasketch_spark.hashing import (
    fingerprint_bytes,
    fingerprint_bytes_batch,
    fingerprint_int_array,
    fingerprint_long_array,
    fingerprint_str_series,
    hash_int,
    hash_long,
    hash_str,
)

GOLDEN_TSV = os.path.join(os.path.dirname(__file__), "..", "tools", "fp2011_golden.tsv")


# --- reference HashTest.java pinned values ---------------------------------

def test_of_bytes_reference_golden():
    assert fingerprint_bytes(b"") == 0x23AD7C904AA665E3
    assert fingerprint_bytes(bytes([0x66, 0x6F, 0x6F, 0x62, 0x61, 0x72])) == 0x36A1E57A138E4467


def test_of_int_reference_golden():
    assert hash_int(0) == 0x1F6E43FF4B5270EE
    assert hash_int(42) == 0x5CBDED943BFFDDD3
    assert hash_int(-15) == 0xFD5A96B7669422C1


def test_of_long_reference_golden():
    assert hash_long(0) == 0x853A22BD6E14A48F
    assert hash_long(42) == 0x583B2B9DF8E0EB60
    assert hash_long(-15) == 0x539414F287F11E37


def test_of_string_reference_golden():
    assert hash_str("") == 0x23AD7C904AA665E3
    assert hash_str("foo") == 0xD0BCBFE261B36504
    assert hash_str("Zürich") == 0x27EFC00F7D2CE548
    # Unicode strings must not be normalized
    assert hash_str("Zürich") == 0x7DFA3067E55C7E8A


# --- extended Guava-generated corpus ----------------------------------------

def _load_golden():
    rows = []
    with open(GOLDEN_TSV) as f:
        for line in f:
            kind, key, val = line.rstrip("\n").split("\t")
            rows.append((kind, key, int(val)))
    return rows


@pytest.fixture(scope="module")
def golden():
    return _load_golden()


def _pattern(n: int) -> bytes:
    return bytes((i * 131 + 7) & 0xFF for i in range(n))


def test_bytes_all_length_paths(golden):
    cases = [(int(k), v) for kind, k, v in golden if kind == "bytes"]
    assert len(cases) > 30
    bufs = [_pattern(n) for n, _ in cases]
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    lengths = np.array([len(b) for b in bufs], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    got = fingerprint_bytes_batch(flat, offs, lengths)
    want = np.array([v for _, v in cases], dtype=np.uint64)
    mismatches = [(cases[i][0], int(got[i]), int(want[i])) for i in range(len(cases)) if got[i] != want[i]]
    assert mismatches == []


def test_long_batch(golden):
    cases = [(int(k), v) for kind, k, v in golden if kind == "long"]
    got = fingerprint_long_array(np.array([c[0] for c in cases], dtype=np.int64))
    assert got.tolist() == [c[1] for c in cases]


def test_int_batch(golden):
    cases = [(int(k), v) for kind, k, v in golden if kind == "int"]
    got = fingerprint_int_array(np.array([c[0] for c in cases], dtype=np.int32))
    assert got.tolist() == [c[1] for c in cases]


def test_str_series(golden):
    cases = [(k, v) for kind, k, v in golden if kind == "str"]
    got = fingerprint_str_series(pd.Series([c[0] for c in cases]))
    assert got.tolist() == [c[1] for c in cases]


def test_str_series_nulls():
    got = fingerprint_str_series(pd.Series(["foo", None, ""]))
    assert got[0] == 0xD0BCBFE261B36504
    assert got[1] == 0
    assert got[2] == 0x23AD7C904AA665E3


def test_batch_matches_scalar_random_lengths():
    rng = np.random.default_rng(42)
    bufs = [bytes(rng.integers(0, 256, size=int(n), dtype=np.uint8)) for n in rng.integers(0, 300, size=64)]
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    lengths = np.array([len(b) for b in bufs], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    got = fingerprint_bytes_batch(flat, offs, lengths)
    for i, b in enumerate(bufs):
        assert int(got[i]) == fingerprint_bytes(b)


# --- FLOAT/DOUBLE hash recipes (proto/aggregator.proto:121-130) -------------

FLOAT_GOLDEN_TSV = os.path.join(os.path.dirname(__file__), "..", "tools",
                                "fpfloat_golden.tsv")


def test_float_double_guava_goldens():
    """tools/fpfloat_golden.tsv: Guava-generated fingerprints of the LE
    IEEE754 bytes (GenFloatHashGolden.java) — the same library the
    reference delegates hashing to (internal/hash/Hash.java:19)."""
    from zetasketch_spark.hashing import (
        fingerprint_double_array, fingerprint_float_array)

    doubles, dexp, floats, fexp = [], [], [], []
    with open(FLOAT_GOLDEN_TSV) as fh:
        for line in fh:
            kind, raw, h = line.rstrip("\n").split("\t")
            if kind == "double":
                doubles.append(float(raw))
                dexp.append(int(h))
            else:
                floats.append(np.float32(raw))
                fexp.append(int(h))
    got_d = fingerprint_double_array(np.array(doubles, dtype=np.float64))
    assert got_d.tolist() == dexp
    got_f = fingerprint_float_array(np.array(floats, dtype=np.float32))
    assert got_f.tolist() == fexp


def test_float_double_hll_typed_adds():
    from zetasketch_spark.hll import (
        VALUE_TYPE_DOUBLE, VALUE_TYPE_FLOAT, HllSketch)

    rng = np.random.default_rng(3)
    vals = rng.standard_normal(5000)
    sk = HllSketch(precision=14)
    sk.add_doubles(vals)
    sk.add_doubles(vals)  # duplicates must not change the estimate
    est = sk.estimate()
    assert abs(est / 5000 - 1) <= 3 * 1.04 / np.sqrt(2 ** 14)
    assert sk.value_type == VALUE_TYPE_DOUBLE
    with pytest.raises(ValueError):
        sk.add_floats(vals.astype(np.float32))

    fk = HllSketch(precision=14)
    fk.add_floats(vals.astype(np.float32))
    assert fk.value_type == VALUE_TYPE_FLOAT
    # FLOAT and DOUBLE are distinct recipes: merging them must refuse
    with pytest.raises(ValueError):
        sk.merge(fk)


def test_float_double_arrow_path_matches_series_path():
    import pyarrow as pa

    from zetasketch_spark.sketches.base import HllFamily

    rng = np.random.default_rng(4)
    vals = rng.standard_normal(2000)
    fam = HllFamily(precision=13)
    via_series = fam.make()
    fam.update(via_series, pd.Series(vals))
    via_arrow = fam.make()
    prepared = fam.prepare_arrow(pa.array(vals, type=pa.float64()))
    fam.update_prepared(via_arrow, prepared[np.arange(len(vals))])
    assert fam.serialize(via_series) == fam.serialize(via_arrow)


def test_dictionary_array_hashes_match_plain():
    """Dictionary-encoded columns (parquet's encoding for repetitive
    strings) must hash identically to their decoded form, with nulls
    masked the same way."""
    import pyarrow as pa

    from zetasketch_spark.hashing import fingerprint_arrow_array

    vals = ["alpha", "beta", "gamma", None, "alpha", "beta", "alpha"]
    plain = pa.array(vals, type=pa.string())
    dictarr = plain.dictionary_encode()
    hp, vp = fingerprint_arrow_array(plain)
    hd, vd = fingerprint_arrow_array(dictarr)
    assert (vp == vd).all()
    assert (hp[vp] == hd[vd]).all()


def test_dictionary_float_nan_value_masked():
    """A NaN stored as a dictionary VALUE must be masked just like a NaN in
    a plain float array (fabric NaN-parity through the dictionary gather)."""
    import pyarrow as pa

    from zetasketch_spark.hashing import fingerprint_arrow_array

    vals = [1.5, float("nan"), 2.5, None, 1.5, float("nan")]
    plain = pa.array(vals, type=pa.float64())
    dictarr = plain.dictionary_encode()
    hp, vp = fingerprint_arrow_array(plain)
    hd, vd = fingerprint_arrow_array(dictarr)
    assert vd is not None
    assert (vp == vd).all()          # NaN slots invalid on both fabrics
    assert (hp[vp] == hd[vd]).all()
    assert list(vd) == [True, False, True, False, True, False]


# --- narrow fixed-width recipes (proto/aggregator.proto:77-120) -------------

NARROW_TSV = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "fp_narrow_golden.tsv")


def _load_narrow():
    rows = []
    with open(NARROW_TSV) as f:
        for line in f:
            kind, key, val = line.rstrip("\n").split("\t")
            rows.append((kind, int(key), int(val)))
    return rows


def test_int8_recipe_guava_golden():
    from zetasketch_spark.hashing import fingerprint_int8_array

    cases = [(k, v) for kind, k, v in _load_narrow() if kind == "int8"]
    assert len(cases) >= 8
    got = fingerprint_int8_array(np.array([k for k, _ in cases], dtype=np.int8))
    assert [int(h) for h in got] == [v for _, v in cases]


def test_int16_recipe_guava_golden():
    from zetasketch_spark.hashing import fingerprint_int16_array

    cases = [(k, v) for kind, k, v in _load_narrow() if kind == "int16"]
    assert len(cases) >= 12
    got = fingerprint_int16_array(np.array([k for k, _ in cases], dtype=np.int16))
    assert [int(h) for h in got] == [v for _, v in cases]


def test_unsigned_widths_share_byte_recipe():
    """UINT8/UINT16 hash the same byte strings as INT8/INT16 at equal bit
    pattern (the proto specifies the byte string, not the sign), and both
    equal fingerprint2011 of the raw bytes."""
    from zetasketch_spark.hashing import (
        fingerprint_int8_array,
        fingerprint_int16_array,
        fingerprint_uint8_array,
        fingerprint_uint16_array,
    )

    s8 = np.array([0, 1, -1, 127, -128], dtype=np.int8)
    u8 = s8.view(np.uint8)
    assert (fingerprint_int8_array(s8) == fingerprint_uint8_array(u8)).all()
    for v in u8:
        assert fingerprint_uint8_array(np.array([v], dtype=np.uint8))[0] == \
            fingerprint_bytes(bytes([int(v)]))

    s16 = np.array([0, 1, -1, 32767, -32768, 255, 256], dtype=np.int16)
    u16 = s16.view(np.uint16)
    assert (fingerprint_int16_array(s16) == fingerprint_uint16_array(u16)).all()
    for v in u16:
        assert fingerprint_uint16_array(np.array([v], dtype=np.uint16))[0] == \
            fingerprint_bytes(int(v).to_bytes(2, "little"))


def test_signed_wide_ids_reuse_pinned_kernels():
    """INT32/INT64 (ids 3/4) specify byte-identical hashes to UINT32/UINT64:
    the proto's 'little endian bytes of 2s complement' IS the unsigned LE
    byte string at equal bit pattern."""
    vals32 = np.array([0, 42, -15, 2**31 - 1, -(2**31)], dtype=np.int32)
    vals64 = np.array([0, 42, -15, 2**63 - 1, -(2**63)], dtype=np.int64)
    assert (fingerprint_int_array(vals32) ==
            fingerprint_int_array(vals32.view(np.uint32).view(np.int32))).all()
    assert (fingerprint_long_array(vals64) ==
            fingerprint_long_array(vals64.view(np.uint64).view(np.int64))).all()


def test_boolean_arrow_matches_pandas_fabric():
    """Bool columns: arrow fabric renders 'True'/'False' exactly like the
    pandas fabric's str() fallback (was: TypeError), nulls masked."""
    import pyarrow as pa

    from zetasketch_spark.hashing import fingerprint_arrow_array
    from zetasketch_spark.sketches.base import HllFamily

    arr = pa.array([True, False, None, True])
    h, valid = fingerprint_arrow_array(arr)
    assert list(valid) == [True, True, False, True]
    assert h[0] == fingerprint_str_series(pd.Series(["True"]))[0]
    assert h[1] == fingerprint_str_series(pd.Series(["False"]))[0]

    fam = HllFamily(precision=12)
    via_arrow = fam.make()
    prepared = fam.prepare_arrow(arr)
    fam.update_prepared(via_arrow, prepared[np.arange(len(arr))])
    via_pandas = fam.make()
    fam.update(via_pandas, pd.Series([True, False, None, True]))
    assert via_arrow.serialize() == via_pandas.serialize()


def test_decimal_arrow_matches_pandas_fabric():
    """Decimal columns: both fabrics render str(Decimal) ('1.50', scale
    preserved) — was a TypeError on both — and build byte-equal states."""
    from decimal import Decimal

    import pyarrow as pa

    from zetasketch_spark.sketches.base import HllFamily

    fam = HllFamily(precision=12)
    vals = [Decimal("1.50"), Decimal("2.25"), None, Decimal("1.50")]
    arr = pa.array(vals, type=pa.decimal128(10, 2))
    via_arrow = fam.make()
    fam.update_prepared(via_arrow, fam.prepare_arrow(arr)[np.arange(4)])
    via_pandas = fam.make()
    fam.update(via_pandas, pd.Series(vals))
    assert via_arrow.serialize() == via_pandas.serialize()
    assert via_arrow.estimate() == 2
