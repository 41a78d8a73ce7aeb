"""Bit-level encoding parity tests, ported from
`javatests/.../internal/hllplus/EncodingNormalTest.java:33-76` and
`EncodingSparseTest.java:41-260` (literal bit-pattern expectations)."""

from __future__ import annotations

import numpy as np
import pytest

from zetasketch_spark.hll import (
    IncompatiblePrecisionError,
    SparseEncoding,
    downgrade_rho_w,
    rho_w,
)


def _arr(*vals):
    return np.array(vals, dtype=np.int64)


def _h(v):
    return np.array([v], dtype=np.uint64)


# --- normal encoding (EncodingNormalTest) ------------------------------------

def test_normal_index():
    h = np.uint64(0b101110001 << 55)
    assert int(h >> np.uint64(64 - 5)) == 0b10111


def test_normal_rho_w():
    # 3 leading zeros after the 5-bit index -> rhoW = 4
    assert rho_w(_h(0b101110001 << 55), 64 - 5).tolist() == [4]


def test_downgrade_index():
    assert (0b10111 >> (5 - 3)) == 0b101


def test_downgrade_rho_w_non_zero():
    # index 0b10001 at p=5 -> p=3: suffix 0b01 nonzero, new rhoW = clz+1 = 2
    out = downgrade_rho_w(_arr(0b10001), _arr(4), 5, 3)
    assert out.tolist() == [2]


def test_downgrade_rho_w_zero_suffix():
    # index 0b10000: suffix all zeros -> rhoW + 5 - 3 = 6
    out = downgrade_rho_w(_arr(0b10000), _arr(4), 5, 3)
    assert out.tolist() == [6]


# --- sparse encoding (EncodingSparseTest) ------------------------------------

@pytest.fixture
def enc47():
    return SparseEncoding(4, 7)


def test_decode_normal_index(enc47):
    assert enc47.decode_normal_index(_arr(0b1010100)).tolist() == [0b1010]
    assert enc47.decode_normal_index(_arr(0b11010001100)).tolist() == [0b1010]


def test_decode_normal_rho(enc47):
    assert enc47.decode_normal_rho(_arr(0b1010100)).tolist() == [1]
    assert enc47.decode_normal_rho(_arr(0b11010001100)).tolist() == [0b1100 + 3]


def test_decode_sparse_index(enc47):
    assert enc47.decode_sparse_index(_arr(0b1010100)).tolist() == [0b1010100]
    assert enc47.decode_sparse_index(_arr(0b11010001100)).tolist() == [0b1010000]


def test_decode_sparse_rho_if_present(enc47):
    assert enc47.decode_sparse_rho_if_present(_arr(0b1010100)).tolist() == [0]
    assert enc47.decode_sparse_rho_if_present(_arr(0b11010001100)).tolist() == [0b1100]


def test_dedupe(enc47):
    values = _arr(
        0b00000010100, 0b00001010100, 0b00001010101,
        0b11010001100, 0b11010010000, 0b11110000000)
    out = enc47.dedupe_sorted(values)
    assert out.tolist() == [
        0b00000010100, 0b00001010100, 0b00001010101, 0b11010010000, 0b11110000000]


def test_dedupe_exact_duplicates(enc47):
    values = _arr(0b00000010100, 0b00000010100, 0b00000010100,
                  0b11010001100, 0b11010001100, 0b11010001100)
    assert enc47.dedupe_sorted(values).tolist() == [0b00000010100, 0b11010001100]


def test_encode_without_rho(enc47):
    assert enc47.encode_hashes(_h(0b101100101 << 55)).tolist() == [0b1011001]


def test_encode_without_rho_at_max_sparse_precision():
    enc = SparseEncoding(4, 30)
    assert enc.encode_hashes(_h(0b101100101 << 55)).tolist() == [0b101100101 << 21]


def test_encode_with_rho_at_max_normal_precision():
    enc = SparseEncoding(24, 26)
    assert enc.encode_hashes(_h(0b101 << 61)).tolist() == [
        (1 << 30) | (0b101 << 27) | 39]


def test_encode_with_rho_at_min_normal_precision():
    enc = SparseEncoding(1, 5)
    assert enc.encode_hashes(_h(0b1 << 63)).tolist() == [
        (1 << 7) | (0b1 << 6) | 60]


def test_encode_with_rho_flag_clear_of_normal_index(enc47):
    assert enc47.encode_hashes(_h(0b101100001 << 55)).tolist() == [
        (1 << 10) | (0b1011 << 6) | 2]


def test_compatibility_partial_order():
    SparseEncoding(4, 7).assert_compatible(SparseEncoding(4, 7))
    SparseEncoding(4, 7).assert_compatible(SparseEncoding(3, 6))
    SparseEncoding(4, 7).assert_compatible(SparseEncoding(5, 8))
    with pytest.raises(IncompatiblePrecisionError):
        SparseEncoding(4, 7).assert_compatible(SparseEncoding(5, 6))
    with pytest.raises(IncompatiblePrecisionError):
        SparseEncoding(4, 7).assert_compatible(SparseEncoding(3, 8))


# --- delta+varint byte goldens (DifferenceEncoder/DecoderTest.java) ----------

def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_delta_varint_reference_byte_goldens():
    """Exact byte sequences from `DifferenceEncoderTest.java:32-73`:
    deltas of (42,), (42,42), (42,170,2903), (0,) as LEB128 varints; and
    the decoder side's 4-element stream (`DifferenceDecoderTest.java:47-69`)."""
    import numpy as np

    from zetasketch_spark.hll import delta_varint_decode, delta_varint_encode

    def enc(vals):
        return delta_varint_encode(np.array(vals, dtype=np.int64))

    assert enc([42]) == _varint(42)
    assert enc([42, 42]) == _varint(42) + _varint(0)
    assert enc([42, 170, 2903]) == \
        _varint(42) + _varint(170 - 42) + _varint(2903 - 170)
    assert enc([0]) == _varint(0)

    stream = (_varint(42) + _varint(170 - 42) + _varint(2903 - 170)
              + _varint(20160531 - 2903))
    assert delta_varint_decode(stream).tolist() == [42, 170, 2903, 20160531]
    assert delta_varint_decode(b"").tolist() == []


def test_delta_varint_encode_validates_input():
    """`DifferenceEncoderTest.java:75-96`: negative and unsorted inputs
    raise instead of silently wrapping into garbage sparse data."""
    import numpy as np
    import pytest

    from zetasketch_spark.hll import delta_varint_encode

    with pytest.raises(ValueError, match="only positive"):
        delta_varint_encode(np.array([-1], dtype=np.int64))
    with pytest.raises(ValueError, match="ascending order"):
        delta_varint_encode(np.array([42, 12], dtype=np.int64))


def test_sparse_value_downgrade_representation_patterns():
    """`SparseRepresentationTest.java:44-126`: adding sparse values encoded
    at (p=11, sp=15) into a (10, 13) representation downgrades them to the
    pinned bit patterns; values already at lower precision pass through
    unchanged. Exercised through the same downgrade + sort + dedupe
    pipeline a cross-precision sparse merge uses."""
    import numpy as np

    from zetasketch_spark.hll import SparseEncoding

    src = SparseEncoding(11, 15)
    dst = SparseEncoding(10, 13)

    got = dst.dedupe_sorted(np.sort(src.downgrade(
        np.array([0b000000000011111], dtype=np.int64), dst)))
    assert got.tolist() == [0b000000000111]

    got = dst.dedupe_sorted(np.sort(src.downgrade(
        np.array([0b000000000000001, 0b000000000011111], dtype=np.int64), dst)))
    assert got.tolist() == [0b000000000111, 0b10000000000000010]

    # lower-precision values land unchanged in their own encoding
    same = SparseEncoding(10, 13)
    vals = np.array([0b0000000000001, 0b0000000001111], dtype=np.int64)
    got = same.dedupe_sorted(np.sort(same.downgrade(vals, dst)))
    assert got.tolist() == vals.tolist()
