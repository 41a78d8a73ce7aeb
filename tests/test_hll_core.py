"""HLL++ core tests, mirroring the reference's test strategy (SURVEY.md §5).

Golden expectations come from
`javatests/com/google/zetasketch/HyperLogLogPlusPlusTest.java` (tiny-state
serialization `:1249-1322`, small-stream estimates `:600-610`, merge matrix
`:712-830`) and `HyperLogLogPlusPlusMergeTest.java:36-73` (merge == direct
at the serialized-state level).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zetasketch_spark.hll import (
    HllSketch,
    IncompatiblePrecisionError,
    VALUE_TYPE_UINT32,
    VALUE_TYPE_UINT64,
    delta_varint_decode,
    delta_varint_encode,
)


# --- golden tiny states ------------------------------------------------------

def test_golden_normal_only_add42():
    """`lowestPrecision_basicOps_normalOnly` (:1255-1295): p=4, noSparse,
    add(42L) -> registers [0,0,0,0,0,1,0*10], estimate 1, exact proto bytes."""
    sk = HllSketch(precision=4, no_sparse=True)
    sk.add_longs([42])
    assert sk.estimate() == 1
    assert sk.registers.tolist() == [0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    expected = bytes(
        [0x08, 0x70,  # type = HYPERLOGLOG_PLUS_UNIQUE (112)
         0x10, 0x01,  # num_values = 1
         0x18, 0x02,  # encoding_version = 2
         0x20, 0x08,  # value_type = UINT64
         0x82, 0x07, 0x14,  # hll ext, 20 bytes
         0x18, 0x04,  # precision = 4
         0x2A, 0x10] + [0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    )
    assert sk.serialize() == expected
    rt = HllSketch.deserialize(expected)
    assert rt.p == 4 and rt.sp == 0 and rt.estimate() == 1 and rt.num_values == 1
    assert rt.serialize() == expected


def test_golden_sparse_add42():
    """`lowestPrecision_basicOps_withSparse` (:1297-1322): p=4, sp=4,
    add(42L) -> sparse_size=1, sparse_data=[0xC1, 0x0A], estimate 1."""
    sk = HllSketch(precision=4, sparse_precision=4)
    sk.add_longs([42])
    assert sk.estimate() == 1
    data = sk.serialize()
    expected = bytes(
        [0x08, 0x70,
         0x10, 0x01,
         0x18, 0x02,
         0x20, 0x08,
         0x82, 0x07, 0x0A,  # hll ext, 10 bytes
         0x10, 0x01,  # sparse_size = 1
         0x18, 0x04,  # precision = 4
         0x20, 0x04,  # sparse_precision = 4
         0x32, 0x02, 0xC1, 0x0A]  # sparse_data
    )
    assert data == expected
    rt = HllSketch.deserialize(data)
    assert rt.mode == "sparse" and rt.estimate() == 1
    assert rt.serialize() == expected


def test_golden_default_precisions_and_small_stream():
    """`serializeToBytes` (:1109-1140): defaults p=15/sp=25; ints 1,2,3 ->
    num_values=3, sparse_size=3. `add [1,2,3,2,3] -> estimate 3` (:600-610)."""
    sk = HllSketch()
    assert sk.p == 15 and sk.sp == 20  # defaults: p=15, sp=min(p+5, 25)
    sk.add_ints([1, 2, 3, 2, 3])
    assert sk.estimate() == 3
    assert sk.num_values == 5
    sk2 = HllSketch()
    sk2.add_ints([1, 2, 3])
    sk2.compact()
    assert len(sk2.sparse_values) == 3
    assert sk2.value_type == VALUE_TYPE_UINT32


def test_empty_aggregator_serializes_empty_sparse_data():
    """`serializeToProto_EmptyAggregatorSetsEmptySparseDataField` (:1211-1221):
    sparse_data field present with size 0."""
    sk = HllSketch(precision=13, sparse_precision=16,
                   value_type=VALUE_TYPE_UINT64)
    data = sk.serialize()
    # inner message must end with tag 0x32 (sparse_data) and length 0
    assert data[-2:] == bytes([0x32, 0x00])
    rt = HllSketch.deserialize(data)
    assert rt.mode == "sparse" and rt.estimate() == 0 and rt.num_values == 0


# --- merge matrix (:712-830) -------------------------------------------------

def _sparse(values, p=15, sp=20):
    sk = HllSketch(precision=p, sparse_precision=sp)
    sk.add_longs(values)
    return sk


def _normal(values, p=15):
    sk = HllSketch(precision=p, no_sparse=True)
    sk.add_longs(values)
    return sk


@pytest.mark.parametrize("make_a", [_sparse, _normal])
@pytest.mark.parametrize("make_b", [_sparse, _normal])
def test_merge_matrix(make_a, make_b):
    a = make_a([1, 2, 3])
    b = make_b([3, 4])
    a.merge(b)
    assert a.estimate() == 4
    assert a.num_values == 5


@pytest.mark.parametrize("pa,pb", [(15, 13), (13, 15)])
def test_merge_cross_precision(pa, pb):
    a = _normal([1, 2, 3], p=pa)
    b = _normal([3, 4], p=pb)
    a.merge(b)
    assert a.p == 13  # min precision wins
    assert a.estimate() == 4


def test_merge_sparse_cross_precision_downgrades():
    a = _sparse([1, 2, 3], p=15, sp=20)
    b = _sparse([3, 4], p=13, sp=16)
    a.merge(b)
    assert (a.p, a.sp) == (13, 16)
    assert a.estimate() == 4
    # state must equal a direct build at the lower precision
    direct = _sparse([1, 2, 3, 4], p=13, sp=16)
    direct.num_values = 5
    assert a.serialize() == direct.serialize()


def test_merge_incompatible_precisions_raises():
    a = _sparse([1], p=12, sp=17)
    b = _sparse([2], p=13, sp=16)
    with pytest.raises(IncompatiblePrecisionError):
        a.merge(b)


def test_merge_normal_into_sparse_disables_sparse():
    """Merging a no-sparse sketch forces sp -> min(sp, 0) = 0
    (`NormalRepresentation.java:196-198`)."""
    a = _sparse([1, 2, 3])
    b = _normal([3, 4])
    a.merge(b)
    assert a.mode == "normal" and a.sp == 0
    assert a.estimate() == 4


def test_builder_precision_validation():
    """Builder bounds (`HyperLogLogPlusPlusTest.java:300-331`): p in [4,24],
    sp in [p,25] or 0."""
    for p in (3, 25):
        with pytest.raises(ValueError, match=r"\[4,24\]"):
            HllSketch(precision=p)
    with pytest.raises(ValueError):
        HllSketch(precision=10, sparse_precision=26)
    with pytest.raises(ValueError):
        HllSketch(precision=10, sparse_precision=9)
    assert HllSketch(precision=4).sp == 9
    assert HllSketch(precision=24).sp == 25  # capped at MAXIMUM_SPARSE_PRECISION


def test_merge_null_and_empty_are_noops():
    """`HyperLogLogPlusPlusTest.java:619-643`: merging null / empty
    serialized states changes nothing."""
    from zetasketch_spark.sketches.base import HllFamily

    fam = HllFamily(precision=12)
    sk = fam.make()
    sk.add_longs([1, 2, 3])
    direct = fam.serialize(sk)
    merged = fam.merge_serialized([None, b"", direct, None])
    assert merged == direct
    sk2 = HllSketch(precision=12)
    sk2.add_longs([1, 2, 3])
    sk2.merge(None)  # aggregator-null merge is a no-op
    assert sk2.serialize() == direct


def test_type_incompatibility():
    a = HllSketch()
    a.add_longs([1])
    b = HllSketch()
    b.add_ints([1])
    with pytest.raises(ValueError):
        a.merge(b)
    c = HllSketch()
    with pytest.raises(ValueError):
        c.add_longs([1]) or c.add_ints([2])


def test_narrow_and_signed_value_types_full_matrix():
    """The six non-Java DefaultOpsType ids (INT8..UINT16, signed INT32/64):
    distinct ids survive serde, merges enforce exact-id equality (signed vs
    unsigned of the same width is incompatible even though the hash recipe
    is byte-identical), and estimates count the underlying byte strings."""
    import numpy as np

    from zetasketch_spark import hll as H

    adders = [
        ("add_int8s", H.VALUE_TYPE_INT8, np.arange(-128, 128, dtype=np.int8)),
        ("add_uint8s", H.VALUE_TYPE_UINT8, np.arange(0, 256, dtype=np.uint8)),
        ("add_int16s", H.VALUE_TYPE_INT16, np.arange(-500, 500, dtype=np.int16)),
        ("add_uint16s", H.VALUE_TYPE_UINT16, np.arange(0, 1000, dtype=np.uint16)),
        ("add_int32s", H.VALUE_TYPE_INT32, np.arange(0, 1000, dtype=np.int32)),
        ("add_int64s", H.VALUE_TYPE_INT64, np.arange(0, 1000, dtype=np.int64)),
    ]
    sketches = {}
    for name, vt, vals in adders:
        sk = HllSketch(precision=13)
        getattr(sk, name)(vals)
        assert sk.value_type == vt
        rt = HllSketch.deserialize(sk.serialize())
        assert rt.value_type == vt
        assert rt.estimate() == sk.estimate()
        # exact in the sparse/LC regime for these small domains
        assert abs(sk.estimate() - len(vals)) <= 0.02 * len(vals) + 2
        sketches[vt] = sk

    # same-width signed vs unsigned: identical hash domain bytes, but the
    # ids are distinct so the reference's exact-match rule must reject
    with pytest.raises(ValueError):
        sketches[H.VALUE_TYPE_INT8].merge(sketches[H.VALUE_TYPE_UINT8])
    with pytest.raises(ValueError):
        sketches[H.VALUE_TYPE_INT64].merge(HllSketch.deserialize(
            _build(lambda s: s.add_longs(np.arange(10)))))

    # same id merges fine and stays exact on the union
    a = HllSketch(precision=13)
    a.add_int16s(np.arange(0, 600, dtype=np.int16))
    a.merge(sketches[H.VALUE_TYPE_INT16])
    assert abs(a.estimate() - 1100) <= 25  # union of [-500,500) and [0,600)


def _build(fn):
    sk = HllSketch(precision=13)
    fn(sk)
    return sk.serialize()


# --- register-level merge goldens (NormalRepresentationTest.java:199-240) -----

def _normal_with_hashes(p, hashes):
    from zetasketch_spark.hll import HllSketch
    sk = HllSketch(precision=p, no_sparse=True)
    sk.add_hashes(np.array(hashes, dtype=np.uint64))
    return sk


def test_merge_normal_with_higher_precision_registers():
    """target p=10 absorbing source p=11: expected register array spelled
    out (`NormalRepresentationTest.java:199-216`)."""
    target = _normal_with_hashes(10, [
        (0b0000000000 << 54) | (0b001 << 51),  # idx 0, rhoW 3
        (0b0000000001 << 54) | (0b111 << 51),  # idx 1, rhoW 1
    ])
    source = _normal_with_hashes(11, [
        (0b00000000000 << 53) | (0b111 << 50),  # idx 0, rhoW 1
        (0b00000000010 << 53) | (0b001 << 50),  # idx 2 (p11), rhoW 3
    ])
    target.merge(source)
    expected = np.zeros(1 << 10, dtype=np.uint8)
    expected[0b0000000000] = 3  # preserved
    expected[0b0000000001] = 4  # updated: source idx2@p11 -> idx1@p10, rhoW 3+1
    assert target.registers.tolist() == expected.tolist()


def test_merge_normal_with_lower_precision_registers():
    """target p=11 absorbing source p=10 downgrades itself
    (`NormalRepresentationTest.java:222-240`)."""
    source = _normal_with_hashes(10, [
        (0b0000000000 << 54) | (0b001 << 51),
        (0b0000000001 << 54) | (0b111 << 51),
    ])
    target = _normal_with_hashes(11, [
        (0b00000000000 << 53) | (0b111 << 50),
        (0b00000000010 << 53) | (0b001 << 50),
    ])
    target.merge(source)
    assert target.p == 10
    expected = np.zeros(1 << 10, dtype=np.uint8)
    expected[0b0000000000] = 3
    expected[0b0000000001] = 4
    assert target.registers.tolist() == expected.tolist()


def test_merge_downgrades_sparse_precision_bookkeeping():
    """min sparse precision wins even with no data
    (`NormalRepresentationTest.java:186-193`)."""
    from zetasketch_spark.hll import HllSketch
    a = HllSketch(precision=10, sparse_precision=14)
    a._normalize()  # normal mode, sp bookkeeping 14
    b = HllSketch(precision=10, sparse_precision=15)
    b._normalize()
    b.merge(a)
    assert b.sp == 14


# --- state-level merge associativity (MergeTest.java:36-73) ------------------

def test_hundred_way_merge_equals_direct_state():
    """100 sparse partials over random longs merged sequentially must equal,
    byte-for-byte, one sketch that saw all values (p=13, sp=16)."""
    rng = np.random.default_rng(123)
    streams = [rng.integers(-2**63, 2**63, size=1 + int(rng.integers(2**12)), dtype=np.int64)
               for _ in range(100)]
    partials = []
    for s in streams:
        sk = HllSketch(precision=13, sparse_precision=16)
        sk.add_longs(s)
        assert sk.mode == "sparse" or len(s) > 1000  # small ones stay sparse
        partials.append(sk)
    merged = partials[0]
    for sk in partials[1:]:
        merged.merge(sk)
    direct = HllSketch(precision=13, sparse_precision=16)
    direct.add_longs(np.concatenate(streams))
    assert direct.mode == "normal"  # enough values to upgrade
    assert merged.serialize() == direct.serialize()
    assert merged.estimate() == direct.estimate()


def test_merge_order_invariance():
    rng = np.random.default_rng(7)
    streams = [rng.integers(0, 10**6, size=500, dtype=np.int64) for _ in range(8)]
    def build(order):
        sks = []
        for i in order:
            sk = HllSketch(precision=12, sparse_precision=17)
            sk.add_longs(streams[i])
            sks.append(sk)
        acc = sks[0]
        for sk in sks[1:]:
            acc.merge(sk)
        return acc.serialize()
    assert build(range(8)) == build(reversed(range(8)))


def test_batch_size_invariance():
    """Post-compact state must not depend on Arrow batch boundaries."""
    rng = np.random.default_rng(99)
    values = rng.integers(0, 10**7, size=20000, dtype=np.int64)
    states = []
    for bs in (1, 64, 4096, 20000):
        sk = HllSketch(precision=11, sparse_precision=15)
        for i in range(0, len(values), bs):
            sk.add_longs(values[i:i + bs])
        states.append(sk.serialize())
    assert states.count(states[0]) == len(states)


def test_string_sketch_matches_long_semantics():
    sk = HllSketch()
    sk.add_strings(pd.Series(["a", "b", "c", "a"]))
    assert sk.estimate() == 3
    rt = HllSketch.deserialize(sk.serialize())
    assert rt.estimate() == 3


# --- sparse -> normal upgrade boundary (F5) ----------------------------------

def test_upgrade_boundary():
    """p=10, sp=15: upgrade must occur when encoded sparse bytes >= 768
    (0.75 * 2^10), and the post-upgrade state must equal the direct normal
    build over the same values."""
    rng = np.random.default_rng(5)
    values = rng.integers(0, 2**62, size=2000, dtype=np.int64)
    sk = HllSketch(precision=10, sparse_precision=15)
    upgraded_at = None
    for i in range(0, 2000, 64):
        sk.add_longs(values[i:i + 64])
        sk.compact()
        if sk.mode == "normal" and upgraded_at is None:
            upgraded_at = i + 64
    assert upgraded_at is not None, "sketch never upgraded to normal"
    direct = HllSketch(precision=10, sparse_precision=15)
    direct.add_longs(values)
    assert direct.serialize() == sk.serialize()


# --- error envelope (F4) ------------------------------------------------------

@pytest.mark.parametrize("p,n", [
    # full advertised range p in 10..24 (BASELINE.json metric), crossing the
    # LC thresholds and the sparse->dense upgrade boundary
    (10, 10), (10, 1000), (10, 100_000),
    (12, 5000), (13, 20_000),
    (14, 10), (14, 1000), (14, 100_000),
    (15, 10), (15, 1000), (15, 100_000), (15, 1_000_000),
    (16, 300_000), (18, 500_000),
    (20, 10), (20, 1000), (20, 100_000),
    (22, 200_000), (24, 1_000_000),
])
def test_error_envelope(p, n):
    """|est/n - 1| <= 3 * 1.04/sqrt(2^p) on a seeded distinct stream (with
    3x duplicates), per BASELINE.md. LinearCounting keeps small-n errors
    far tighter; the bound is checked uniformly with slack k=3."""
    rng = np.random.default_rng(p * 1_000_003 + n)
    distinct = rng.integers(-2**63, 2**63, size=n, dtype=np.int64)
    stream = np.concatenate([distinct, distinct[: n // 3]])
    sk = HllSketch(precision=p)
    for i in range(0, len(stream), 65536):
        sk.add_longs(stream[i:i + 65536])
    est = sk.estimate()
    bound = 3 * 1.04 / np.sqrt(2.0 ** p)
    assert abs(est / n - 1) <= max(bound, 0.01), (p, n, est)


# --- proto validation (HyperLogLogPlusPlusTest.java:332-485) -------------------

def test_deserialize_rejects_wrong_aggregator_type():
    sk = HllSketch(precision=10)
    sk.add_longs([1, 2, 3])
    data = bytearray(sk.serialize())
    assert data[0] == 0x08 and data[1] == 112
    data[1] = 100  # AggregatorType.SUM
    with pytest.raises(ValueError, match="HYPERLOGLOG_PLUS_UNIQUE"):
        HllSketch.deserialize(bytes(data))


def test_deserialize_rejects_wrong_encoding_version():
    sk = HllSketch(precision=10)
    sk.add_longs([1])
    data = bytearray(sk.serialize())
    i = data.index(0x18)  # encoding_version tag
    assert data[i + 1] == 2
    data[i + 1] = 1
    with pytest.raises(ValueError, match="encoding version"):
        HllSketch.deserialize(bytes(data))


def test_deserialize_rejects_wrong_data_size():
    sk = HllSketch(precision=4, no_sparse=True)
    sk.add_longs([42])
    data = sk.serialize()
    # truncate one register byte: declared 2^4 = 16, provide 15
    broken = data[:-1]
    broken = bytearray(broken)
    # fix the two length prefixes (hll submessage and data field)
    broken[10] -= 1   # hll ext length (0x14 -> 0x13)
    broken[14] -= 1   # data field length (0x10 -> 0x0f)
    with pytest.raises(ValueError, match="exactly 16 bytes"):
        HllSketch.deserialize(bytes(broken))


# --- codec round trips ---------------------------------------------------------

def test_delta_varint_roundtrip():
    rng = np.random.default_rng(3)
    for size in (0, 1, 5, 1000):
        vals = np.sort(rng.choice(2**31 - 1, size=size, replace=False)).astype(np.int64)
        enc = delta_varint_encode(vals)
        dec = delta_varint_decode(enc)
        assert dec.tolist() == vals.tolist()


def test_serialize_roundtrip_normal_mode():
    rng = np.random.default_rng(11)
    sk = HllSketch(precision=12, sparse_precision=14)
    sk.add_longs(rng.integers(0, 2**62, size=50000, dtype=np.int64))
    assert sk.mode == "normal"
    data = sk.serialize()
    rt = HllSketch.deserialize(data)
    assert rt.serialize() == data
    assert rt.estimate() == sk.estimate()


def test_deserialize_skips_unknown_fields():
    """Forward compatibility (`StateTest.java:333-350`): unknown proto
    fields of any wire type are skipped, fields around them still parse."""
    def varint(v):
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    sk = HllSketch(precision=12)
    sk.add_longs(np.arange(500, dtype=np.int64))
    data = bytearray(sk.serialize())
    data += varint((999 << 3) | 2) + varint(6) + b"foobar"  # unknown bytes
    data += varint((998 << 3) | 0) + varint(12345)          # unknown varint
    data += varint((997 << 3) | 1) + b"\x01\x02\x03\x04\x05\x06\x07\x08"
    data += varint((996 << 3) | 5) + b"\x01\x02\x03\x04"    # fixed32
    rt = HllSketch.deserialize(bytes(data))
    assert rt.estimate() == sk.estimate()
    assert rt.num_values == sk.num_values
    assert rt.serialize() == sk.serialize()


def test_deserialize_accepts_out_of_order_fields():
    """Proto wire format allows any field order (`StateTest.java` parses
    field-by-field); a state written by another conformant writer with
    reordered top-level fields must parse to the same sketch and
    re-serialize to our canonical byte order."""
    sk = HllSketch(precision=12, sparse_precision=15)
    sk.add_longs(np.arange(500, dtype=np.int64))
    canonical = sk.serialize()

    # re-emit the top-level fields in reverse order
    from zetasketch_spark.hll import _parse_proto

    fields = _parse_proto(canonical)
    out = bytearray()

    def put_varint(v):
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return

    for f in sorted(fields, reverse=True):
        v = fields[f]
        if isinstance(v, bytes):
            put_varint((f << 3) | 2)
            put_varint(len(v))
            out.extend(v)
        else:
            put_varint((f << 3) | 0)
            put_varint(v)
    assert bytes(out) != canonical  # genuinely reordered
    rt = HllSketch.deserialize(bytes(out))
    assert rt.serialize() == canonical
    assert rt.estimate() == sk.estimate()


def test_deserialize_rejects_sparse_data_without_sparse_precision():
    """`fromProto_ThrowsWhenSparseIsMissingSparsePrecision` (:413-436):
    sparse_data present with sp=0 and no dense registers must raise —
    silently dropping it would lose counted values."""
    sk = HllSketch(precision=15, sparse_precision=20)
    sk.add_longs([1, 2, 3])
    data = bytearray(sk.serialize())
    # locate and zero the inner sparse_precision field (tag 0x20 inside
    # the extension): rebuild the state with sp=0 instead of bit-surgery
    from zetasketch_spark.hll import _parse_proto

    fields = _parse_proto(bytes(data))
    inner = dict(_parse_proto(fields[112]))
    assert inner.get(4) == 20 and inner.get(6)  # sp field + sparse data
    out = bytearray()

    def put_varint(buf, v):
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                buf.append(b | 0x80)
            else:
                buf.append(b)
                return

    inner_out = bytearray()
    for f, v in inner.items():
        if f == 4:
            continue  # drop sparse_precision (proto default 0)
        if isinstance(v, bytes):
            put_varint(inner_out, (f << 3) | 2)
            put_varint(inner_out, len(v))
            inner_out.extend(v)
        else:
            put_varint(inner_out, (f << 3) | 0)
            put_varint(inner_out, v)
    for f, v in fields.items():
        if f == 112:
            put_varint(out, (112 << 3) | 2)
            put_varint(out, len(inner_out))
            out.extend(inner_out)
        elif isinstance(v, bytes):
            put_varint(out, (f << 3) | 2)
            put_varint(out, len(v))
            out.extend(v)
        else:
            put_varint(out, (f << 3) | 0)
            put_varint(out, v)
    with pytest.raises(ValueError, match="sparse precision when sparse data"):
        HllSketch.deserialize(bytes(out))


def test_merge_unknown_type_directions():
    """`merge_KnownIntoUnknownType` / `mergeFromProto_UnknownIntoKnownType`
    / `_UnknownIntoUnknownType`: UNKNOWN (no adds yet) merges with any
    type and the known type wins; unknown⊕unknown stays unknown."""
    import numpy as np

    typed = HllSketch(precision=13)
    typed.add_longs(np.arange(100, dtype=np.int64))

    unk = HllSketch(precision=13)          # never added: type UNKNOWN
    unk.merge(typed)
    assert unk.value_type == typed.value_type
    assert unk.estimate() == typed.estimate()

    known = HllSketch(precision=13)
    known.add_longs(np.arange(50, dtype=np.int64))
    known.merge(HllSketch(precision=13))   # unknown into known
    assert known.value_type == typed.value_type

    u1, u2 = HllSketch(precision=13), HllSketch(precision=13)
    u1.merge(u2)
    assert u1.value_type == 0              # unknown ⊕ unknown stays unknown


def test_bytes_and_string_share_value_type():
    """`addBytes_ToByteOrStringType` / `addString_ToByteOrStringType`:
    bytes and UTF-8 strings are ONE type (BYTES_OR_UTF8_STRING = 11), so
    mixing them in one sketch is legal and b'foo' == 'foo' as a value."""
    sk = HllSketch(precision=13)
    sk.add_strings(pd.Series([b"foo", b"bar"]))
    sk.add_strings(pd.Series(["foo", "baz"]))  # same type, no raise
    assert sk.value_type == 11
    assert sk.estimate() == 3  # foo==b'foo'


def test_deserialize_rejects_wire_type_confusion_and_lying_lengths():
    """Fourth-review repros: (a) field 112 encoded as a varint previously
    routed an int into bytes(int) — an attacker-controlled allocation;
    (b) length-delimited fields claiming more bytes than remain were
    silently truncated; (c) inner fields with swapped wire types leaked
    TypeError. All must raise clean ValueErrors, fast."""
    import time

    # (a) extension field as a huge varint: must NOT allocate/spin
    evil = bytearray()
    evil += bytes([0x08, 0x70, 0x18, 0x02])       # type=112, version=2
    evil += bytes([0x80, 0x07])                   # field 112, wire 0 (varint)
    evil += bytes([0x80, 0x80, 0x80, 0x80, 0x08])  # ~2^35
    t0 = time.time()
    with pytest.raises(ValueError, match="wrong wire type"):
        HllSketch.deserialize(bytes(evil))
    assert time.time() - t0 < 0.5

    # (b) lying length field
    sk = HllSketch(precision=10)
    sk.add_longs([1, 2, 3])
    blob = bytearray(sk.serialize())
    # field 112 header is (0x82, 0x07, len); inflate len beyond the buffer
    i = bytes(blob).index(bytes([0x82, 0x07]))
    blob[i + 2] = 0x7F  # claims 127 bytes; far fewer remain
    with pytest.raises(ValueError, match="truncated proto"):
        HllSketch.deserialize(bytes(blob))

    # (c) registers field with varint wire type
    good = HllSketch(precision=4, no_sparse=True)
    good.add_longs([42])
    data = bytearray(good.serialize())
    j = bytes(data).index(bytes([0x2A, 0x10]))  # inner field 5, wire 2, len 16
    data[j] = 0x28  # wire type 0
    with pytest.raises(ValueError):
        HllSketch.deserialize(bytes(data))


def _encode_varint_field(field: int, value: int) -> bytes:
    from zetasketch_spark.hll import _put_varint

    out = bytearray()
    _put_varint(out, (field << 3) | 0)
    _put_varint(out, value)
    return bytes(out)


def _encode_bytes_field(field: int, payload: bytes) -> bytes:
    from zetasketch_spark.hll import _put_varint

    out = bytearray()
    _put_varint(out, (field << 3) | 2)
    _put_varint(out, len(payload))
    out.extend(payload)
    return bytes(out)


def test_state_parse_type_defaults_to_hll():
    """`StateTest.java:86-92` parseType: a proto with the required type
    field missing still parses as HYPERLOGLOG_PLUS_UNIQUE."""
    from zetasketch_spark.hll import ENCODING_VERSION, HllSketch

    hll = _encode_varint_field(3, 10)  # precision only
    blob = (_encode_varint_field(2, 7)  # no type field
            + _encode_varint_field(3, ENCODING_VERSION)
            + _encode_bytes_field(112, hll))
    sk = HllSketch.deserialize(blob)
    assert sk.num_values == 7 and sk.p == 10


def test_state_parse_num_values_extremes():
    """`StateTest.java:102-121` parseNumValues: 0, 42, Long.MIN_VALUE and
    Long.MAX_VALUE all round-trip through the varint wire form (negative
    int64 = 10-byte two's-complement varint)."""
    from zetasketch_spark.hll import ENCODING_VERSION, HllSketch

    hll = _encode_varint_field(3, 10)
    for v in (0, 42, -(1 << 63), (1 << 63) - 1):
        blob = (_encode_varint_field(2, v)
                + _encode_varint_field(3, ENCODING_VERSION)
                + _encode_bytes_field(112, hll))
        assert HllSketch.deserialize(blob).num_values == v


def test_state_parse_encoding_version_default_and_extremes():
    """`StateTest.java:123-143` parseEncodingVersion: proto default is 1
    (which this engine rejects — it speaks v2 only), and int32 extremes
    decode to their signed values before validation."""
    import pytest

    from zetasketch_spark.hll import HllSketch, wire_int32

    with pytest.raises(ValueError, match="encoding version"):
        HllSketch.deserialize(_encode_varint_field(2, 1))  # default 1
    for v in (0, 42, -(1 << 31), (1 << 31) - 1):
        assert wire_int32(v & 0xFFFFFFFF) == v
        with pytest.raises(ValueError, match="encoding version"):
            HllSketch.deserialize(_encode_varint_field(3, v))


def test_state_parse_field_extremes_raw_layer():
    """`StateTest.java:176-237` parseSparseSize/parsePrecision/
    parseSparsePrecision: the raw parse layer (the analog of State.parse)
    surfaces int32 extremes losslessly; validation lives above it, as in
    the reference (State stores, fromProto validates)."""
    from zetasketch_spark.hll import _parse_proto, wire_int32

    for field in (2, 3, 4):  # sparse_size, precision, sparse_precision
        for v in (0, 42, -(1 << 31), (1 << 31) - 1):
            blob = _encode_varint_field(field, v)
            assert wire_int32(_parse_proto(blob)[field]) == v


def test_state_parse_data_empty_vs_missing():
    """`StateTest.java:239-331` parseData/parseSparseData: a missing
    bytes field is None, an empty one is b'' (hasData false for both —
    `StateTest.java:52-84`), and payload bytes survive exactly."""
    from zetasketch_spark.hll import _parse_proto

    assert _parse_proto(b"").get(5) is None
    assert _parse_proto(_encode_bytes_field(5, b""))[5] == b""
    assert _parse_proto(_encode_bytes_field(5, b"\x01\x02\x03"))[5] == b"\x01\x02\x03"
    assert _parse_proto(_encode_bytes_field(6, b"\x01\x02\x03"))[6] == b"\x01\x02\x03"


def test_unique_stats_proto_roundtrip():
    """`unique-stats.proto:25-31`: estimated_cardinality (int64) +
    expected_error (double, 1.04/sqrt(2^p)) — emitted from a sketch and
    parsed back field-exactly."""
    import math
    import struct

    from zetasketch_spark.hll import HllSketch, parse_unique_stats

    sk = HllSketch(precision=14)
    sk.add_longs(range(1000))
    blob = sk.unique_stats_proto()
    card, err = parse_unique_stats(blob)
    assert card == sk.estimate()
    assert err == 1.04 / math.sqrt(1 << 14)
    # wire layout: field 1 varint, field 2 fixed64 little-endian double
    assert blob[0] == (1 << 3) | 0
    f2 = blob.index(bytes([(2 << 3) | 1]))
    assert struct.unpack("<d", blob[f2 + 1:f2 + 9])[0] == err


def test_deserialize_wraps_precision_to_int32():
    """Reference State.parse truncates precision fields to int32 before
    validation: a varint payload of 2^32+14 in hll field 3 must read as
    p=14 (valid sketch), not 4294967310."""
    from zetasketch_spark.hll import ENCODING_VERSION, HllSketch

    hll = _encode_varint_field(3, (1 << 32) + 14)
    blob = (_encode_varint_field(1, 112)
            + _encode_varint_field(3, ENCODING_VERSION)
            + _encode_bytes_field(112, hll))
    sk = HllSketch.deserialize(blob)
    assert sk.p == 14


def test_normal_repr_cross_precision_sparse_merge_registers():
    """`NormalRepresentationTest.java:43-152` mirrored at register level:

    * merging a sparse sketch with a LOWER sparse precision downgrades the
      normal state's sp even when no data conversion happens (:43-54) —
      serialized (p, sp) must track the minimum seen;
    * a sparse value from a HIGHER normal precision lands at the
      downgraded register index with the downgraded rhoW (:56-75);
    * a sparse value from a LOWER normal precision forces the normal
      representation itself to downgrade first (:77-97)."""
    from zetasketch_spark.hll import SparseEncoding

    def sparse_with(p, sp, encoded):
        sk = HllSketch(precision=p, sparse_precision=sp)
        sk.sparse_values = np.asarray([encoded], dtype=np.int64)
        sk.num_values = 1
        return sk

    # (a) sp downgrade without data conversion: normal(10,15) ⊕ sparse(10,13)
    a = HllSketch(precision=10, sparse_precision=15)
    a._normalize()
    assert a.mode == "normal" and a.sp == 15
    a.merge(sparse_with(10, 13, 0b1))
    assert a.sp == 13

    # (b) higher-precision sparse value downgraded into p=10 registers
    enc_hi, enc_lo = SparseEncoding(11, 13), SparseEncoding(10, 13)
    v = np.asarray([0b1], dtype=np.int64)
    b = HllSketch(precision=10, sparse_precision=13)
    b._normalize()
    b.merge(sparse_with(11, 13, 0b1))
    down = enc_hi.downgrade(v, enc_lo)
    exp_idx = int(enc_lo.decode_normal_index(down)[0])
    exp_rho = int(enc_lo.decode_normal_rho(down)[0])
    # hand-derived (NOT via the implementation): encoded 0b1 under
    # (11,13) is the plain 13-bit sparse index 1; its top 10 bits give
    # register 0 and the remaining bits 001 give rho = 2 zeros + 1 = 3
    assert (exp_idx, exp_rho) == (0, 3)
    expected = np.zeros(1 << 10, dtype=np.uint8)
    expected[exp_idx] = exp_rho
    assert (b.registers == expected).all()

    # (c) lower-precision sparse value downgrades the representation
    c = HllSketch(precision=11, sparse_precision=13)
    c._normalize()
    c.merge(sparse_with(10, 13, 0b1))
    assert c.p == 10
    assert (c.registers == expected).all()


def test_value_type_registry_semantics():
    """`ValueTypeTest.java:31-60`: UNKNOWN is 0; DefaultOpsType numbers
    round-trip through serialization; arbitrary numbers are preserved
    (custom ids) — mirrored on the HllSketch surface."""
    from zetasketch_spark import hll as H

    assert H.VALUE_TYPE_UNKNOWN == 0
    for vt in (H.VALUE_TYPE_UINT32, H.VALUE_TYPE_UINT64):
        sk = H.HllSketch(precision=10, value_type=vt)
        assert H.HllSketch.deserialize(sk.serialize()).value_type == vt
    sk = H.HllSketch(precision=10)
    sk.add_custom(np.asarray([123], dtype=np.uint64), 12345)
    assert H.HllSketch.deserialize(sk.serialize()).value_type == 12345
