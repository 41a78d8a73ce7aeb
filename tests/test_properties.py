"""Property-based invariants (hypothesis): the commutative-monoid laws the
Aggregator contract promises (`Aggregator.java:47-78`), checked at the
serialized-state level across random streams, precisions, and partitions."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from zetasketch_spark.hll import HllSketch
from zetasketch_spark.sketches.countmin import CountMinSketch
from zetasketch_spark.sketches.bloom import BloomFilter

import pandas as pd


def _sketch(values, p, sp):
    sk = HllSketch(precision=p, sparse_precision=sp)
    if len(values):
        sk.add_longs(np.asarray(values, dtype=np.int64))
    return sk


streams = st.lists(st.integers(-2**63, 2**63 - 1), max_size=300)


@settings(max_examples=40, deadline=None)
@given(a=streams, b=streams, p=st.integers(10, 16))
def test_hll_merge_commutes_at_state_level(a, b, p):
    sp = p + 4
    ab = _sketch(a, p, sp)
    ab.merge(_sketch(b, p, sp))
    ba = _sketch(b, p, sp)
    ba.merge(_sketch(a, p, sp))
    assert ab.serialize() == ba.serialize()


@settings(max_examples=40, deadline=None)
@given(a=streams, b=streams, c=streams, p=st.integers(10, 14))
def test_hll_merge_associates_at_state_level(a, b, c, p):
    sp = p + 5
    left = _sketch(a, p, sp)
    left.merge(_sketch(b, p, sp))
    left.merge(_sketch(c, p, sp))
    bc = _sketch(b, p, sp)
    bc.merge(_sketch(c, p, sp))
    right = _sketch(a, p, sp)
    right.merge(bc)
    assert left.serialize() == right.serialize()


@settings(max_examples=30, deadline=None)
@given(vals=streams, p=st.integers(10, 16), cuts=st.lists(st.integers(0, 300), max_size=4))
def test_hll_partitioning_invariance(vals, p, cuts):
    """Any split of the stream into partials merges to the direct state."""
    sp = p + 4
    direct = _sketch(vals, p, sp)
    bounds = sorted({min(c, len(vals)) for c in cuts} | {0, len(vals)})
    acc = HllSketch(precision=p, sparse_precision=sp)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        acc.merge(_sketch(vals[lo:hi], p, sp))
    # num_values differs only if empty partials skipped adds; both saw all
    assert acc.serialize() == direct.serialize()


@settings(max_examples=30, deadline=None)
@given(vals=streams, p=st.integers(10, 16))
def test_hll_serde_fixpoint(vals, p):
    sk = _sketch(vals, p, p + 4)
    data = sk.serialize()
    rt = HllSketch.deserialize(data)
    assert rt.serialize() == data
    assert rt.estimate() == sk.estimate()


@settings(max_examples=25, deadline=None)
@given(a=streams, b=streams,
       pa=st.integers(10, 16), pb=st.integers(10, 16),
       da=st.integers(2, 6), db=st.integers(2, 6))
def test_hll_cross_precision_merge_estimate(a, b, pa, pb, da, db):
    """Merging across any compatible (p, sp) pair estimates the union
    within the coarser precision's envelope (downgrade correctness)."""
    spa, spb = pa + da, pb + db
    # only compatible orderings (assertCompatible partial order)
    if not ((pa <= pb and spa <= spb) or (pa >= pb and spa >= spb)):
        return
    x = _sketch(a, pa, spa)
    x.merge(_sketch(b, pb, spb))
    true = len(set(a) | set(b))
    if true == 0:
        assert x.estimate() == 0
        return
    bound = 3 * 1.04 / np.sqrt(2.0 ** min(pa, pb))
    assert abs(x.estimate() / true - 1) <= max(bound, 0.25)


@settings(max_examples=20, deadline=None)
@given(a=st.lists(st.text(min_size=0, max_size=20), max_size=150),
       b=st.lists(st.text(min_size=0, max_size=20), max_size=150))
def test_countmin_merge_equals_direct_property(a, b):
    x = CountMinSketch(width=256, depth=3)
    x.add_series(pd.Series(a, dtype=object))
    y = CountMinSketch(width=256, depth=3)
    y.add_series(pd.Series(b, dtype=object))
    x.merge(y)
    direct = CountMinSketch(width=256, depth=3)
    direct.add_series(pd.Series(a + b, dtype=object))
    assert np.array_equal(x.counters, direct.counters)


@settings(max_examples=20, deadline=None)
@given(vals=st.lists(st.integers(0, 10**9), max_size=200))
def test_bloom_never_false_negative_property(vals):
    bf = BloomFilter(m=1 << 12, k=4)
    s = pd.Series(vals, dtype=np.int64)
    bf.add_series(s)
    if len(vals):
        assert bf.contains_series(s).all()


@given(data=st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_fingerprint_batch_matches_scalar(data):
    """The batched variable-length kernel (prefix-sliced 64-byte loop,
    block gathers) must equal the scalar reference on arbitrary lengths —
    this pins every length-class boundary, not just the golden lengths."""
    import numpy as np

    from zetasketch_spark.hashing import fingerprint_bytes, fingerprint_bytes_batch

    lens = np.array([len(b) for b in data], dtype=np.int64)
    buf = np.frombuffer(b"".join(data), dtype=np.uint8) if lens.sum() else \
        np.empty(0, dtype=np.uint8)
    off = np.cumsum(lens) - lens
    got = fingerprint_bytes_batch(buf, off, lens)
    want = np.array([fingerprint_bytes(b) for b in data], dtype=np.uint64)
    assert np.array_equal(got, want)


@given(texts=st.lists(st.text(alphabet="ab ", max_size=60), min_size=1, max_size=12),
       k=st.integers(1, 6), window=st.integers(1, 5))
@settings(max_examples=40, deadline=None)
def test_winnow_batch_matches_naive(texts, k, window):
    """Batch winnowing (flat strided minima + lexsort dedupe) must equal a
    naive per-document computation over the positional gram hashes."""
    import numpy as np

    from zetasketch_spark.functions.fingerprint import winnow_fingerprints_batch
    from zetasketch_spark.hashing import kgram_window_hashes

    got = winnow_fingerprints_batch(texts, k=k, window=window)
    h, doc_of, n_docs = kgram_window_hashes(texts, k)
    for d in range(n_docs):
        hs = h[doc_of == d]
        if len(hs) == 0:
            want = np.empty(0, dtype=np.uint64)
        elif len(hs) <= window:
            want = np.unique(hs.min(keepdims=True))
        else:
            win = np.lib.stride_tricks.sliding_window_view(hs, window)
            want = np.unique(win.min(axis=1))
        assert np.array_equal(got[d], want), (d, texts[d])


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_png_roundtrip_lossless_property(h, w, seed):
    """PNG is lossless for every image shape: encode (cycling all five
    filters) then decode recovers the exact pixels."""
    import numpy as np

    from zetasketch_spark.operators.multimodal import decode_image, encode_png

    rgb = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_image(encode_png(rgb))
    assert out.shape == (h, w, 3)
    assert (out == rgb).all()


@given(
    h=st.integers(min_value=8, max_value=24),
    w=st.integers(min_value=8, max_value=24),
    quality=st.integers(min_value=70, max_value=100),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=15, deadline=None)
def test_jpeg_roundtrip_bounded_error_property(h, w, quality, seed):
    """JPEG round-trip error is bounded by the quantization envelope for
    every shape/quality/content: sum over the block of q[u,v]/2 per
    coefficient bounds the per-pixel reconstruction error (loose bound:
    max |err| <= sum(q)/2/8 per DCT orthonormality)."""
    import numpy as np

    from zetasketch_spark.operators.jpeg import (
        QUANT_LUMA, decode_jpeg, encode_jpeg, scaled_quant_table)

    rng = np.random.default_rng(seed)
    gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(gray, quality=quality))[:, :, 0]
    q = scaled_quant_table(QUANT_LUMA, quality).astype(np.float64)
    # |IDCT(e)|_inf <= sum|e_uv| * max|basis| = sum(q/2) / 4 (basis <= 1/4
    # after orthonormal scaling, 1/2*1/2, plus the DC 1/sqrt2 factors)
    bound = q.sum() / 2.0 / 4.0 + 1.0  # +1 for uint8 rounding
    assert np.abs(out - gray).max() <= bound


def _theta(values, k=64):
    from zetasketch_spark.sketches.theta import ThetaSketch

    sk = ThetaSketch(k=k)
    if len(values):
        sk.add_series(pd.Series([str(v) for v in values]))
    return sk


@settings(max_examples=40, deadline=None)
@given(a=streams, b=streams, k=st.sampled_from([16, 64, 256]))
def test_theta_merge_commutes_at_state_level(a, b, k):
    ab = _theta(a, k)
    ab.merge(_theta(b, k))
    ba = _theta(b, k)
    ba.merge(_theta(a, k))
    assert ab.serialize() == ba.serialize()


@settings(max_examples=30, deadline=None)
@given(vals=streams, k=st.sampled_from([16, 64]),
       cuts=st.lists(st.integers(0, 300), max_size=4))
def test_theta_partitioning_invariance_and_serde_fixpoint(vals, k, cuts):
    """Any split of the stream merges to a state whose retained set and
    theta match the direct build (QuickSelect keeps the same bottom-k
    regardless of arrival order), and serde is a fixpoint."""
    from zetasketch_spark.sketches.theta import ThetaSketch

    direct = _theta(vals, k)
    bounds = sorted({min(c, len(vals)) for c in cuts} | {0, len(vals)})
    acc = ThetaSketch(k=k)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        acc.merge(_theta(vals[lo:hi], k))
    # merged theta can only be <= direct's (more QuickSelect steps), and
    # the retained set must agree below the smaller theta
    t = min(acc.theta, direct.theta)
    da = direct.retained[direct.retained < np.uint64(t)] if t < (1 << 64) \
        else direct.retained
    aa = acc.retained[acc.retained < np.uint64(t)] if t < (1 << 64) \
        else acc.retained
    assert np.array_equal(aa, da)
    rt = ThetaSketch.deserialize(acc.serialize())
    assert rt.serialize() == acc.serialize()


_tt_pairs = st.lists(
    st.tuples(st.integers(0, 40), st.integers(-10**9, 10**9)), max_size=250)


def _timetheta(pairs, k=32):
    from zetasketch_spark.sketches.timetheta import TimeThetaSketch

    sk = TimeThetaSketch(k=k)
    if len(pairs):
        sk.add_series(pd.Series([f"key{a}" for a, _ in pairs]),
                      pd.Series([b for _, b in pairs]))
    return sk


@settings(max_examples=30, deadline=None)
@given(pairs=_tt_pairs, k=st.sampled_from([16, 64]),
       cuts=st.lists(st.integers(0, 250), max_size=4))
def test_timetheta_split_merge_byte_equal_and_max_ts(pairs, k, cuts):
    """The temporal theta state is a pure function of the key→max-time
    map: any split of the (key, time) stream merges to the BYTE-identical
    state (QuickSelect converges to the same bottom-k and theta; merge
    takes max time per surviving hash), and in the exact regime the
    stored times are exactly the per-key maxima."""
    from zetasketch_spark.sketches.timetheta import TimeThetaSketch

    direct = _timetheta(pairs, k)
    bounds = sorted({min(c, len(pairs)) for c in cuts} | {0, len(pairs)})
    acc = TimeThetaSketch(k=k)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        acc.merge(_timetheta(pairs[lo:hi], k))
    assert acc.serialize() == direct.serialize()
    rt = TimeThetaSketch.deserialize(acc.serialize())
    assert rt.serialize() == acc.serialize()
    if direct.theta == 1 << 64 and pairs:  # exact regime: check extrema
        wmax: dict[int, int] = {}
        wmin: dict[int, int] = {}
        for a, b in pairs:
            wmax[a] = max(wmax.get(a, -2**63), b)
            wmin[a] = min(wmin.get(a, 2**63), b)
        assert sorted(direct.last_ts.tolist()) == sorted(wmax.values())
        assert sorted(direct.first_ts.tolist()) == sorted(wmin.values())


@settings(max_examples=30, deadline=None)
@given(a=_tt_pairs, b=_tt_pairs, k=st.sampled_from([16, 64]))
def test_timetheta_merge_commutes_at_state_level(a, b, k):
    ab = _timetheta(a, k)
    ab.merge(_timetheta(b, k))
    ba = _timetheta(b, k)
    ba.merge(_timetheta(a, k))
    assert ab.serialize() == ba.serialize()


@settings(max_examples=30, deadline=None)
@given(vals=st.lists(st.integers(-10**6, 10**6), max_size=120),
       nullpos=st.lists(st.integers(0, 120), max_size=6),
       cut=st.integers(0, 120))
def test_canonical_domain_invariant_under_promoted_splits(vals, nullpos, cut):
    """The per-value canonical key domain: splitting a nullable int
    stream so that one side carries the nulls (and therefore arrives
    float64-promoted, as Arrow delivers it) must produce the same theta
    state as the clean int64 stream — estimates may not fork on batch
    boundaries."""
    from zetasketch_spark.sketches.theta import ThetaSketch

    cut = min(cut, len(vals))
    direct = ThetaSketch(k=64)
    direct.add_series(pd.Series(vals, dtype="int64"))

    left = pd.Series(vals[:cut], dtype="float64")  # promoted rendering
    for p in nullpos:
        if p < len(left):
            left.iloc[p] = np.nan
    # nulls erased some keys from the left; re-add them right so the key
    # SET matches the direct stream
    erased = [vals[p] for p in {p for p in nullpos if p < cut}]
    right = pd.Series(list(vals[cut:]) + erased, dtype="int64")

    split = ThetaSketch(k=64)
    split.add_series(left)
    split.add_series(right)
    assert split.theta == direct.theta
    assert np.array_equal(split.retained, direct.retained)


@given(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1))
@settings(max_examples=200, deadline=None)
def test_wire_int64_varint_roundtrip_law(v):
    """Any proto int64 value round-trips through the varint wire form
    (negative -> 10-byte two's complement, StateTest parity)."""
    from zetasketch_spark.hll import _parse_proto, _put_varint, wire_int64

    out = bytearray()
    _put_varint(out, (2 << 3) | 0)
    _put_varint(out, v)
    assert wire_int64(_parse_proto(bytes(out))[2]) == v


@given(st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1))
@settings(max_examples=200, deadline=None)
def test_wire_int32_varint_roundtrip_law(v):
    from zetasketch_spark.hll import _parse_proto, _put_varint, wire_int32

    out = bytearray()
    _put_varint(out, (3 << 3) | 0)
    _put_varint(out, v)
    assert wire_int32(_parse_proto(bytes(out))[3]) == v


@settings(max_examples=25, deadline=None)
@given(n=st.integers(1, 120), dim=st.integers(1, 10),
       ell=st.integers(1, 6), seed=st.integers(0, 2**31),
       n_parts=st.integers(1, 7))
def test_freqdirs_guarantee_under_random_splits_property(n, dim, ell,
                                                         seed, n_parts):
    """The FD Gram-matrix guarantee is a MERGE LAW, not a single-pass
    fact: for any input, any partitioning, and any merge order the
    merged state must satisfy 0 <= A^T A - B^T B <= certificate * I <=
    (|A|_F^2/ell) * I with exact n/|A|_F^2 counters (that is what makes
    the family safe on any Spark plan AQE might pick)."""
    from zetasketch_spark.sketches.freqdirs import FrequentDirections

    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, dim)) * rng.uniform(0.0, 4.0, size=dim)
    pieces = np.array_split(a[rng.permutation(n)], min(n_parts, n))
    sketches = []
    for p in pieces:
        s = FrequentDirections(ell=ell)
        if len(p):
            s.add_matrix(p)
        sketches.append(s)
    rng.shuffle(sketches)
    acc = FrequentDirections(ell=ell)
    for s in sketches:
        acc.merge(s)
    frob2 = float((a * a).sum())
    tol = 1e-8 * max(frob2, 1.0)
    ev = np.linalg.eigvalsh(a.T @ a - acc.gram())
    assert ev.min() >= -tol
    assert float(ev.max()) <= acc.error_certificate() + tol
    assert acc.error_certificate() <= frob2 / ell + tol
    assert acc.n == n and abs(acc.frob2 - frob2) <= tol
    # serde round-trip preserves the state byte-exactly mid-merge too
    rt = FrequentDirections.deserialize(acc.serialize())
    assert rt.serialize() == acc.serialize()
