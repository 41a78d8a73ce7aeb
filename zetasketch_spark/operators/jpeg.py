"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec in pure numpy.

Encoder: JFIF baseline sequential DCT, 8-bit, grayscale or YCbCr 4:4:4,
Annex-K quantization tables (IJG quality scaling), per-image *optimized*
Huffman tables (frequencies → length-limited canonical code, Annex K.2/K.3
procedure) written to DHT — so no hand-transcribed AC code tables exist
anywhere in this file, removing the transcription-error class entirely.

Decoder: baseline sequential SOF0 with arbitrary quantization/Huffman
tables from the stream, generic h×v component sampling (4:4:4, 4:2:0,
4:2:2...), restart intervals, and 0xFF00 byte-stuffing. Progressive
(SOF2) and arithmetic coding honestly raise ``NotImplementedError``.

Correctness structure (tests/test_pipeline_ops.py):
* DCT/IDCT are exact inverses to 1e-10 before quantization,
* the entropy layer round-trips the *quantized coefficients* bit-exactly
  (so all loss is provably quantization, the lossy step by definition),
* full encode→decode round-trips stay within the quantization error
  envelope on smooth and random images, gray and color.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 example quantization tables (the de-facto standard, also the
# IJG/libjpeg defaults; published in ITU-T T.81 Tables K.1/K.2).
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int64)

QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int64)


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag permutation, generated (not transcribed):
    diagonals d = r+c in order; even diagonals run bottom-left→top-right."""
    idx = sorted(((r, c) for r in range(8) for c in range(8)),
                 key=lambda rc: (rc[0] + rc[1],
                                 -rc[0] if (rc[0] + rc[1]) % 2 == 0 else rc[0]))
    return np.array([r * 8 + c for r, c in idx], dtype=np.int64)


ZIGZAG = _zigzag_order()          # block.flat[ZIGZAG] -> zigzag vector
UNZIGZAG = np.argsort(ZIGZAG)     # zz[UNZIGZAG] -> block.flat


def _dct_matrix() -> np.ndarray:
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    m[0] /= np.sqrt(2.0)
    return m


DCT_M = _dct_matrix()


def dct2(blocks: np.ndarray) -> np.ndarray:
    """2-D DCT-II over (..., 8, 8) blocks."""
    return DCT_M @ blocks @ DCT_M.T


def idct2(coeffs: np.ndarray) -> np.ndarray:
    return DCT_M.T @ coeffs @ DCT_M


def scaled_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → scaled Annex-K table in [1, 255]."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Huffman: per-image optimized length-limited canonical codes (Annex K.2)
# ---------------------------------------------------------------------------

def _code_lengths(freqs: dict[int, int], max_len: int = 16) -> dict[int, int]:
    """Huffman code lengths from symbol frequencies, limited to
    ``max_len`` bits via the Annex K.3 adjustment, with the spec's
    reserved pseudo-symbol (freq 1) guaranteeing no real symbol gets the
    all-ones code."""
    import heapq

    RESERVED = -1
    heap = [(f, sym) for sym, f in freqs.items() if f > 0]
    heap.append((1, RESERVED))
    if len(heap) == 1:
        return {}
    # standard Huffman over (freq, tiebreak, members)
    items = [(f, [s]) for f, s in heap]
    heapq.heapify(items)
    depth: dict[int, int] = {s: 0 for _f, s in heap}
    while len(items) > 1:
        fa, ma = heapq.heappop(items)
        fb, mb = heapq.heappop(items)
        for s in ma + mb:
            depth[s] += 1
        heapq.heappush(items, (fa + fb, ma + mb))
    # histogram of lengths, then Annex K.3: fold overlong codes down
    counts = np.zeros(max(depth.values()) + 1, dtype=np.int64)
    for s, d in depth.items():
        counts[d] += 1
    counts = list(counts)
    while len(counts) - 1 > max_len:
        L = len(counts) - 1
        while counts[L] > 0:
            # move a pair of leaves at depth L under a leaf at depth j<L-1
            j = L - 2
            while counts[j] == 0:
                j -= 1
            counts[L] -= 2
            counts[L - 1] += 1
            counts[j + 1] += 2
            counts[j] -= 1
        counts.pop()
    # canonical assignment: shortest codes to most frequent symbols
    order = sorted((s for s in depth if s != RESERVED),
                   key=lambda s: (-freqs[s], s))
    lengths_sorted = []
    for ln in range(1, len(counts)):
        lengths_sorted += [ln] * counts[ln]
    # drop the reserved symbol's slot (it got the deepest/last code)
    lengths_sorted = lengths_sorted[: len(order)]
    return dict(zip(order, lengths_sorted))


def _canonical_codes(lengths: dict[int, int]) -> tuple[dict[int, tuple[int, int]], list[int], list[int]]:
    """Canonical (code, length) per symbol + the DHT (bits, huffval)
    arrays. Symbols are ordered by (length, symbol value) per the spec."""
    bits = [0] * 17
    order = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
    code, prev_len = 0, 0
    table: dict[int, tuple[int, int]] = {}
    huffval = []
    for sym, ln in order:
        code <<= ln - prev_len
        table[sym] = (code, ln)
        bits[ln] += 1
        huffval.append(sym)
        code += 1
        prev_len = ln
    return table, bits[1:], huffval


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                raise _RestartMarker()
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker at a byte boundary."""
        self.acc, self.nbits = 0, 0
        if not (self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


class _RestartMarker(ValueError):
    """Unexpected RSTn inside entropy data — a stream error unless the
    decoder synced it deliberately (subclassing ValueError keeps corrupt
    payloads inside callers' malformed-input handling)."""


def _cat(v: int) -> int:
    """JPEG magnitude category: bits needed for |v| (0 for 0)."""
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_coef_bits(v: int) -> tuple[int, int]:
    """(category, value-bits) with ones-complement negatives."""
    c = _cat(v)
    return (c, v if v >= 0 else v + (1 << c) - 1)


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad to 8-multiples (edge replicate) and return (n_blocks, 8, 8)
    in raster MCU order plus block grid dims."""
    h, w = plane.shape
    H, W = (h + 7) & ~7, (w + 7) & ~7
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    bh, bw = H // 8, W // 8
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, bh, bw


def _quantize_plane(plane: np.ndarray, qtab: np.ndarray):
    blocks, bh, bw = _to_blocks(plane.astype(np.float64) - 128.0)
    coefs = dct2(blocks)
    return np.round(coefs / qtab).astype(np.int64), bh, bw


def _symbol_stream(qblocks: np.ndarray) -> tuple[list, dict, dict]:
    """Per-block (dc_sym, dc_bits, [(ac_sym, ac_bits)...]) + frequency
    dicts for the two Huffman tables."""
    dc_freq: dict[int, int] = {}
    ac_freq: dict[int, int] = {}
    stream = []
    prev_dc = 0
    zz = qblocks.reshape(-1, 64)[:, ZIGZAG]
    for vec in zz:
        diff = int(vec[0]) - prev_dc
        prev_dc = int(vec[0])
        dsym, dbits = _encode_coef_bits(diff)
        dc_freq[dsym] = dc_freq.get(dsym, 0) + 1
        acs = []
        run = 0
        nz = np.nonzero(vec[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(vec[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                acs.append((0xF0, (0, 0)))  # ZRL
                ac_freq[0xF0] = ac_freq.get(0xF0, 0) + 1
                run -= 16
            c, bits = _encode_coef_bits(v)
            sym = (run << 4) | c
            acs.append((sym, (c, bits)))
            ac_freq[sym] = ac_freq.get(sym, 0) + 1
            run = 0
        if last < 63:
            acs.append((0x00, (0, 0)))  # EOB
            ac_freq[0x00] = ac_freq.get(0x00, 0) + 1
        stream.append(((dsym, dbits), acs))
    return stream, dc_freq, ac_freq


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """Baseline JFIF bytes from (h, w) grayscale or (h, w, 3) RGB uint8.
    4:4:4 or 4:2:0 chroma sampling, optimized Huffman tables."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    sub420 = (subsampling == "420") and not gray
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling {subsampling!r} unsupported")
    if gray:
        planes = [img.astype(np.float64)]
        qtabs = [scaled_quant_table(QUANT_LUMA, quality)]
        qtab_of, samp = [0], [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(img.astype(np.float64))
        if sub420:
            H16, W16 = (h + 15) & ~15, (w + 15) & ~15
            ycc = np.pad(ycc, ((0, H16 - h), (0, W16 - w), (0, 0)),
                         mode="edge")
            luma = ycc[..., 0]
            # box-average 2x2 downsample of each chroma plane
            chroma = [ycc[..., k].reshape(H16 // 2, 2, W16 // 2, 2)
                      .mean(axis=(1, 3)) for k in (1, 2)]
            planes = [luma] + chroma
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
            samp = [(1, 1)] * 3
        qtabs = [scaled_quant_table(QUANT_LUMA, quality),
                 scaled_quant_table(QUANT_CHROMA, quality)]
        qtab_of = [0, 1, 1]

    qblocks = []
    for ci, p in enumerate(planes):
        qb, bh, bw = _quantize_plane(p, qtabs[qtab_of[ci]].reshape(8, 8))
        hs, vs = samp[ci]
        if (hs, vs) != (1, 1):
            # reorder raster blocks into MCU order (vs x hs tiles)
            grid = np.arange(bh * bw).reshape(bh, bw)
            tiles = (grid.reshape(bh // vs, vs, bw // hs, hs)
                     .transpose(0, 2, 1, 3).reshape(-1))
            qb = qb[tiles]
        qblocks.append(qb)
    # two table pairs: luma (component 0), chroma (components 1, 2)
    groups = [[0]] if gray else [[0], [1, 2]]
    streams, dhts, tables = [None] * len(planes), [], []
    for gi, members in enumerate(groups):
        dc_freq: dict[int, int] = {}
        ac_freq: dict[int, int] = {}
        for ci in members:
            st, df, af = _symbol_stream(qblocks[ci])
            streams[ci] = st
            for k, v in df.items():
                dc_freq[k] = dc_freq.get(k, 0) + v
            for k, v in af.items():
                ac_freq[k] = ac_freq.get(k, 0) + v
        dc_tab, dc_bits, dc_vals = _canonical_codes(_code_lengths(dc_freq))
        ac_tab, ac_bits, ac_vals = _canonical_codes(_code_lengths(ac_freq))
        tables.append((dc_tab, ac_tab))
        dhts.append(_seg(0xFFC4, bytes([0x00 | gi]) + bytes(dc_bits) + bytes(dc_vals)))
        dhts.append(_seg(0xFFC4, bytes([0x10 | gi]) + bytes(ac_bits) + bytes(ac_vals)))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\0\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, qt in enumerate(qtabs):
        out += _seg(0xFFDB, bytes([ti]) + bytes(
            int(v) for v in qt.reshape(64)[ZIGZAG]))
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, qtab_of[ci]])
    out += _seg(0xFFC0, sof)
    for d in dhts:
        out += d
    sos = bytes([ncomp])
    for ci in range(ncomp):
        gi = 0 if ci in groups[0] else 1
        sos += bytes([ci + 1, (gi << 4) | gi])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    # interleaved MCU scan: each MCU carries hs*vs blocks per component
    # (1 for 4:4:4; 4 luma + 1 Cb + 1 Cr for 4:2:0), streams pre-ordered
    bw = _BitWriter()
    per_mcu = [hs * vs for hs, vs in samp]
    n_mcu = len(qblocks[0]) // per_mcu[0]
    cursors = [0] * ncomp
    for _mi in range(n_mcu):
        for ci in range(ncomp):
            gi = 0 if ci in groups[0] else 1
            dc_tab, ac_tab = tables[gi]
            for _b in range(per_mcu[ci]):
                (dsym, dbits), acs = streams[ci][cursors[ci]]
                cursors[ci] += 1
                code, ln = dc_tab[dsym]
                bw.write(code, ln)
                if dsym:
                    bw.write(dbits, dsym)
                for sym, (c, bits) in acs:
                    code, ln = ac_tab[sym]
                    bw.write(code, ln)
                    if c:
                        bw.write(bits, c)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline-sequential JFIF bytes to (h, w, 3) float64 RGB
    (grayscale broadcast). Supports arbitrary DQT/DHT from the stream,
    generic component sampling factors, and restart intervals. Malformed
    streams raise ValueError (or NotImplementedError for recognized
    unsupported variants) — never a bare internal error."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, KeyError, TypeError, struct.error) as e:
        raise ValueError(f"corrupt JPEG stream: {e!r}") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    hufftabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        while data[pos + 1] == 0xFF:  # fill bytes before a marker (B.1.1.2)
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: no length
            pos += 2
            continue
        seglen, = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(body, np.uint8, 64, o + 1).astype(np.int64)
                qtabs[tq] = zz[UNZIGZAG].reshape(8, 8)
                o += 65
            continue
        if marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                nvals = sum(bits)
                vals = list(body[o + 17 : o + 17 + nvals])
                table: dict[tuple[int, int], int] = {}
                code, vi = 0, 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(ln, code)] = vals[vi]
                        code += 1
                        vi += 1
                    code <<= 1
                hufftabs[(tc, th)] = table
                o += 17 + nvals
            continue
        if marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if h * w > 100_000_000 or not h or not w:
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG (CMYK/YCCK) unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            continue
        if marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})")
        if marker == 0xDD:  # DRI
            restart_interval, = struct.unpack_from(">H", body, 0)
            continue
        if marker == 0xDA:  # SOS — scan follows
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns < len(comps):
                raise NotImplementedError(
                    "non-interleaved multi-scan baseline JPEG unsupported "
                    f"(scan has {ns} of {len(comps)} components)")
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ValueError(f"scan references unknown component {cs}")
                scan.append((comp, tt >> 4, tt & 0xF))
            try:
                return _decode_scan(data, pos, scan, qtabs, hufftabs,
                                    h, w, restart_interval)
            except (IndexError, KeyError) as e:
                raise ValueError(f"corrupt JPEG scan: {e!r}") from e
        # APPn / COM / others: skipped
    raise ValueError("no SOS marker found")


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 17:
        code = (code << 1) | br.read(1)
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _decode_scan(data, pos, scan, qtabs, hufftabs, h, w, restart_interval):
    hmax = max(c["h"] for c, _d, _a in scan)
    vmax = max(c["v"] for c, _d, _a in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c, _d, _a in scan:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.sync_restart()
                preds = [0] * len(scan)
            mcu_count += 1
            for si, (c, dtab, atab) in enumerate(scan):
                dc_table = hufftabs[(0, dtab)]
                ac_table = hufftabs[(1, atab)]
                q = qtabs[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        vec = np.zeros(64, dtype=np.int64)
                        cat = _huff_decode(br, dc_table)
                        diff = _extend(br.read(cat), cat) if cat else 0
                        preds[si] += diff
                        vec[0] = preds[si]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(br, ac_table)
                            if sym == 0x00:  # EOB
                                break
                            run, cat = sym >> 4, sym & 0xF
                            if cat == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                raise ValueError("bad AC symbol")
                            k += run
                            if k > 63:
                                raise ValueError("AC run overflow")
                            vec[k] = _extend(br.read(cat), cat)
                            k += 1
                        block = idct2((vec[UNZIGZAG].reshape(8, 8)
                                       * q).astype(np.float64)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[si][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample each component to full resolution and crop
    full = []
    for (c, _d, _a), plane in zip(scan, planes):
        up = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                       hmax // c["h"], axis=1)
        full.append(up[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255)
        return np.repeat(g[:, :, None], 3, axis=2)
    rgb = _ycbcr_to_rgb(np.stack(full, axis=-1))
    return np.clip(rgb, 0, 255)
