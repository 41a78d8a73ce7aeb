"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side shape is real and tested — schema, partition-preserving
``mapInPandas``, Arrow batch flow, feature extraction over binary payloads.
Decode is REAL for headerful raster/PCM formats, implemented in pure numpy
(this container ships no image/audio libraries):

* **BMP** (24-bit uncompressed BITMAPINFOHEADER, bottom-up or top-down)
* **PPM** (binary P6, maxval 255)
* **PNG** (8-bit gray/RGB/GA/RGBA, non-interlaced, all five scanline
  filters; stdlib zlib for the DEFLATE stream)
* **WAV** (RIFF PCM16, mono or interleaved multi-channel)
* **AVI** (RIFF video: uncompressed 24-bit BI_RGB AND Motion-JPEG) —
  including real nearest-timestamp frame sampling
* **MP4** (ISO-BMFF: full sample-table extraction for any codec; frame
  decode built-in for the JPEG family 'jpeg'/'mjpa'/'mjpb')
* **JPEG** (baseline sequential, gray/4:4:4/4:2:0, optimized Huffman —
  see ``operators/jpeg.py``)

Entropy-coded codecs (avc1/hvc1/vp09...) have NO in-repo decoder: they
dispatch through the fourcc-keyed ``VIDEO_FRAME_DECODERS`` registry
(``register_video_decoder``) and raise ``NotImplementedError`` when
unregistered, unless ``deterministic_fake=True`` derives a
fake-but-deterministic "decoded" block from the payload bytes so the
downstream plumbing keeps working for those formats too. Structurally
CORRUPT payloads (valid magic, broken body) raise ``ValueError`` and are
never silently faked — corruption must stay distinguishable from an
unsupported codec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
    StructField("payload", BinaryType()),
])


# ---------------------------------------------------------------------------
# encoders (deterministic test/synthesis payloads — also round-trip oracles)
# ---------------------------------------------------------------------------

def encode_ppm(rgb: np.ndarray) -> bytes:
    """Binary P6 PPM from an (h, w, 3) uint8 array."""
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(rgb, dtype=np.uint8).tobytes()


def encode_bmp(rgb: np.ndarray) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up rows, BGR,
    4-byte row padding) from an (h, w, 3) uint8 array."""
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    img = np.zeros((h, stride), dtype=np.uint8)
    img[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = img.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(rgb: np.ndarray) -> bytes:
    """Real PNG (8-bit RGB, color type 2, non-interlaced) from an
    (h, w, 3) uint8 array — pure numpy + stdlib zlib. Each scanline uses
    filter ``row % 5``, so a decoder must handle None/Sub/Up/Average/
    Paeth to read our own output (the round-trip test exercises all
    five)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    bpp = 3
    rows = rgb.reshape(h, w * bpp).astype(np.int16)
    prior = np.zeros(w * bpp, dtype=np.int16)
    out = bytearray()
    for y in range(h):
        cur = rows[y]
        left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int16), prior[:-bpp]])
        ft = y % 5
        if ft == 0:
            filt = cur
        elif ft == 1:
            filt = cur - left
        elif ft == 2:
            filt = cur - prior
        elif ft == 3:
            filt = cur - (left + prior) // 2
        else:
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prior, ul))
            filt = cur - pred
        out.append(ft)
        out += (filt & 0xFF).astype(np.uint8).tobytes()
        prior = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
            + _png_chunk(b"IEND", b""))


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (b"\0" * (len(body) & 1))


def _riff_list(kind: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", kind + body)


_MJPG_FOURCC = 0x47504A4D  # 'MJPG' little-endian


def encode_avi(frames: np.ndarray, fps: int = 10, codec: str = "rgb24",
               quality: int = 90) -> bytes:
    """Real AVI (RIFF 'AVI ', single 'vids' stream) from an (n, h, w, 3)
    uint8 array — the standard video container, readable by any AVI tool.
    Pure struct + numpy.

    codec="rgb24": 24-bit BI_RGB bottom-up BGR frames ('00db' chunks).
    codec="mjpg": Motion-JPEG — every frame is an independent baseline
    JFIF image from the in-repo codec ('00dc' chunks), the classic
    compressed-video interchange format."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    if codec == "rgb24":
        stride = (w * 3 + 3) & ~3
        dib = np.zeros((n, h, stride), dtype=np.uint8)
        dib[:, :, : w * 3] = frames[:, ::-1, :, ::-1].reshape(n, h, w * 3)
        chunks = [dib[i].tobytes() for i in range(n)]
        frame_bytes, handler, comp, ctag = h * stride, b"DIB ", 0, b"00db"
    elif codec == "mjpg":
        from zetasketch_spark.operators.jpeg import encode_jpeg

        chunks = [encode_jpeg(frames[i], quality=quality) for i in range(n)]
        frame_bytes = max((len(c) for c in chunks), default=0)
        handler, comp, ctag = b"MJPG", _MJPG_FOURCC, b"00dc"
    else:
        raise ValueError(f"unknown AVI codec {codec!r}")
    avih = struct.pack("<IIIIIIIIIIIIII",
                       1_000_000 // fps, frame_bytes * fps, 0, 0x10, n, 0,
                       1, frame_bytes, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh",
                       b"vids", handler, 0, 0, 0, 0, 1, fps, 0, n,
                       frame_bytes, 0xFFFFFFFF & -1, 0, 0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, comp, frame_bytes,
                       2835, 2835, 0, 0)
    hdrl = _riff_list(b"hdrl",
                      _riff_chunk(b"avih", avih)
                      + _riff_list(b"strl", _riff_chunk(b"strh", strh)
                                   + _riff_chunk(b"strf", strf)))
    movi = _riff_list(b"movi", b"".join(
        _riff_chunk(ctag, c) for c in chunks))
    return _riff_chunk(b"RIFF", b"AVI " + hdrl + movi)


def _decode_frame_rgb24(fb: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(fb, np.uint8, count=h * stride).reshape(h, stride)
    return rows[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1].astype(np.float64)


def _decode_frame_mjpg(fb: bytes, w: int, h: int) -> np.ndarray:
    from zetasketch_spark.operators.jpeg import decode_jpeg

    return decode_jpeg(fb)


#: The compressed-video plugin seam. Keyed by the strf biCompression
#: fourcc (0 = BI_RGB is "rgb24"); each entry decodes ONE frame chunk to
#: (h, w, 3) float64 RGB. BI_RGB and MJPG ship built-in; an H.264/VP9/
#: MP4 pipeline registers its decoder here (register_video_decoder) and
#: decode_video/sample_frames pick it up by fourcc — no entropy-decode
#: pretense in-repo (cf. the honest MP4 stub in probe_mp4/decode_image).
VIDEO_FRAME_DECODERS: dict[str, object] = {
    "rgb24": _decode_frame_rgb24,
    "MJPG": _decode_frame_mjpg,
}


def register_video_decoder(fourcc: str, fn) -> None:
    """Plug in a per-frame decoder for an AVI codec fourcc (e.g. a real
    'H264' implementation): ``fn(frame_bytes, w, h) -> (h, w, 3)`` float64
    RGB."""
    VIDEO_FRAME_DECODERS[fourcc] = fn


def _walk_mp4_boxes(payload: bytes, pos: int, end: int, visit) -> None:
    """Bounds-checked ISO-BMFF box walk shared by probe_mp4 and
    extract_mp4_samples: calls ``visit(tag, body, nxt)`` per box and
    recurses into the box body when visit returns True. Overrunning or
    truncated box headers raise ValueError."""
    while pos + 8 <= end:
        size, = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body, nxt = pos + 8, pos + size
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError(f"mp4 box {tag!r} truncated largesize")
            size, = struct.unpack_from(">Q", payload, pos + 8)
            body, nxt = pos + 16, pos + size
        elif size == 0:  # to end of enclosing box
            nxt = end
        if size != 0 and (nxt <= pos or nxt > end):
            raise ValueError(f"mp4 box {tag!r} overruns its parent")
        if visit(tag, body, nxt):
            _walk_mp4_boxes(payload, body, nxt, visit)
        pos = nxt


def _mp4_box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def _mp4_fullbox(tag: bytes, body: bytes, version: int = 0,
                 flags: int = 0) -> bytes:
    return _mp4_box(tag, struct.pack(">B3s", version,
                                     flags.to_bytes(3, "big")) + body)


def encode_mp4_mjpeg(frames: np.ndarray, fps: int = 10,
                     quality: int = 90) -> bytes:
    """Real ISO-BMFF MP4 with a JPEG-codec video track ('jpeg' sample
    entry — the Motion-JPEG-in-MP4 interchange profile): full sample
    tables (stsd/stts/stsc/stsz/stco), one chunk in mdat, every sample a
    baseline JFIF image from the in-repo codec. Pure struct + numpy."""
    from zetasketch_spark.operators.jpeg import encode_jpeg

    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    samples = [encode_jpeg(frames[i], quality=quality) for i in range(n)]
    ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isommp41")
    mdat = _mp4_box(b"mdat", b"".join(samples))
    chunk_offset = len(ftyp) + 8  # first sample byte, absolute in file

    # timescale a multiple of fps so the per-sample stts delta is exact
    # (a fixed 1000 would truncate e.g. fps=7 to 1000//7 and round-trip
    # as 7.04 fps)
    timescale = fps * 1000
    duration = n * 1000

    entry = (b"\x00" * 6 + struct.pack(">H", 1)          # data_ref_index
             + b"\x00" * 16                               # pre_defined/reserved
             + struct.pack(">HH", w, h)
             + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
             + b"\x00" * 4 + struct.pack(">H", 1)         # frame_count
             + b"\x00" * 32                               # compressorname
             + struct.pack(">Hh", 24, -1))                # depth, pre_defined
    stsd = _mp4_fullbox(b"stsd", struct.pack(">I", 1)
                        + _mp4_box(b"jpeg", entry))
    stts = _mp4_fullbox(b"stts", struct.pack(">III", 1, n, 1000))
    stsc = _mp4_fullbox(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    stsz = _mp4_fullbox(b"stsz", struct.pack(">II", 0, n)
                        + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _mp4_fullbox(b"stco", struct.pack(">II", 1, chunk_offset))
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)

    url = _mp4_fullbox(b"url ", b"", flags=1)  # self-contained
    dref = _mp4_fullbox(b"dref", struct.pack(">I", 1) + url)
    dinf = _mp4_box(b"dinf", dref)
    vmhd = _mp4_fullbox(b"vmhd", b"\x00" * 8, flags=1)
    minf = _mp4_box(b"minf", vmhd + dinf + stbl)
    hdlr = _mp4_fullbox(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12
                        + b"zetasketch\x00")
    mdhd = _mp4_fullbox(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale,
                                             duration, 0x55C4, 0))
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    tkhd = _mp4_fullbox(b"tkhd", struct.pack(">IIII", 0, 0, 1, 0)
                        + struct.pack(">I", duration) + b"\x00" * 8
                        + struct.pack(">HHHH", 0, 0, 0, 0)
                        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                                      0, 0, 0x40000000)
                        + struct.pack(">II", w << 16, h << 16), flags=7)
    mvhd = _mp4_fullbox(b"mvhd", struct.pack(">IIII", 0, 0, timescale,
                                             duration)
                        + struct.pack(">IHH", 0x10000, 0x0100, 0)
                        + b"\x00" * 8
                        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                                      0, 0, 0x40000000)
                        + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd + mdia))
    return ftyp + mdat + moov


def extract_mp4_samples(payload: bytes) -> tuple[str, list[bytes], float,
                                                 tuple[int, int]]:
    """Real ISO-BMFF sample extraction: walk the box tree of the FIRST
    'vide' track, resolve the stsc chunk->sample mapping against
    stsz/stco (or co64), and return ``(codec_fourcc, sample_bytes, fps,
    (width, height))``. This is the container half of MP4 decode —
    codec-agnostic and exact; frame decode dispatches by the returned
    fourcc. Truncated or lying sample tables raise ValueError (never a
    bare struct.error, never an attacker-sized allocation)."""
    payload = bytes(payload)
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF container (missing ftyp)")

    CONTAINERS = {b"moov", b"mdia", b"minf", b"stbl"}
    tracks: list[dict] = []
    stack: list[dict] = []

    def visit(tag, body, nxt):
        def need(off, nbytes):
            if off + nbytes > nxt:
                raise ValueError(f"mp4 box {tag!r} too short for its fields")

        if tag == b"trak":
            # walk the subtree here so the open-trak stack pops when the
            # subtree ends (the generic walker has no exit hook)
            tracks.append({})
            stack.append(tracks[-1])
            try:
                _walk_mp4_boxes(payload, body, nxt, visit)
            finally:
                stack.pop()
            return False
        if tag in CONTAINERS:
            return True
        cur = stack[-1] if stack else None
        if cur is None:
            return False
        fb = body + 4  # fullbox payload (skip version/flags)
        if tag == b"hdlr":
            need(body, 12)
            cur["handler"] = payload[fb + 4 : fb + 8]
        elif tag == b"mdhd":
            need(body, 4)
            ver = payload[body]
            off = fb + (16 if ver == 1 else 8)
            need(off, 4)
            cur["timescale"], = struct.unpack_from(">I", payload, off)
        elif tag == b"stsd":
            need(body, 8)
            n, = struct.unpack_from(">I", payload, fb)
            if n >= 1:
                need(fb + 4, 8)
                # first entry box at fb+4: size, fourcc, then entry data
                cur["codec"] = payload[fb + 8 : fb + 12]
                # VisualSampleEntry: 8 bytes SampleEntry + 16 bytes
                # pre_defined/reserved, then coded width/height
                if fb + 40 <= nxt:
                    cur["dims"] = struct.unpack_from(">HH", payload, fb + 36)
        elif tag == b"stts":
            need(body, 8)
            n, = struct.unpack_from(">I", payload, fb)
            need(fb + 4, 8 * n)
            cur["stts"] = [struct.unpack_from(">II", payload, fb + 4 + 8 * i)
                           for i in range(n)]
        elif tag == b"stsc":
            need(body, 8)
            n, = struct.unpack_from(">I", payload, fb)
            need(fb + 4, 12 * n)
            cur["stsc"] = [struct.unpack_from(">III", payload, fb + 4 + 12 * i)
                           for i in range(n)]
        elif tag == b"stsz":
            need(body, 12)
            fixed, n = struct.unpack_from(">II", payload, fb)
            if n > len(payload):  # more samples than bytes in the file
                raise ValueError(f"mp4 stsz claims {n} samples "
                                 f"in a {len(payload)}-byte file")
            if fixed:
                cur["sizes"] = [fixed] * n
            else:
                need(fb + 8, 4 * n)
                cur["sizes"] = list(struct.unpack_from(f">{n}I", payload,
                                                       fb + 8))
        elif tag in (b"stco", b"co64"):
            need(body, 8)
            n, = struct.unpack_from(">I", payload, fb)
            unit = 4 if tag == b"stco" else 8
            need(fb + 4, unit * n)
            fmt = ">%d%s" % (n, "I" if tag == b"stco" else "Q")
            cur["offsets"] = list(struct.unpack_from(fmt, payload, fb + 4))
        return False

    try:
        _walk_mp4_boxes(payload, 0, len(payload), visit)
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated mp4 container: {e!r}") from e
    finally:
        stack.clear()
    vide = [t for t in tracks if t.get("handler") == b"vide"]
    if not vide:
        # structurally fine, just nothing to decode — the unsupported-
        # payload contract, not the corruption one
        raise NotImplementedError("mp4 has no video track")
    t = vide[0]
    for k in ("codec", "sizes", "offsets", "stsc"):
        if k not in t:
            raise ValueError(f"mp4 video track missing sample table ({k})")
    # chunk -> sample mapping (ISO 14496-12 §8.7.4): stsc entries apply
    # from first_chunk until the next entry's first_chunk
    sizes, offsets, stsc = t["sizes"], t["offsets"], t["stsc"]
    samples: list[bytes] = []
    si = 0
    for ci, chunk_off in enumerate(offsets, start=1):
        spc = 0
        for first, count, _desc in stsc:
            if first <= ci:
                spc = count
            else:
                break
        pos = chunk_off
        for _ in range(spc):
            if si >= len(sizes):
                break
            if pos + sizes[si] > len(payload):
                raise ValueError("mp4 sample overruns the file")
            samples.append(payload[pos : pos + sizes[si]])
            pos += sizes[si]
            si += 1
    if si < len(sizes):
        raise ValueError("mp4 sample tables inconsistent "
                         f"({si} mapped of {len(sizes)})")
    ts = t.get("timescale", 1000)
    stts = t.get("stts") or [(len(sizes), ts)]
    fps = ts / stts[0][1] if stts[0][1] else 0.0
    codec = t["codec"].decode("ascii", "replace").strip()
    w, h = t.get("dims", (0, 0))
    return codec, samples, fps, (int(w), int(h))


#: MP4 codec fourccs decodable with the in-repo JPEG codec. Everything
#: else (avc1/hvc1/vp09...) routes to VIDEO_FRAME_DECODERS — the same
#: plugin seam AVI uses — and raises honestly when unregistered.
_MP4_JPEG_CODECS = {"jpeg", "mjpa", "mjpb"}


def decode_video(payload: bytes) -> tuple[np.ndarray, float]:
    """Decode a video payload to ``((n, h, w, 3) float64 RGB frames,
    fps)``. AVI: walks the RIFF tree for avih/strf/movi. MP4 (ISO-BMFF):
    real sample-table extraction (extract_mp4_samples), then per-sample
    decode — built-in for the JPEG codec family, plugin registry
    (VIDEO_FRAME_DECODERS) for compressed codecs like avc1."""
    payload = bytes(payload)
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        from zetasketch_spark.operators.jpeg import decode_jpeg

        codec, samples, fps, (w, h) = extract_mp4_samples(payload)
        if not samples:
            raise ValueError("mp4 video track has no samples")
        if codec in _MP4_JPEG_CODECS:
            dec_frames = [decode_jpeg(s) for s in samples]
        elif codec in VIDEO_FRAME_DECODERS:
            # same plugin contract as AVI: fn(frame_bytes, w, h) with the
            # stsd sample-entry dimensions
            dec_frames = [VIDEO_FRAME_DECODERS[codec](s, w, h)
                          for s in samples]
        else:
            raise NotImplementedError(
                f"mp4 codec {codec!r} has no registered decoder "
                f"(register_video_decoder; built-in JPEG family: "
                f"{sorted(_MP4_JPEG_CODECS)})")
        return np.stack(dec_frames), fps
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError(
            "video decode supports RIFF/AVI and ISO-BMFF MP4 containers")
    us_per_frame = w = h = None
    stream_type = None  # fccType of the most recent strh (vids/auds/...)
    bpp = comp = None
    raw_frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal us_per_frame, w, h, stream_type, bpp, comp
        while pos + 8 <= end:
            tag = payload[pos : pos + 4]
            size, = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            if tag == b"LIST":
                walk(body + 4, body + size)
            elif tag == b"avih":
                us_per_frame, = struct.unpack_from("<I", payload, body)
                w, h = struct.unpack_from("<II", payload, body + 32)
            elif tag == b"strh":
                stream_type = payload[body : body + 4]
            elif tag == b"strf" and stream_type == b"vids":
                # only a video stream's strf is a BITMAPINFOHEADER (an
                # audio strf is WAVEFORMATEX — offset 14 is bits/sample)
                bpp, = struct.unpack_from("<H", payload, body + 14)
                comp, = struct.unpack_from("<I", payload, body + 16)
            elif tag[2:] in (b"db", b"dc") and size:
                raw_frames.append(payload[body : body + size])
            pos = body + size + (size & 1)

    walk(12, len(payload))
    if not (us_per_frame and w and h and raw_frames):
        raise ValueError("AVI missing avih/movi data")
    if comp in (0, None):
        codec = "rgb24"
        if bpp not in (24, None):
            raise NotImplementedError(f"AVI BI_RGB bpp={bpp} unsupported")
    else:
        codec = struct.pack("<I", comp).decode("ascii", "replace")
    dec = VIDEO_FRAME_DECODERS.get(codec)
    if dec is None:
        raise NotImplementedError(
            f"AVI codec {codec!r} has no registered decoder "
            f"(register_video_decoder; built-in: "
            f"{sorted(VIDEO_FRAME_DECODERS)})")
    out = np.empty((len(raw_frames), h, w, 3), dtype=np.float64)
    for i, fb in enumerate(raw_frames):
        out[i] = dec(fb, w, h)
    return out, 1_000_000.0 / us_per_frame


def encode_wav(samples: np.ndarray, rate: int = 16000, channels: int = 1) -> bytes:
    """RIFF PCM16 WAV from float samples in [-1, 1] (interleaved if
    multi-channel)."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = np.round(pcm * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(pcm16)) + pcm16)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


# ---------------------------------------------------------------------------
# decoders (pure numpy)
# ---------------------------------------------------------------------------

def _decode_bmp(payload: bytes) -> np.ndarray:
    off, = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    bpp, = struct.unpack_from("<H", payload, 28)
    comp, = struct.unpack_from("<I", payload, 30)
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP variant unsupported (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].astype(np.float64)  # BGR -> RGB


def _decode_ppm(payload: bytes) -> np.ndarray:
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> data
    pos, fields, n = 2, [], len(payload)
    while len(fields) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("truncated PPM header")
            pos = nl + 1
            continue
        end = pos
        while end < n and not payload[end : end + 1].isspace():
            end += 1
        if end == pos or end >= n:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[pos:end]))
        pos = end
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval} unsupported")
    raw = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    return raw.reshape(h, w, 3).astype(np.float64)


def _decode_png(payload: bytes) -> np.ndarray:
    """Pure numpy+zlib PNG decoder: 8-bit depth, color types 0/2/4/6,
    non-interlaced, all five scanline filters. Sub rows unfilter via a
    per-channel cumsum; Average/Paeth rows walk pixels (left-neighbor
    dependency is inherently sequential). Alpha is dropped, gray is
    broadcast — the contract is an (h, w, 3) float64 RGB block."""
    pos, idat = 8, bytearray()
    w = h = nch = None
    while pos + 8 <= len(payload):
        ln, = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, flt, interlace = struct.unpack(">IIBBBBB", body)
            nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
            if depth != 8 or comp or flt or interlace or nch is None:
                raise NotImplementedError(
                    f"PNG variant unsupported (depth={depth}, color={ctype}, "
                    f"interlace={interlace})")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if not w or not h or w * h > 100_000_000:
        raise ValueError(f"implausible PNG dimensions {w}x{h}")
    expected = h * (w * nch + 1)
    dobj = zlib.decompressobj()
    raw = np.frombuffer(dobj.decompress(bytes(idat), expected),
                        dtype=np.uint8)
    if raw.size != expected or dobj.unconsumed_tail or dobj.flush():
        raise ValueError("PNG IDAT size mismatch")
    raw = raw.reshape(h, w * nch + 1)
    recon = np.zeros((h, w * nch), dtype=np.int32)
    prior = np.zeros(w * nch, dtype=np.int32)
    for y in range(h):
        ft, filt = int(raw[y, 0]), raw[y, 1:].astype(np.int32)
        if ft == 0:
            row = filt
        elif ft == 1:  # Sub: cumsum per channel (mod-256 distributes)
            row = filt.copy()
            for c in range(nch):
                row[c::nch] = np.cumsum(filt[c::nch], dtype=np.int64) & 0xFF
        elif ft == 2:  # Up
            row = (filt + prior) & 0xFF
        elif ft in (3, 4):  # Average/Paeth: sequential left dependency
            row = np.zeros_like(filt)
            left = np.zeros(nch, dtype=np.int32)
            for x in range(w):
                s = slice(x * nch, (x + 1) * nch)
                up = prior[s]
                if ft == 3:
                    pred = (left + up) >> 1
                else:
                    ul = prior[x * nch - nch : x * nch] if x else \
                        np.zeros(nch, dtype=np.int32)
                    p = left + up - ul
                    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                    pred = np.where((pa <= pb) & (pa <= pc), left,
                                    np.where(pb <= pc, up, ul))
                left = (filt[s] + pred) & 0xFF
                row[s] = left
        else:
            raise ValueError(f"PNG filter {ft} invalid")
        recon[y] = row
        prior = row
    px = recon.reshape(h, w, nch).astype(np.float64)
    if nch == 1:
        return np.repeat(px, 3, axis=2)
    if nch == 2:  # gray + alpha: drop alpha, broadcast gray
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGB / RGBA (alpha dropped)


def decode_image(payload: bytes, deterministic_fake: bool = False) -> np.ndarray:
    """Decode a BMP, binary-PPM, PNG, or baseline-JPEG payload to an
    (h, w, 3) float64 RGB array — pure numpy + stdlib zlib, no image
    library. Unrecognized formats raise unless ``deterministic_fake`` is
    set."""
    payload = bytes(payload)
    try:
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
        if payload[:2] == b"P6":
            return _decode_ppm(payload)
        if payload[:8] == _PNG_SIG:
            return _decode_png(payload)
        if payload[:2] == b"\xff\xd8":
            from zetasketch_spark.operators.jpeg import decode_jpeg
            return decode_jpeg(payload)
    except (ValueError, struct.error, zlib.error, IndexError,
            NotImplementedError):
        # malformed header: arbitrary bytes can start with a magic pair —
        # fall through to the fake path (or raise) instead of crashing
        if not deterministic_fake:
            raise
    if not deterministic_fake:
        raise NotImplementedError(
            "unrecognized image payload (BMP/PPM/PNG/baseline-JPEG decode "
            "in pure numpy) — pass deterministic_fake=True for plumbing tests")
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return np.tile(h, (8, 1)).astype(np.float64)  # fake 8x64 'pixel' block


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF PCM16 WAV payload to ``(samples float64 in [-1, 1]
    shaped (n, channels), sample_rate)`` — pure numpy."""
    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("only RIFF/WAVE audio decode is supported")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size, = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if tag == b"fmt ":
            fmt_code, channels, rate = struct.unpack_from("<HHI", payload, body)
            bits, = struct.unpack_from("<H", payload, body + 14)
            if fmt_code != 1 or bits != 16:
                raise NotImplementedError(f"WAV fmt={fmt_code}/bits={bits} unsupported")
        elif tag == b"data":
            data = payload[body : body + size]
        pos = body + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    pcm = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    return pcm.reshape(-1, channels), rate


def probe_mp4(payload: bytes) -> dict:
    """Typed-metadata extraction from an ISO-BMFF (MP4/MOV) container
    WITHOUT decoding: walks the box tree for mvhd (timescale/duration)
    and tkhd (track dimensions). Frame DECODE stays honestly stubbed
    (needs codecs); the metadata path is real — it is what a 100 TB
    catalog scan actually runs."""
    payload = bytes(payload)
    out = {"brand": None, "duration_ms": None, "width": None, "height": None,
           "n_tracks": 0}

    def visit(tag, body, nxt):
        def need(n: int) -> None:
            if body + n > nxt:
                raise ValueError(f"mp4 box {tag!r} too short for its fields")

        if tag == b"ftyp":
            need(4)
            out["brand"] = payload[body : body + 4].decode("ascii", "replace")
        elif tag in (b"moov", b"trak"):
            if tag == b"trak":
                out["n_tracks"] += 1
            return True
        elif tag == b"mvhd":
            need(1)
            ver = payload[body]
            if ver == 1:
                need(32)
                ts, dur = struct.unpack_from(">IQ", payload, body + 20)
            else:
                need(20)
                ts, dur = struct.unpack_from(">II", payload, body + 12)
            if ts:
                out["duration_ms"] = int(dur * 1000 // ts)
        elif tag == b"tkhd":
            need(1)
            ver = payload[body]
            off = body + (88 if ver == 1 else 76)
            need(off - body + 8)
            w, h = struct.unpack_from(">II", payload, off)
            w, h = w >> 16, h >> 16  # 16.16 fixed point
            if w and h:
                out["width"], out["height"] = w, h
        return False

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF container (missing ftyp)")
    _walk_mp4_boxes(payload, 0, len(payload), visit)
    return out


def resize_image(block: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of a decoded block (any trailing dims)."""
    h, w = block.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return block[ys][:, xs]


def sample_frames(payload: bytes, duration_ms: int, every_ms: int = 1000,
                  deterministic_fake: bool = False) -> list[np.ndarray]:
    """Frame sampling at a fixed period. REAL wherever decode_video can
    decode the payload (raw/MJPEG AVI, JPEG-codec MP4, any registered
    codec): picks the frame nearest each sampled timestamp. Undecodable
    codecs (e.g. unregistered avc1) raise, unless ``deterministic_fake``
    derives one block per sampled timestamp so the batch shapes
    downstream stay real."""
    payload = bytes(payload)
    try:
        frames, fps = decode_video(payload)
    except NotImplementedError:
        # undecodable codec/container — fake path below; structural
        # corruption (ValueError) propagates
        frames = None
    if frames is not None and len(frames):
        n_samples = max(1, int(duration_ms // every_ms))
        idx = np.minimum(np.rint(np.arange(n_samples) * every_ms
                                 / 1000.0 * fps).astype(np.int64),
                         len(frames) - 1)
        return [frames[i] for i in idx]
    if not deterministic_fake:
        raise NotImplementedError(
            "payload's video codec is not decodable in-repo (raw/MJPEG AVI "
            "and JPEG-codec MP4 decode for real; register_video_decoder "
            "plugs in compressed codecs); pass deterministic_fake=True for "
            "plumbing tests")
    n = max(1, duration_ms // every_ms)
    return [decode_image(payload[i:] + payload[:i], deterministic_fake=True)
            for i in range(min(n, 8))]


# ---------------------------------------------------------------------------
# synthesis + feature extraction
# ---------------------------------------------------------------------------

def synthesize_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payloads: PPM/BMP/PNG/JPEG
    images, PCM16 WAV audio, and a 4-cycle of video rows — raw-RGB AVI,
    Motion-JPEG AVI, JPEG-codec MP4 (all decodable above) and opaque
    fake-mp4 bytes exercising the honest unregistered-codec path."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)
    rows = []
    for i in range(n):
        kind = str(kinds[i % 3])
        if kind == "image":
            h, w = int(rng.integers(4, 32)), int(rng.integers(4, 32))
            rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            if i % 4 == 3:
                from zetasketch_spark.operators.jpeg import encode_jpeg
                payload, mime = encode_jpeg(rgb, quality=92), "image/jpeg"
            else:
                # image rows occur at i % 3 == 0, so cycle on i // 3
                enc = (encode_ppm, encode_bmp, encode_png)[(i // 3) % 3]
                payload = enc(rgb)
                mime = ("image/x-portable-pixmap", "image/bmp",
                        "image/png")[(i // 3) % 3]
            dur = 0
        elif kind == "audio":
            dur = int(rng.integers(100, 2000))
            t = np.arange(int(16000 * dur / 1000)) / 16000.0
            payload = encode_wav(0.5 * np.sin(2 * np.pi * rng.integers(80, 2000) * t))
            mime, h, w = "audio/wav", 0, 0
        elif (i // 3) % 4 < 3:  # real video: raw AVI, MJPEG AVI, JPEG MP4
            nf, fps = int(rng.integers(2, 6)), 10
            h, w = int(rng.integers(4, 16)), int(rng.integers(4, 16))
            fr = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
            variant = (i // 3) % 4
            if variant == 2:
                payload = encode_mp4_mjpeg(fr, fps)
                mime = "video/mp4;codecs=jpeg"
            else:
                payload = encode_avi(fr, fps,
                                     codec=("rgb24", "mjpg")[variant])
                mime = "video/x-msvideo"
            dur = nf * 1000 // fps
        else:  # opaque compressed container (decoder honestly absent)
            size = int(rng.integers(256, 4096))
            payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
            mime, dur = "video/mp4", int(rng.integers(100, 60000))
            h, w = int(rng.integers(16, 512)), int(rng.integers(16, 512))
        rows.append((i, kind, mime, w, h, dur, payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("mean_val", DoubleType()),
    StructField("feature_dim", IntegerType()),
])


def extract_features(df: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Partition-parallel feature extraction over binary payloads via
    ``mapInPandas``. Decode is inherently per-item, but iteration is over
    plain arrays (no ``iterrows`` row materialization); images/audio/video
    use the real numpy decoders wherever the codec is in-repo or
    registered; only undecodable codecs take the deterministic fake."""

    def fn(batches):
        for pdf in batches:
            feats = []
            for mid, kind, payload in zip(
                    pdf["media_id"].to_numpy(), pdf["kind"].to_numpy(),
                    pdf["payload"].to_numpy()):
                payload = bytes(payload)
                if kind == "audio":
                    samples, _ = decode_audio(payload)
                    mean, dim = float(np.abs(samples).mean()), int(samples.size)
                elif kind == "image":
                    block = decode_image(payload,
                                         deterministic_fake=deterministic_fake)
                    mean, dim = float(block.mean()), int(block.size)
                else:  # video: real decode (AVI or MP4) where the codec is
                    # in-repo/registered; deterministic fake for payloads
                    # with no decodable codec. Corrupt containers (valid
                    # magic, broken body -> ValueError) propagate loudly —
                    # corruption must not masquerade as a decoded feature.
                    try:
                        frames, _fps = decode_video(payload)
                        mean, dim = float(frames.mean()), int(frames.size)
                    except NotImplementedError:
                        block = decode_image(payload, deterministic_fake=True)
                        mean, dim = float(block.mean()), int(block.size)
                feats.append((int(mid), kind, len(payload),
                              float(np.round(mean, 6)), dim))
            yield pd.DataFrame(feats, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(fn, FEATURE_SCHEMA)
