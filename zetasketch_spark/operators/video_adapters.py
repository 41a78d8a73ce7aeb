"""Optional real-codec adapters for the ``VIDEO_FRAME_DECODERS`` seam.

This container ships no compressed-video library (PyAV, OpenCV,
imageio-ffmpeg all absent), so entropy decode for avc1/hvc1/vp09 stays
honestly unavailable by default — ``multimodal.decode_video`` raises
``NotImplementedError`` naming the seam. When a deployment DOES have PyAV
installed, ``register_available_decoders()`` probes it and plugs a real
per-frame decoder into the same fourcc registry that BI_RGB and MJPEG use
built-in; ``decode_video`` / ``sample_frames`` / ``extract_features`` then
pick it up with no other code change.

The adapter glue is library-agnostic and unit-tested with an injected stub
module (tests/test_video_adapters.py), so the bytes->frames->(h, w, 3)
float64 RGB contract is exercised even in environments without any codec
library:

* ``normalize_frame`` — gray / RGB / RGBA / BGR arrays to the registry's
  (h, w, 3) float64 RGB contract, with hard dimension checks.
* ``avcc_to_annexb`` — MP4 ``avc1`` samples are AVCC (length-prefixed
  NALs, per ISO/IEC 14496-15); stream decoders want Annex-B start codes.
  Bounds-checked conversion, ValueError on malformed length prefixes.
* ``make_av_decoder`` — wraps a PyAV-shaped module's parse/decode loop
  into the registry's ``fn(frame_bytes, w, h)`` contract.
"""

from __future__ import annotations

import numpy as np

from zetasketch_spark.operators.multimodal import register_video_decoder

#: fourcc (AVI strf / MP4 stsd sample entry) -> libav codec name probed by
#: register_available_decoders. Both container spellings are mapped.
FOURCC_CODECS = {
    "avc1": "h264",
    "H264": "h264",
    "hvc1": "hevc",
    "hev1": "hevc",
    "vp09": "vp9",
    "VP90": "vp9",
}

_ANNEXB_PREFIXES = (b"\x00\x00\x01", b"\x00\x00\x00\x01")


def normalize_frame(arr, w: int, h: int, channel_order: str = "rgb"
                    ) -> np.ndarray:
    """Coerce a decoded frame to the registry contract: (h, w, 3) float64
    RGB. Accepts (h, w) gray, (h, w, 3), or (h, w, 4) (alpha dropped);
    ``channel_order='bgr'`` reverses channels (OpenCV-style buffers).
    Raises ValueError when the decoded dimensions contradict the
    container's declared w x h — a lying sample table must fail loudly,
    never mis-decode (same rule as multimodal.extract_mp4_samples)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError(f"undecodable frame array shape {arr.shape}")
    if arr.shape[:2] != (h, w):
        raise ValueError(
            f"decoded frame is {arr.shape[1]}x{arr.shape[0]}, container "
            f"declared {w}x{h}")
    rgb = arr[:, :, :3]
    if channel_order == "bgr":
        rgb = rgb[:, :, ::-1]
    return rgb.astype(np.float64)


def avcc_to_annexb(data: bytes, length_size: int = 4) -> bytes:
    """Convert an AVCC sample (``length_size``-byte big-endian NAL length
    prefixes, ISO/IEC 14496-15 §5.3.4.2) to an Annex-B byte stream
    (00 00 00 01 start codes). Already-Annex-B input passes through.
    Malformed prefixes (NAL overrunning the sample, zero length) raise
    ValueError instead of producing a garbage stream.

    Detection order matters: an AVCC sample whose first NAL is 256-511
    bytes long starts with 00 00 01 (and one with a 1-byte first NAL
    starts with 00 00 00 01), which a prefix sniff alone misreads as a
    start code. So the strict AVCC walk — every length prefix in bounds
    and the NALs tiling the sample EXACTLY — is tried first; only when
    the sample cannot be AVCC does a leading start code mean Annex-B
    passthrough. (A true Annex-B stream whose bytes also happen to tile
    exactly as big-endian lengths is undecidable by any sniffer; the walk
    requirement makes that collision astronomically unlikely rather than
    a whole misclassified length class.)"""
    data = bytes(data)
    if not 1 <= length_size <= 4:
        raise ValueError(f"NAL length size must be 1..4, got {length_size}")
    try:
        out = bytearray()
        pos = 0
        while pos < len(data):
            if pos + length_size > len(data):
                raise ValueError("truncated NAL length prefix in AVCC sample")
            n = int.from_bytes(data[pos:pos + length_size], "big")
            pos += length_size
            if n == 0 or pos + n > len(data):
                raise ValueError(
                    f"NAL length {n} overruns AVCC sample "
                    f"({len(data)} bytes)")
            out += b"\x00\x00\x00\x01" + data[pos:pos + n]
            pos += n
        return bytes(out)
    except ValueError:
        if data[: len(_ANNEXB_PREFIXES[1])] in _ANNEXB_PREFIXES \
                or data[: len(_ANNEXB_PREFIXES[0])] == _ANNEXB_PREFIXES[0]:
            return data  # not AVCC, starts with a start code: Annex-B
        raise


def make_av_decoder(av_module, codec_name: str):
    """Build a registry-contract decoder ``fn(frame_bytes, w, h)`` from a
    PyAV-shaped module: ``CodecContext.create(name, 'r')`` then a
    parse/decode/flush loop per frame chunk. The module only needs the
    attribute surface the loop touches, so tests inject a stub."""

    def decode(frame_bytes, w, h):
        ctx = av_module.CodecContext.create(codec_name, "r")
        payload = bytes(frame_bytes)
        if codec_name in ("h264", "hevc"):
            payload = avcc_to_annexb(payload)
        frames = []
        for packet in ctx.parse(payload):
            frames.extend(ctx.decode(packet))
        frames.extend(ctx.decode(None))  # flush
        if not frames:
            raise ValueError(
                f"{codec_name} decoder produced no frame from "
                f"{len(payload)}-byte sample")
        return normalize_frame(frames[0].to_ndarray(format="rgb24"), w, h)

    return decode


def register_available_decoders(av_module=None) -> list[str]:
    """Probe for PyAV (or take an injected module) and register a real
    decoder for every FOURCC_CODECS codec the build actually supports.
    Returns the fourccs registered — [] when no library is available,
    leaving the honest NotImplementedError behavior untouched."""
    if av_module is None:
        try:
            import av as av_module  # noqa: F811
        except ImportError:
            return []
    registered = []
    for fourcc, codec in FOURCC_CODECS.items():
        try:
            av_module.CodecContext.create(codec, "r")
        except Exception:
            continue  # codec not in this libav build
        register_video_decoder(fourcc, make_av_decoder(av_module, codec))
        registered.append(fourcc)
    return registered
