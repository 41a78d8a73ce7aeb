"""Versioned wire envelope for the non-HLL sketch families.

HLL++ has full ``AggregatorStateProto`` parity (proto3 semantics: an
``encoding_version`` field plus unknown-field tolerance, ported from the
reference's StateTest). The other four families (Count-Min, KLL,
t-digest, Bloom) use compact struct layouts; this module gives them the
same evolution contract:

* layout = ``magic(4) | encoding_version(u8) | payload``. The magic's
  trailing digit is the LAYOUT GENERATION; generation 2 marks this
  versioned envelope, and ANY generation-1 blob (all pre-release
  layouts) is rejected loudly ("not a X sketch") rather than parsed one
  byte off — nothing generation-1 was ever released or durably stored;
* a reader parses the payload fields it knows and IGNORES trailing
  bytes, so a future writer may append fields without breaking old
  readers (the proto unknown-trailing-field rule);
* version 0 / wrong magic are rejected loudly.

Writers must only ever APPEND payload fields when bumping the version.
"""

from __future__ import annotations

import struct

HEADER_LEN = 5  # 4-byte magic + 1-byte encoding version


def pack_header(magic: bytes, version: int) -> bytes:
    return magic + struct.pack("<B", version)


def read_header(data: bytes, magic: bytes, family: str) -> tuple[int, int]:
    """Validate the envelope; returns ``(encoding_version, payload_offset)``."""
    if len(data) < HEADER_LEN or data[:4] != magic:
        raise ValueError(f"not a {family} sketch")
    version = data[4]
    if version < 1:
        raise ValueError(f"invalid {family} encoding version {version}")
    return version, HEADER_LEN
