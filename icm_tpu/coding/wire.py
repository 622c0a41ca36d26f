"""Framework bitstream-container tags.

Three wire formats carry this framework's entropy-coded streams, and
they are NOT interchangeable even where the payload layout matches:

- **host** — untagged rANS bytes, byte-identical to the reference
  coder's output (reference ``entropy_models.py:203-290``); required for
  reference interchange (tests/test_reference_parity.py), so it carries
  no framing of ours.
- **device-v2** — the on-device lane-rANS wire driven by the UNROLLED
  per-slice context programs (``models/device_codec.py``).
- **scan** — the same lane-rANS payload, but produced under the
  one-``lax.scan`` context programs whose stacked fixed-width convs
  reduce in a DIFFERENT float order (``models/scan_codec.py``) — feeding
  a scan stream to an unrolled decoder (or vice versa) desyncs the AR
  context and yields silent garbage.

Tagged formats lead with ``WIRE_MAGIC + format-byte`` so a cross-fed
stream fails loudly with :class:`WireFormatError` instead. The host
decoder cannot demand a tag (reference streams have none), so it uses
:func:`looks_like_framework_wire` — magic + format + an exact
payload-length equation — making a false positive on genuine rANS bytes
(whose leading bytes are a uniform state flush) vanishingly unlikely
(~2^-24 x P[length equation], far below stream corruption rates).
"""

from __future__ import annotations

import struct

WIRE_MAGIC = b"\x93IW"  # 3-byte framework-wire magic
WIRE_DEVICE = 0xD2  # unrolled-protocol device-v2 streams (+ z streams)
WIRE_SCAN = 0x5C  # scan-wire streams (a tier byte follows the format)
WIRE_NAMES = {
    WIRE_DEVICE: "device-v2 (unrolled protocol)",
    WIRE_SCAN: "scan-wire",
}


class WireFormatError(ValueError):
    """A bitstream was fed to a decoder of a different wire format."""


def wire_offset(blob, expect: int) -> int:
    """Validate the 4-byte tag; -> offset of the first payload byte."""
    head = bytes(blob[:4])
    if head[:3] != WIRE_MAGIC:
        raise WireFormatError(
            f"not a framework {WIRE_NAMES[expect]} stream (no wire "
            f"magic; leading bytes {head!r}). Host/reference rANS "
            "streams are untagged — decode those with the host-wire "
            "codec."
        )
    if head[3] != expect:
        found = WIRE_NAMES.get(head[3], f"unknown 0x{head[3]:02x}")
        raise WireFormatError(
            f"wire format mismatch: stream is {found}, decoder expects "
            f"{WIRE_NAMES[expect]}. Scan-wire and unrolled-protocol "
            "streams reduce the AR context in different float orders "
            "and are NOT interchangeable (models/scan_codec.py)."
        )
    return 4


def looks_like_framework_wire(blob):
    """Format byte if ``blob`` parses EXACTLY as a tagged wire, else
    None. Used by the host decoder, which must keep accepting arbitrary
    reference-format rANS bytes (see module docstring)."""
    if bytes(blob[:3]) != WIRE_MAGIC or len(blob) < 16:
        return None
    fmt = blob[3]
    if fmt not in WIRE_NAMES:
        return None
    o = 5 if fmt == WIRE_SCAN else 4
    if len(blob) < o + 12:
        return None
    n_lanes, n_words, n_esc = struct.unpack_from("<III", blob, o)
    if len(blob) == o + 12 + 2 * n_lanes + 2 * n_words + 8 * n_esc:
        return fmt
    return None


def reject_framework_wire(blob, transport: str = "host") -> None:
    """Loud failure when a tagged device/scan stream reaches the host
    coder (whose own streams are untagged reference-format rANS)."""
    fmt = looks_like_framework_wire(blob)
    if fmt is not None:
        raise WireFormatError(
            f"stream is a framework {WIRE_NAMES[fmt]} stream but the "
            f"{transport} coder expects untagged host/reference rANS "
            "bytes — decode it with the codec wire it was encoded "
            "under."
        )
