"""Format constants for the flo container.

Mirrors the normative values in the reference implementation
(libflo/src/core/types.rs:6-13, Docs/file-format.md:44-73) without copying
its code: these are format-level facts (magic bytes, field sizes, enums).
"""

from __future__ import annotations

import enum

MAGIC = b"FLO!"

#: Size of the header *after* the 4-byte magic (types.rs:9).
HEADER_SIZE = 66

VERSION_MAJOR = 1
VERSION_MINOR = 2

#: TOC entry wire size in bytes (file-format.md:88).
TOC_ENTRY_SIZE = 20

#: Reader sanity caps (reader.rs:83, reader.rs:175, reader.rs:212).
MAX_TOC_ENTRIES = 100_000
MAX_FRAME_SAMPLES = 2_000_000
MAX_LPC_ORDER = 12

#: Header flag bits (file-format.md:65-73).
FLAG_LOSSY = 0x0001
FLAG_QUALITY_SHIFT = 8
FLAG_QUALITY_MASK = 0x0F00

#: Per-frame flag bits (lossless/encoder.rs:124).
FRAME_FLAG_MID_SIDE = 0x01

#: Fixed-predictor marker stored in shift_bits (lossless/encoder.rs:244).
FIXED_PREDICTOR_MARKER = 128


class FrameType(enum.IntEnum):
    """Frame type byte (types.rs:26-45)."""

    SILENCE = 0
    ALPC1 = 1
    ALPC2 = 2
    ALPC3 = 3
    ALPC4 = 4
    ALPC5 = 5
    ALPC6 = 6
    ALPC7 = 7
    ALPC8 = 8
    ALPC9 = 9
    ALPC10 = 10
    ALPC11 = 11
    ALPC12 = 12
    TRANSFORM = 253
    RAW = 254
    RESERVED = 255

    @classmethod
    def from_byte(cls, v: int) -> "FrameType":
        if 0 <= v <= 12 or v in (253, 254):
            return cls(v)
        return cls.RESERVED

    @property
    def is_alpc(self) -> bool:
        return 1 <= int(self) <= 12

    @property
    def is_transform(self) -> bool:
        return self is FrameType.TRANSFORM

    @classmethod
    def from_order(cls, order: int) -> "FrameType":
        """ALPC frame type for an LPC order; order outside 1-12 maps to ALPC8
        (types.rs:69-85)."""
        if 1 <= order <= 12:
            return cls(order)
        return cls.ALPC8


class ResidualEncoding(enum.IntEnum):
    """Residual encoding byte (types.rs:112-128)."""

    RICE = 0
    GOLOMB = 1
    RAW = 2

    @classmethod
    def from_byte(cls, v: int) -> "ResidualEncoding":
        if v == 0:
            return cls.RICE
        if v == 1:
            return cls.GOLOMB
        return cls.RAW


#: compression level (0-9) -> max LPC order (lossless/encoder.rs:289-302).
LPC_ORDER_BY_LEVEL = {0: 0, 1: 2, 2: 4, 3: 4, 4: 6, 5: 8, 6: 8, 7: 10, 8: 12, 9: 12}

#: Minimum compression level at which LPC (orders >=5) is attempted
#: (lossless/encoder.rs:204).
MIN_LEVEL_FOR_LPC = 3

#: Silence detection threshold on |f32 sample| (lossless/encoder.rs:70).
SILENCE_THRESHOLD = 1e-7

#: Sample <-> int conversion scales (core/audio_constants.rs).
I16_MAX_F32 = 32767.0
I16_MIN_F32 = -32768.0

VERSION_STRING = "1.2"
