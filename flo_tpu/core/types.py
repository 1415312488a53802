"""Container data model.

Python dataclass equivalents of the reference's core structs
(libflo/src/core/types.rs:133-281). These are *host-side* descriptions of the
parsed container; the batched device tensors used by the codecs are built from
them by the lossless/lossy pipelines.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from .constants import (
    FrameType,
    HEADER_SIZE,
    ResidualEncoding,
    VERSION_MAJOR,
    VERSION_MINOR,
)


@dataclass
class Header:
    """66-byte header, little-endian (file-format.md:44-63)."""

    version_major: int = VERSION_MAJOR
    version_minor: int = VERSION_MINOR
    flags: int = 0
    sample_rate: int = 44100
    channels: int = 1
    bit_depth: int = 16
    total_samples: int = 0
    compression_level: int = 5
    data_crc32: int = 0
    header_size: int = HEADER_SIZE
    toc_size: int = 0
    data_size: int = 0
    extra_size: int = 0
    meta_size: int = 0

    @property
    def is_lossy(self) -> bool:
        return bool(self.flags & 0x01)

    @property
    def lossy_quality(self) -> int:
        return (self.flags >> 8) & 0x0F


@dataclass
class TocEntry:
    """20-byte seek-table entry (types.rs:172-179)."""

    frame_index: int
    byte_offset: int
    frame_size: int
    timestamp_ms: int


@dataclass
class ChannelData:
    """Per-channel payload of a frame (types.rs:182-221)."""

    predictor_coeffs: List[int] = field(default_factory=list)
    shift_bits: int = 0
    residual_encoding: ResidualEncoding = ResidualEncoding.RICE
    rice_parameter: int = 0
    residuals: bytes = b""

    @classmethod
    def silence(cls) -> "ChannelData":
        return cls()

    @classmethod
    def raw(cls, data: bytes) -> "ChannelData":
        return cls(residual_encoding=ResidualEncoding.RAW, residuals=data)

    @classmethod
    def transform(cls, data: bytes) -> "ChannelData":
        return cls(residual_encoding=ResidualEncoding.RAW, residuals=data)


@dataclass
class Frame:
    """One audio frame (types.rs:224-267)."""

    frame_type: int
    frame_samples: int
    flags: int = 0
    channels: List[ChannelData] = field(default_factory=list)

    def byte_size(self) -> int:
        """Serialized size in bytes, matching types.rs:243-267 exactly."""
        size = 6  # frame header: type u8 + samples u32 + flags u8
        ftype = FrameType.from_byte(self.frame_type)
        for ch in self.channels:
            size += 4  # channel length prefix
            if ftype.is_transform:
                size += len(ch.residuals)
            elif ftype.is_alpc:
                size += 1  # coeff count
                size += 4 * len(ch.predictor_coeffs)
                size += 1  # shift_bits
                size += 1  # residual_encoding
                if ch.residual_encoding == ResidualEncoding.RICE:
                    size += 1  # rice parameter
                size += len(ch.residuals)
            elif ftype == FrameType.RAW:
                size += len(ch.residuals)
            # silence adds nothing beyond the length prefix
        return size


@dataclass
class FloFile:
    """Fully parsed container (types.rs:271-278)."""

    header: Header
    toc: List[TocEntry]
    frames: List[Frame]
    extra: bytes = b""
    metadata: bytes = b""
