"""Container serializer (host finalizer).

Assembles header + TOC + DATA + META into the flo byte layout
(libflo/src/writer.rs:39-301, Docs/file-format.md). This is the coarse
device->host boundary: the codecs hand over per-frame/per-channel byte
payloads (already entropy-coded on device + packed), and this module only
concatenates, sizes, CRCs and stamps the header.
"""

from __future__ import annotations

import struct
from typing import Iterable, Sequence

from ..core import crc32
from ..core.constants import (
    FrameType,
    HEADER_SIZE,
    MAGIC,
    ResidualEncoding,
    VERSION_MAJOR,
    VERSION_MINOR,
)
from ..core.types import Frame

_HEADER_STRUCT = struct.Struct("<BBHIBBQB3xIQQQQQ")


def _serialize_channel(ch, ftype: FrameType) -> bytes:
    """Channel payload bytes (writer.rs:256-301)."""
    if ftype == FrameType.SILENCE:
        return b""
    if ftype in (FrameType.RAW, FrameType.TRANSFORM):
        return bytes(ch.residuals)
    if ftype.is_alpc:
        parts = [bytes([len(ch.predictor_coeffs)])]
        if ch.predictor_coeffs:
            parts.append(struct.pack(f"<{len(ch.predictor_coeffs)}i", *ch.predictor_coeffs))
        parts.append(bytes([ch.shift_bits, int(ch.residual_encoding)]))
        if ch.residual_encoding == ResidualEncoding.RICE:
            parts.append(bytes([ch.rice_parameter]))
        parts.append(bytes(ch.residuals))
        return b"".join(parts)
    return b""  # reserved


def serialize_frame(frame: Frame) -> bytes:
    """Frame header + length-prefixed channels (writer.rs:236-254)."""
    ftype = FrameType.from_byte(frame.frame_type)
    parts = [struct.pack("<BIB", frame.frame_type & 0xFF, frame.frame_samples, frame.flags & 0xFF)]
    for ch in frame.channels:
        payload = _serialize_channel(ch, ftype)
        parts.append(struct.pack("<I", len(payload)))
        parts.append(payload)
    return b"".join(parts)


def build_toc_chunk(frame_sizes: Sequence[int], frame_samples: Sequence[int], sample_rate: int) -> bytes:
    """TOC chunk: u32 count + per-frame 20-byte entries with cumulative byte
    offsets and millisecond timestamps (writer.rs:193-224)."""
    parts = [struct.pack("<I", len(frame_sizes))]
    byte_offset = 0
    cum_samples = 0
    for i, (size, nsamp) in enumerate(zip(frame_sizes, frame_samples)):
        timestamp_ms = (cum_samples * 1000) // sample_rate
        parts.append(struct.pack("<IQII", i, byte_offset, size, timestamp_ms & 0xFFFFFFFF))
        byte_offset += size
        cum_samples += nsamp
    return b"".join(parts)


def write(
    sample_rate: int,
    channels: int,
    bit_depth: int,
    compression_level: int,
    frames: Iterable[Frame],
    metadata: bytes = b"",
    *,
    lossy: bool = False,
    lossy_quality: int = 0,
) -> bytes:
    """Write a complete flo file (writer.rs:39-100)."""
    frames = list(frames)
    frame_blobs = [serialize_frame(f) for f in frames]
    return write_from_blobs(
        sample_rate,
        channels,
        bit_depth,
        compression_level,
        frame_blobs,
        [f.frame_samples for f in frames],
        metadata,
        lossy=lossy,
        lossy_quality=lossy_quality,
    )


def write_from_blobs(
    sample_rate: int,
    channels: int,
    bit_depth: int,
    compression_level: int,
    frame_blobs: Sequence[bytes],
    frame_samples: Sequence[int],
    metadata: bytes = b"",
    *,
    lossy: bool = False,
    lossy_quality: int = 0,
) -> bytes:
    """Assemble a file from pre-serialized frame byte blobs.

    This is the fast path used by the batch encoders: frames arrive as raw
    bytes straight from the vectorized finalizer, so no Frame objects need to
    be materialized.
    """
    data_chunk = b"".join(frame_blobs)
    toc_chunk = build_toc_chunk([len(b) for b in frame_blobs], frame_samples, sample_rate)

    flags = 0
    if lossy:
        flags |= 0x01
        flags |= (lossy_quality & 0x0F) << 8

    total_samples = int(sum(frame_samples))
    header = _HEADER_STRUCT.pack(
        VERSION_MAJOR,
        VERSION_MINOR,
        flags,
        sample_rate,
        channels,
        bit_depth,
        total_samples,
        compression_level,
        crc32.compute(data_chunk),
        HEADER_SIZE,
        len(toc_chunk),
        len(data_chunk),
        0,  # extra
        len(metadata),
    )
    return b"".join([MAGIC, header, toc_chunk, data_chunk, metadata])
