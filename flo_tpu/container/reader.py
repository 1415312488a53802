"""Container parser (host side).

Parses a flo byte stream into the :class:`FloFile` data model. Behavior mirrors
the reference reader (libflo/src/reader.rs:16-256) and the normative layout in
Docs/file-format.md; implementation is numpy/struct-based rather than a
byte-cursor translation.

Frames are located through the TOC (random access), exactly like the
reference: the DATA chunk is not scanned linearly, each TOC entry's
(byte_offset, frame_size) window is parsed independently. Transform frames
store a single serialized blob as one pseudo-channel; all other frame types
store ``channels`` channel entries.
"""

from __future__ import annotations

import struct

import numpy as np

from ..core.constants import (
    FrameType,
    MAGIC,
    MAX_FRAME_SAMPLES,
    MAX_LPC_ORDER,
    MAX_TOC_ENTRIES,
    ResidualEncoding,
    TOC_ENTRY_SIZE,
)
from ..core.types import ChannelData, FloFile, Frame, Header, TocEntry


class FloFormatError(ValueError):
    """Raised on malformed container bytes."""


_HEADER_STRUCT = struct.Struct("<BBHIBBQB3xIQQQQQ")
assert _HEADER_STRUCT.size == 66


def read_header(data: bytes, offset: int = 0) -> Header:
    """Parse the 66-byte header that follows the magic."""
    if len(data) < offset + _HEADER_STRUCT.size:
        raise FloFormatError("Unexpected end of file")
    (
        version_major,
        version_minor,
        flags,
        sample_rate,
        channels,
        bit_depth,
        total_samples,
        compression_level,
        data_crc32,
        header_size,
        toc_size,
        data_size,
        extra_size,
        meta_size,
    ) = _HEADER_STRUCT.unpack_from(data, offset)
    return Header(
        version_major=version_major,
        version_minor=version_minor,
        flags=flags,
        sample_rate=sample_rate,
        channels=channels,
        bit_depth=bit_depth,
        total_samples=total_samples,
        compression_level=compression_level,
        data_crc32=data_crc32,
        header_size=header_size,
        toc_size=toc_size,
        data_size=data_size,
        extra_size=extra_size,
        meta_size=meta_size,
    )


def read_toc(data: bytes, offset: int, toc_size: int) -> list[TocEntry]:
    """Parse the TOC chunk: u32 count + 20-byte entries (reader.rs:76-99)."""
    if toc_size < 4:
        return []
    if len(data) < offset + 4:
        raise FloFormatError("Unexpected end of file")
    (num_entries,) = struct.unpack_from("<I", data, offset)
    if num_entries > MAX_TOC_ENTRIES:
        raise FloFormatError("Invalid TOC: too many entries")
    end = offset + 4 + num_entries * TOC_ENTRY_SIZE
    if len(data) < end:
        raise FloFormatError("Unexpected end of file")
    raw = np.frombuffer(data, dtype=np.uint8, count=num_entries * TOC_ENTRY_SIZE, offset=offset + 4)
    view = raw.reshape(num_entries, TOC_ENTRY_SIZE)
    frame_index = view[:, 0:4].copy().view("<u4")[:, 0]
    byte_offset = view[:, 4:12].copy().view("<u8")[:, 0]
    frame_size = view[:, 12:16].copy().view("<u4")[:, 0]
    timestamp_ms = view[:, 16:20].copy().view("<u4")[:, 0]
    return [
        TocEntry(int(frame_index[i]), int(byte_offset[i]), int(frame_size[i]), int(timestamp_ms[i]))
        for i in range(num_entries)
    ]


def _read_channel_data(
    data: bytes, pos: int, frame_type: FrameType, frame_samples: int, channel_end: int
) -> ChannelData:
    """Parse one channel payload (reader.rs:168-256)."""
    if frame_samples > MAX_FRAME_SAMPLES:
        raise FloFormatError("Invalid frame: too many samples")

    if frame_type == FrameType.SILENCE:
        return ChannelData.silence()

    if frame_type == FrameType.RAW:
        bytes_needed = frame_samples * 2
        available = max(channel_end - pos, 0)
        n = min(bytes_needed, available)
        return ChannelData.raw(data[pos : pos + n])

    if frame_type.is_transform:
        return ChannelData.transform(data[pos:channel_end])

    if frame_type.is_alpc:
        if pos >= len(data):
            raise FloFormatError("Unexpected end of file")
        order = data[pos]
        pos += 1
        if order > MAX_LPC_ORDER:
            raise FloFormatError("Invalid LPC order")
        coeffs = []
        for _ in range(order):
            if pos + 4 > channel_end:
                break
            coeffs.append(struct.unpack_from("<i", data, pos)[0])
            pos += 4
        if pos + 2 > len(data):
            raise FloFormatError("Unexpected end of file")
        shift_bits = data[pos]
        encoding = ResidualEncoding.from_byte(data[pos + 1])
        pos += 2
        rice_parameter = 0
        if encoding == ResidualEncoding.RICE:
            if pos >= len(data):
                raise FloFormatError("Unexpected end of file")
            rice_parameter = data[pos]
            pos += 1
        residuals = data[pos:channel_end] if channel_end > pos else b""
        return ChannelData(
            predictor_coeffs=coeffs,
            shift_bits=shift_bits,
            residual_encoding=encoding,
            rice_parameter=rice_parameter,
            residuals=residuals,
        )

    return ChannelData.silence()


def read_frame(data: bytes, pos: int, channels: int, frame_size: int) -> Frame:
    """Parse one frame at ``pos`` (reader.rs:130-166)."""
    frame_end = pos + frame_size
    if pos + 6 > len(data):
        raise FloFormatError("Unexpected end of file")
    frame_type_byte = data[pos]
    (frame_samples,) = struct.unpack_from("<I", data, pos + 1)
    flags = data[pos + 5]
    pos += 6

    ftype = FrameType.from_byte(frame_type_byte)
    frame = Frame(frame_type=frame_type_byte, frame_samples=frame_samples, flags=flags)

    n_channels = 1 if ftype.is_transform else channels
    for _ in range(n_channels):
        if pos + 4 > len(data):
            raise FloFormatError("Unexpected end of file")
        (ch_size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        ch_end = pos + ch_size
        if ch_end > len(data):
            raise FloFormatError("Unexpected end of file")
        frame.channels.append(_read_channel_data(data, pos, ftype, frame_samples, ch_end))
        pos = ch_end
    return frame


def read(data: bytes) -> FloFile:
    """Parse a complete flo file (reader.rs:16-52)."""
    if len(data) < 4 or data[:4] != MAGIC:
        raise FloFormatError("Invalid flo file: bad magic")

    header = read_header(data, 4)
    pos = 4 + 66
    toc = read_toc(data, pos, header.toc_size)
    pos += header.toc_size

    data_start = pos
    data_end = pos + header.data_size
    frames: list[Frame] = []
    for entry in toc:
        frame_start = data_start + entry.byte_offset
        if frame_start >= data_end:
            break
        frames.append(read_frame(data, frame_start, header.channels, entry.frame_size))

    pos = data_end + header.extra_size
    if pos + header.meta_size > len(data):
        raise FloFormatError("Unexpected end of file")
    metadata = data[pos : pos + header.meta_size]

    return FloFile(header=header, toc=toc, frames=frames, extra=b"", metadata=metadata)
