"""Audio file ingest/egress (the reflo/src/audio.rs equivalent).

The reference wraps Symphonia for MP3/WAV/FLAC/OGG/AAC input; this
environment has no audio-codec libraries, so ingest supports the formats
decodable with a hand-rolled parser: WAV (PCM u8/i16/i24/i32 and IEEE
float32/64) and AIFF (via the stdlib). Other formats raise a clear error.
WAV output matches the reference's 32-bit-float writer
(reflo/src/audio.rs:284-320) byte-for-byte.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np


@dataclass
class AudioMetadata:
    """Source-file tags carried into flo metadata (audio.rs:14-41)."""

    title: Optional[str] = None
    artist: Optional[str] = None
    album: Optional[str] = None
    album_artist: Optional[str] = None
    year: Optional[int] = None
    genre: Optional[str] = None
    track_number: Optional[int] = None
    bpm: Optional[float] = None
    comment: Optional[str] = None
    cover_art: Optional[Tuple[str, bytes]] = None
    source_format: Optional[str] = None
    original_filename: Optional[str] = None


class UnsupportedFormatError(ValueError):
    pass


def _parse_wav(data: bytes):
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise UnsupportedFormatError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    info_tags = {}
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        elif cid == b"LIST" and body[:4] == b"INFO":
            q = 4
            while q + 8 <= len(body):
                tag = body[q : q + 4]
                (tsz,) = struct.unpack_from("<I", body, q + 4)
                val = body[q + 8 : q + 8 + tsz].split(b"\x00")[0]
                try:
                    info_tags[tag.decode("ascii")] = val.decode("utf-8", "replace")
                except Exception:
                    pass
                q += 8 + tsz + (tsz & 1)
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise UnsupportedFormatError("WAV missing fmt/data chunk")

    audio_format, channels, sample_rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = struct.unpack_from("<H", fmt, 24)[0]

    if audio_format == 1:  # PCM
        if bits == 8:
            samples = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            samples = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(raw[: len(raw) - len(raw) % 3], np.uint8).reshape(-1, 3)
            v = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            samples = v.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            samples = np.frombuffer(raw, "<i4").astype(np.float32) / float(1 << 31)
        else:
            raise UnsupportedFormatError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            samples = np.frombuffer(raw, "<f4").astype(np.float32)
        elif bits == 64:
            samples = np.frombuffer(raw, "<f8").astype(np.float32)
        else:
            raise UnsupportedFormatError(f"unsupported float bit depth {bits}")
    else:
        raise UnsupportedFormatError(f"unsupported WAV format code {audio_format}")

    meta = AudioMetadata(
        title=info_tags.get("INAM"),
        artist=info_tags.get("IART"),
        album=info_tags.get("IPRD"),
        genre=info_tags.get("IGNR"),
        comment=info_tags.get("ICMT"),
        source_format="WAV",
    )
    return samples, int(sample_rate), int(channels), meta


def _parse_aiff(data: bytes):
    import aifc
    import io

    with aifc.open(io.BytesIO(data), "rb") as f:
        channels = f.getnchannels()
        rate = int(f.getframerate())
        width = f.getsampwidth()
        frames = f.readframes(f.getnframes())
    if width == 2:
        samples = np.frombuffer(frames, ">i2").astype(np.float32) / 32768.0
    elif width == 1:
        samples = np.frombuffer(frames, np.int8).astype(np.float32) / 128.0
    elif width == 4:
        samples = np.frombuffer(frames, ">i4").astype(np.float32) / float(1 << 31)
    else:
        raise UnsupportedFormatError(f"unsupported AIFF width {width}")
    return samples, rate, channels, AudioMetadata(source_format="AIFF")


def read_audio_from_bytes(data: bytes):
    """Decode an audio file to (interleaved f32, rate, channels, metadata)
    (audio.rs:57-166 equivalent)."""
    if data[:4] == b"RIFF":
        return _parse_wav(data)
    if data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
        return _parse_aiff(data)
    if data[:4] == b"FLO!":
        raise UnsupportedFormatError("input is already a flo file")
    if data[:4] == b"fLaC":
        raise UnsupportedFormatError("FLAC input requires an external decoder (not available)")
    if data[:3] == b"ID3" or data[:2] == b"\xff\xfb":
        raise UnsupportedFormatError("MP3 input requires an external decoder (not available)")
    if data[:4] == b"OggS":
        raise UnsupportedFormatError("OGG input requires an external decoder (not available)")
    raise UnsupportedFormatError("unrecognized audio format")


def get_audio_info(data: bytes):
    """(sample_rate, channels, duration_secs) of an input file
    (reflo/src/lib.rs:412-421)."""
    samples, rate, channels, _ = read_audio_from_bytes(data)
    n = len(samples) // max(channels, 1)
    return rate, channels, n / rate


def write_wav_to_bytes(samples: np.ndarray, sample_rate: int, channels: int) -> bytes:
    """32-bit float WAV, byte-identical layout to audio.rs:284-320."""
    samples = np.asarray(samples, dtype=np.float32).reshape(-1)
    data_size = samples.size * 4
    parts = [
        b"RIFF",
        struct.pack("<I", 36 + data_size),
        b"WAVE",
        b"fmt ",
        struct.pack("<IHHIIHH", 16, 3, channels, sample_rate,
                    sample_rate * channels * 4, channels * 4, 32),
        b"data",
        struct.pack("<I", data_size),
        samples.astype("<f4").tobytes(),
    ]
    return b"".join(parts)
