"""Lossy (MDCT transform) decoder — batched device path.

Behavioral model: libflo/src/lossy/decoder.rs + lib.rs:325-352. All frames'
coefficients are dequantized and IMDCT'd in one jitted call; the reference's
stateful per-channel overlap buffer becomes a stateless shifted add over the
block axis, and the pre-roll frame's output is dropped (lib.rs:341-345).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..container import reader
from ..core.types import FloFile
from ..ops import mdct, psycho
from .sparse import deserialize_sparse

_BLOCK_SIZES = {0: 2048, 1: 256, 2: 2048, 3: 2048}  # Long/Short/Start/Stop


def deserialize_frame(data: bytes, expect_n2: int | None = None):
    """Parse one transform blob -> (n, sf [C, 25] f32, q [C, n/2] i16) or
    None on truncation (decoder.rs:61-131)."""
    if len(data) < 2:
        return None
    bs = data[0]
    if bs not in _BLOCK_SIZES:
        return None
    n = _BLOCK_SIZES[bs]
    n2 = n // 2
    C = data[1]
    pos = 2
    sf = np.zeros((C, psycho.NUM_BARK_BANDS), dtype=np.float32)
    for c in range(C):
        need = 2 * psycho.NUM_BARK_BANDS
        if pos + need > len(data):
            return None
        raw = np.frombuffer(data, dtype="<u2", count=psycho.NUM_BARK_BANDS, offset=pos)
        pos += need
        sf[c] = np.where(raw > 0, np.exp2((raw.astype(np.float32) - 32768.0) / 256.0), 0.0)
    q = np.zeros((C, n2), dtype=np.int16)
    for c in range(C):
        if pos + 4 > len(data):
            return None
        ln = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if pos + ln > len(data):
            return None
        q[c] = deserialize_sparse(data[pos : pos + ln], n2)
        pos += ln
    return n, sf, q


@partial(jax.jit, static_argnames=("sample_rate", "n"))
def _decode_blocks_f16(q, sf, sample_rate: int, n: int):
    """Transport variant: float16 downloads (quantization ~1e-4, far below
    codec noise at every preset) for bandwidth-limited hosts."""
    return _decode_blocks(q, sf, sample_rate, n).astype(jnp.float16)


@partial(jax.jit, static_argnames=("sample_rate", "n"))
def _decode_blocks(q, sf, sample_rate: int, n: int):
    """q [..., T, C, n2] i16, sf [..., T, C, 25] -> segments [..., T, n2, C].

    Dequantize (decoder.rs:38-45: c = q / sf[band] when sf > 0), batched
    IMDCT, stateless overlap-add over T. Leading axes (e.g. a file batch)
    broadcast through.
    """
    _, band, _, _, _ = psycho.model_tables(sample_rate, n)
    sf_bin = sf[..., band]  # [..., T, C, n2]
    coeffs = jnp.where(sf_bin > 0, q.astype(jnp.float32) / jnp.maximum(sf_bin, 1e-30), 0.0)
    recon = mdct.inverse(coeffs, n, "vorbis")  # [..., T, C, n]
    segs = mdct.overlap_add(jnp.moveaxis(recon, -3, -2))  # [..., C, T, n2]
    return jnp.moveaxis(segs, -3, -1)  # [..., T, n2, C]


def decode_file(flo: FloFile) -> np.ndarray:
    """Decode a parsed lossy file to interleaved f32 (pre-roll dropped)."""
    return decode_many([flo])[0]


def decode(data: bytes) -> np.ndarray:
    return decode_file(reader.read(data))


def decode_many(flos: list[FloFile], transport_dtype=np.float32) -> list[np.ndarray]:
    """Bulk decode: all files' blocks in one device call (T padded to the
    batch max; every file must share sample_rate/block size/channels).

    transport_dtype=np.float16 halves the device->host download at ~1e-4
    sample error (well inside the lossy tolerance); output is still f32.
    """
    parsed_files = []
    for flo in flos:
        parsed = []
        for f in flo.frames:
            if not f.channels:
                continue
            p = deserialize_frame(f.channels[0].residuals)
            if p is None:
                raise ValueError("Failed to deserialize transform frame")
            parsed.append(p)
        parsed_files.append(parsed)
    if not parsed_files or all(not p for p in parsed_files):
        return [np.zeros(0, dtype=np.float32) for _ in flos]
    n = next(p[0][0] for p in parsed_files if p)
    C = next(p[0][2].shape[0] for p in parsed_files if p)
    rate = flos[0].header.sample_rate
    t_max = max(len(p) for p in parsed_files)
    N = len(parsed_files)
    q = np.zeros((N, t_max, C, n // 2), dtype=np.int16)
    sf = np.zeros((N, t_max, C, psycho.NUM_BARK_BANDS), dtype=np.float32)
    for i, parsed in enumerate(parsed_files):
        for t, (nn, s, qq) in enumerate(parsed):
            if nn != n or qq.shape[0] != C or flos[i].header.sample_rate != rate:
                raise ValueError("decode_many requires homogeneous files")
            sf[i, t] = s
            q[i, t] = qq
    fn = _decode_blocks_f16 if transport_dtype == np.float16 else _decode_blocks
    segs = np.asarray(fn(jnp.asarray(q), jnp.asarray(sf), int(rate), n)).astype(np.float32)
    return [
        segs[i, 1 : len(parsed_files[i])].reshape(-1) for i in range(N)
    ]  # drop each file's pre-roll frame
