"""Rice entropy coder — vectorized host finalizer.

Wire format (libflo/src/core/rice.rs:94-159):

  zigzag:   u = (s << 1) ^ (s >> 31)            (i32 -> u32)
  code:     min(u >> k, 255) unary '1' bits, one '0' terminator,
            then the low k bits of u, MSB first.
  bit IO:   MSB-first within bytes; final partial byte zero-padded.
  decode:   reads exactly target_len codes; once the buffer is exhausted the
            remaining residuals are zero (the bit reader yields 0s).

The reference packs/unpacks one bit at a time in a loop. Here both directions
are vectorized numpy:

* ``encode``: per-sample bit lengths -> exclusive prefix sum -> scatter the
  unary runs via a difference-array cumsum and the remainder bits via a
  [n, k] position matrix -> one ``np.packbits``.
* ``decode``: the positions of '0' bits form a sorted array Z; each code
  consumes exactly one terminator zero plus k following bits, so the
  terminator indices satisfy t_{i+1} = g(t_i) with
  g(t) = searchsorted(Z, Z[t] + 1 + k). All terminators are materialized with
  binary lifting (pointer doubling) in O(n log n) vector ops — no Python
  per-sample loop.

Parameter estimation matches rice.rs:29-69 bit-for-bit (see
``estimate_parameter``).
"""

from __future__ import annotations

import numpy as np


def zigzag(residuals: np.ndarray) -> np.ndarray:
    r = residuals.astype(np.int32)
    return ((r.astype(np.int64) << 1) ^ (r.astype(np.int64) >> 31)).astype(np.uint32) & np.uint32(
        0xFFFFFFFF
    )


def unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint32)
    return ((u >> 1).astype(np.int32)) ^ (-(u & 1).astype(np.int32))


def estimate_parameter(residuals: np.ndarray) -> int:
    """Rice k estimate; exact mirror of estimate_rice_parameter_i32
    (rice.rs:29-69): k = clamp(max(min_k, mean_k), 0, 15) where min_k keeps
    every quotient <= 255 and mean_k = bit-length of mean(|r|)."""
    r = np.asarray(residuals, dtype=np.int64)
    if r.size == 0:
        return 4
    abs_r = np.abs(r).astype(np.uint64)  # i32::MIN -> 2^31, like unsigned_abs
    max_abs = int(abs_r.max())
    if max_abs == 0:
        return 0
    max_unsigned = 2 * max_abs
    if max_unsigned > 255:
        min_k = max(max_unsigned.bit_length() - 8, 0)
    else:
        min_k = 0
    mean = int(abs_r.sum()) // r.size
    mean_k = mean.bit_length() if mean > 0 else 0
    return int(np.clip(max(min_k, mean_k), 0, 15))


def code_bit_lengths(u: np.ndarray, k: int) -> np.ndarray:
    """Per-sample encoded bit length: min(q,255) + 1 + k."""
    q = (u >> np.uint32(k)).astype(np.uint32)
    return np.minimum(q, 255).astype(np.int64) + 1 + k


def encode(residuals: np.ndarray, k: int) -> bytes:
    """Rice-encode one residual stream. Equivalent to rice::encode_i32."""
    u = zigzag(np.asarray(residuals))
    n = u.size
    if n == 0:
        return b""
    k = int(k)
    q = np.minimum(u >> np.uint32(k), 255).astype(np.int64)
    rem = (u & np.uint32((1 << k) - 1)).astype(np.uint32) if k > 0 else None

    lengths = q + 1 + k
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    np.cumsum(lengths[:-1], out=starts[1:])
    total_bits = int(starts[-1] + lengths[-1])

    nbits = (total_bits + 7) & ~7
    # Unary runs via difference array: +1 at run start, -1 at run end.
    delta = np.bincount(starts, minlength=nbits + 1).astype(np.int32)
    delta -= np.bincount(starts + q, minlength=nbits + 1)
    bits = np.cumsum(delta[:-1]).astype(np.uint8)

    if k > 0:
        shifts = np.arange(k - 1, -1, -1, dtype=np.uint32)
        pos = (starts + q + 1)[:, None] + np.arange(k, dtype=np.int64)[None, :]
        vals = ((rem[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
        bits[pos.ravel()] = vals.ravel()

    return np.packbits(bits).tobytes()


def _terminator_indices(Z: np.ndarray, step: int, n: int, t0: int) -> np.ndarray:
    """All n terminator-zero indices via binary lifting of
    g(t) = searchsorted(Z, Z[t] + step)."""
    T = np.empty(n, dtype=np.int64)
    T[0] = t0
    filled = 1
    # Current jump table: g_filled applied to every index.
    g = np.searchsorted(Z, Z + step)
    g = np.minimum(g, len(Z) - 1)
    while filled < n:
        take = min(filled, n - filled)
        T[filled : filled + take] = g[T[:take]]
        filled += take
        if filled < n:
            g = np.minimum(g[g], len(Z) - 1)
    return T


def decode(encoded: bytes, k: int, target_len: int) -> np.ndarray:
    """Rice-decode ``target_len`` residuals. Equivalent to rice::decode_i32
    for well-formed streams (quotients <= 255), including the zero-fill
    behavior when the buffer runs out."""
    k = int(k)
    n = int(target_len)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    buf = np.frombuffer(encoded, dtype=np.uint8)
    total_bits = buf.size * 8
    if total_bits == 0:
        return np.zeros(n, dtype=np.int32)

    bits = np.unpackbits(buf)
    # Sentinel zeros: reading past the end yields 0 bits (BitReader behavior).
    pad = n * (1 + k) + 8
    bits_ext = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
    Z = np.flatnonzero(bits_ext == 0).astype(np.int64)

    T = _terminator_indices(Z, 1 + k, n, t0=0)
    term_pos = Z[T]

    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = term_pos[:-1] + 1 + k

    q = (term_pos - starts).astype(np.uint32)
    if k > 0:
        pos = term_pos[:, None] + 1 + np.arange(k, dtype=np.int64)[None, :]
        rem_bits = bits_ext[pos]
        weights = (1 << np.arange(k - 1, -1, -1, dtype=np.uint32)).astype(np.uint32)
        rem = (rem_bits.astype(np.uint32) * weights[None, :]).sum(axis=1, dtype=np.uint32)
    else:
        rem = np.zeros(n, dtype=np.uint32)

    u = (q << np.uint32(k)) | rem
    out = unzigzag(u)
    # Samples whose code starts at/after the true end decode to 0.
    out[starts >= total_bits] = 0
    return out


def encode_batch(residual_rows: np.ndarray, ks: np.ndarray, lengths: np.ndarray) -> list[bytes]:
    """Encode many streams: row i uses residual_rows[i, :lengths[i]] with
    parameter ks[i]. Returns the list of per-stream byte strings.

    Dispatches to the C++ OpenMP packer (flo_tpu/native) when available;
    otherwise fully vectorized numpy: one global bit buffer with byte-aligned
    stream boundaries, a single packbits, then slicing.
    """
    from .. import native

    out = native.rice_encode_batch(residual_rows, ks, lengths)
    if out is not None:
        return out
    n_streams = residual_rows.shape[0]
    if n_streams == 0:
        return []
    ks = np.asarray(ks, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)

    max_len = int(lengths.max(initial=0))
    rows = residual_rows[:, :max_len]
    u = zigzag(rows)
    valid = np.arange(max_len)[None, :] < lengths[:, None]

    q = np.minimum(u >> ks[:, None].astype(np.uint32), 255).astype(np.int64)
    code_len = np.where(valid, q + 1 + ks[:, None], 0)
    stream_bits = code_len.sum(axis=1)
    stream_bytes = (stream_bits + 7) // 8

    byte_off = np.zeros(n_streams, dtype=np.int64)
    np.cumsum(stream_bytes[:-1], out=byte_off[1:])
    total_bytes = int(byte_off[-1] + stream_bytes[-1])
    if total_bytes == 0:
        return [b""] * n_streams

    # Per-code global bit starts.
    within = np.cumsum(code_len, axis=1) - code_len
    starts = byte_off[:, None] * 8 + within

    nbits = total_bytes * 8
    vs, vq, vstart = (a[valid] for a in (np.broadcast_to(ks[:, None], q.shape), q, starts))
    # Unary runs via difference array (bincount is far faster than add.at).
    delta = np.bincount(vstart, minlength=nbits + 1).astype(np.int32)
    delta -= np.bincount(vstart + vq, minlength=nbits + 1)
    bits = np.cumsum(delta[:-1]).astype(np.uint8)

    kmax = int(ks.max(initial=0))
    if kmax > 0:
        rem = u & ((np.uint32(1) << ks[:, None].astype(np.uint32)) - np.uint32(1))
        vrem = rem[valid]
        # For stream-specific k, bit j (0-based from MSB of the k-bit field)
        # lives at start+q+1+j with weight 2^(k-1-j).
        for j in range(kmax):
            mask = vs > j
            if not mask.any():
                continue
            shift = (vs[mask] - 1 - j).astype(np.uint32)
            bitvals = ((vrem[mask] >> shift) & 1).astype(np.uint8)
            bits[(vstart[mask] + vq[mask] + 1 + j)] = bitvals

    packed = np.packbits(bits).tobytes()
    return [
        packed[int(byte_off[i]) : int(byte_off[i] + stream_bytes[i])] for i in range(n_streams)
    ]


def decode_batch(
    blobs: list[bytes], ks: np.ndarray, lengths: np.ndarray, out_width: int
) -> np.ndarray:
    """Decode many streams into a padded [n_streams, out_width] i32 array.

    Dispatches to the C++ OpenMP unpacker (flo_tpu/native) when available."""
    from .. import native

    out = native.rice_decode_batch(blobs, ks, lengths, out_width)
    if out is not None:
        return out
    n = len(blobs)
    out = np.zeros((n, out_width), dtype=np.int32)
    for i in range(n):
        L = int(lengths[i])
        if L > 0:
            out[i, :L] = decode(blobs[i], int(ks[i]), L)
    return out
