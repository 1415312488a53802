"""Rice/delta transport for decoded PCM (ALTERNATE PATH — see ops/blockpack).

STATUS: kept as a tested alternate wire codec; the production bulk pipelines
moved to ops/blockpack after profiling on real hardware showed this module's
host side too numpy-heavy for the single-core host (the Rice candidate
search cost more CPU than the wire bytes it saved) and its per-lane escape
hatches firing on every lane of real content (one transient per 1 s frame
exceeds any fixed device quotient window).

The axon TPU link is brutally asymmetric (measured ~400 MB/s up with
transparent compression, ~30 MB/s down and prone to stalls), so the decode
pipelines' OUTPUT tensors — raw PCM, the two largest downloads left after
the encode side went entropy-packed — dominate wall time. This module ships
them entropy-coded: the device picks, per lane, the smallest of
{raw16, order-1 delta + Rice, order-2 delta + Rice} (exact sizes, exact k —
the same primitives as the codec's own selection), packs the winner with
ops/ricepack, and the host inverts with the C++/numpy Rice decoder plus one
or two int32 cumsums (fixed-predictor reconstruction IS nested prefix sums).

Everything is bit-exact end to end: deltas/cumsums are two's-complement
int32 (identical wrap semantics in jnp and numpy), Rice is the codec's own
exact coder, and raw lanes are verbatim LE16. Lanes whose values exceed
i16 AND have no 32-bit-safe Rice candidate (possible only for corrupt
streams) are flagged so callers fall back to a direct row fetch.

This is transport, not format: the wire layout here never leaves the
process. It exists because on this hardware the cheapest byte is the one
never downloaded; on hosts with fast interconnects callers can skip it.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import ricepack, riceunpack
from .select import candidate_size
from ..core import rice_host

#: mode values (per lane)
RAW16, FIXED1, FIXED2 = 0, 1, 2


def _delta(rows):
    return rows - jnp.pad(rows, ((0, 0), (1, 0)))[:, :-1]


def pack_pcm(rows, nvalid):
    """rows [L, S] int32 (+ per-lane valid counts) -> packed transport.

    Returns (packed u8, lane_bytes [L], lane_off [L], mode [L], k [L],
    overflow [L] bool). Traced — call inside a jit. ``overflow`` lanes
    (non-i16 values with no 32-bit-safe Rice candidate) are NOT represented
    in the stream; callers must fetch their rows directly.
    """
    L, S = rows.shape
    valid = jnp.arange(S, dtype=jnp.int32)[None, :] < nvalid[:, None]
    rows = jnp.where(valid, rows, 0)

    d1 = _delta(rows)
    d2 = _delta(d1)

    def rice_cand(r):
        max_abs, k, size = candidate_size(r, nvalid)
        u = jax.lax.bitcast_convert_type((r << 1) ^ (r >> 31), jnp.uint32)
        q = jnp.minimum(u >> k[:, None].astype(jnp.uint32), jnp.uint32(255))
        qmax = jnp.max(jnp.where(valid, q.astype(jnp.int32), 0), axis=1)
        ok = (qmax + 1 + k) <= 32
        return k, size, ok

    k1, size1, ok1 = rice_cand(d1)
    k2, size2, ok2 = rice_cand(d2)
    size_raw = 2 * nvalid
    fits16 = (jnp.min(rows, axis=1) >= -32768) & (jnp.max(rows, axis=1) <= 32767)

    big = jnp.int32(1 << 30)
    s0 = jnp.where(fits16, size_raw, big)
    s1 = jnp.where(ok1, size1, big)
    s2 = jnp.where(ok2, size2, big)
    mode = jnp.where((s2 < s1) & (s2 < s0), FIXED2, jnp.where(s1 < s0, FIXED1, RAW16))
    overflow = ~fits16 & ~ok1 & ~ok2
    mode = jnp.where(overflow, RAW16, mode)

    res = jnp.where(
        (mode == FIXED2)[:, None], d2, jnp.where((mode == FIXED1)[:, None], d1, rows)
    )
    k = jnp.where(mode == FIXED2, k2, jnp.where(mode == FIXED1, k1, 0))
    packed, lane_bytes, lane_off, bad = ricepack.pack_lanes(
        res, k, nvalid, mode == RAW16
    )
    # bad is unreachable: rice candidates were pre-checked <= 32-bit codes
    # and raw never flags; fold it into overflow defensively anyway.
    return packed, lane_bytes, lane_off, mode, k, overflow | bad


def unpack_pcm(
    packed: np.ndarray,
    lane_bytes: np.ndarray,
    lane_off: np.ndarray,
    mode: np.ndarray,
    k: np.ndarray,
    nvalid: np.ndarray,
    S: int,
) -> np.ndarray:
    """Host-side inverse of pack_pcm -> [L, S] int32 (zeros past nvalid)."""
    from .. import native

    L = len(lane_bytes)
    out = np.zeros((L, S), np.int32)
    if L == 0:
        return out
    packed = np.asarray(packed, dtype=np.uint8)
    rice_rows = np.flatnonzero(mode != RAW16)
    if len(rice_rows):
        dec = native.rice_decode_concat(
            packed, lane_off[rice_rows], lane_bytes[rice_rows],
            k[rice_rows], nvalid[rice_rows], S,
        )
        if dec is None:
            pb = packed.tobytes()
            blobs = [pb[lane_off[l] : lane_off[l] + lane_bytes[l]] for l in rice_rows]
            dec = rice_host.decode_batch(blobs, k[rice_rows], nvalid[rice_rows], S)
        # Fixed-predictor reconstruction = nested int32 prefix sums (wraps
        # exactly like the device's two's-complement deltas).
        once = np.cumsum(dec, axis=1, dtype=np.int32)
        is2 = (mode[rice_rows] == FIXED2)[:, None]
        rec = np.where(is2, np.cumsum(once, axis=1, dtype=np.int32), once)
        valid = np.arange(S)[None, :] < nvalid[rice_rows, None]
        out[rice_rows] = np.where(valid, rec, 0)
    # Raw LE16 lanes, vectorized per distinct length (byte gather + i16 view).
    raw_rows = np.flatnonzero(mode == RAW16)
    if len(raw_rows):
        lens = np.asarray(nvalid)[raw_rows]
        for n in np.unique(lens):
            if n == 0:
                continue
            grp = raw_rows[lens == n]
            idx = lane_off[grp][:, None] + np.arange(2 * n, dtype=np.int64)[None, :]
            rows8 = packed[idx]  # fresh contiguous [G, 2n] uint8
            out[grp, :n] = rows8.view("<i2").astype(np.int32)
    return out


# ---------------------------------------------------------------------------
# Upload direction: the same lane format, packed on the HOST (numpy + the
# C++/OpenMP batch packer) and unpacked ON DEVICE (ops/riceunpack + cumsums).
# Used by the bulk ENCODE pipelines so PCM inputs cross the host->device wire
# entropy-coded instead of as full i16/f16 tensors, and by the bulk lossless
# DECODE path's residual upload.
# ---------------------------------------------------------------------------


def _np_zigzag_u32(r: np.ndarray) -> np.ndarray:
    return (((r.astype(np.int32) << 1) ^ (r.astype(np.int32) >> 31))
            .view(np.uint32))


def _bit_length_i64(x: np.ndarray) -> np.ndarray:
    return np.frompyfunc(int.bit_length, 1, 1)(x.astype(object)).astype(np.int64)


def _np_rice_k(a_max: np.ndarray, a_mean: np.ndarray) -> np.ndarray:
    """Vectorized Rice parameter (rice.rs:29-69 semantics) from per-lane
    max(|r|) and mean(|r|) (int64, exact)."""
    max_u2 = 2 * a_max
    min_k = np.where(max_u2 > 255, np.maximum(_bit_length_i64(max_u2) - 8, 0), 0)
    k = np.clip(np.maximum(min_k, _bit_length_i64(a_mean)), 0, 15)
    return np.where(a_max == 0, 0, k).astype(np.int32)


def pack_pcm_host(rows: np.ndarray, nvalid: np.ndarray):
    """Host-side mirror of pack_pcm, for UPLOADS.

    rows: [L, S] int32 (values must fit i16 — PCM lanes); nvalid: [L].
    Per lane picks the smallest of {raw LE16, order-1 delta + Rice,
    order-2 delta + Rice}, constraining Rice candidates to device-decodable
    quotients (q <= riceunpack.MAX_Q), and packs everything byte-aligned
    into one buffer (with riceunpack.PAD_BYTES of trailing zeros).

    Returns (buf u8 [B], bit_start i32 [L], k i32 [L], mode u8 [L]).
    The device inverse is unpack_pcm_device.
    """
    from .. import native

    rows = np.ascontiguousarray(rows, dtype=np.int32)
    L, S = rows.shape
    nvalid = np.asarray(nvalid, dtype=np.int64)
    valid = np.arange(S)[None, :] < nvalid[:, None]
    rows = np.where(valid, rows, 0)

    d1 = rows.copy()
    d1[:, 1:] -= rows[:, :-1]
    d2 = d1.copy()
    d2[:, 1:] -= d1[:, :-1]

    n = np.maximum(nvalid, 1)

    def rice_cand(r):
        a = np.abs(r.astype(np.int64))
        a_max = a.max(axis=1)
        a_mean = a.sum(axis=1) // n
        k = _np_rice_k(a_max, a_mean)
        u = _np_zigzag_u32(r)
        q = (u >> k[:, None].astype(np.uint32)).astype(np.int64)
        qc = np.minimum(np.where(valid, q, 0), 255)
        bits = qc.sum(axis=1) + nvalid * (1 + k)
        ok = np.where(valid, q, 0).max(axis=1) <= riceunpack.MAX_Q
        return k, (bits + 7) >> 3, ok

    k1, size1, ok1 = rice_cand(d1)
    k2, size2, ok2 = rice_cand(d2)
    size_raw = 2 * nvalid
    fits16 = (rows.min(axis=1) >= -32768) & (rows.max(axis=1) <= 32767)
    if not (fits16 | ok1 | ok2).all():
        raise ValueError("pack_pcm_host: lane has non-i16 values and no "
                         "device-decodable Rice candidate")

    big = np.int64(1) << 60
    s0 = np.where(fits16, size_raw, big)
    s1 = np.where(ok1, size1, big)
    s2 = np.where(ok2, size2, big)
    mode = np.where((s2 < s1) & (s2 < s0), FIXED2,
                    np.where(s1 < s0, FIXED1, RAW16)).astype(np.uint8)

    res = np.where((mode == FIXED2)[:, None], d2,
                   np.where((mode == FIXED1)[:, None], d1, rows))
    k = np.where(mode == FIXED2, k2, np.where(mode == FIXED1, k1, 0)).astype(np.int32)
    sizes = np.where(mode == RAW16, size_raw,
                     np.where(mode == FIXED2, size2, size1)).astype(np.int64)

    offsets = np.zeros(L, dtype=np.int64)
    np.cumsum(sizes[:-1], out=offsets[1:])
    total = int(offsets[-1] + sizes[-1]) if L else 0
    buf = np.zeros(total + riceunpack.PAD_BYTES, dtype=np.uint8)

    rice_rows = np.flatnonzero(mode != RAW16)
    if len(rice_rows):
        ok = native.rice_encode_into(
            res[rice_rows], k[rice_rows], nvalid[rice_rows], offsets[rice_rows], buf
        )
        if not ok:
            blobs = rice_host.encode_batch(
                res[rice_rows], k[rice_rows], nvalid[rice_rows]
            )
            for off, blob in zip(offsets[rice_rows], blobs):
                buf[off : off + len(blob)] = np.frombuffer(blob, np.uint8)
    raw_rows = np.flatnonzero(mode == RAW16)
    for l in raw_rows:
        nv = int(nvalid[l])
        if nv:
            buf[offsets[l] : offsets[l] + 2 * nv] = (
                rows[l, :nv].astype("<i2").view(np.uint8)
            )

    return buf, (offsets * 8).astype(np.int32), k, mode


def unpack_pcm_device(buf, bit_start, k, mode, nvalid, S: int):
    """Device-side inverse of pack_pcm_host -> [L, S] int32 (zeros past
    nvalid). Traced — call inside a jit. Fixed-predictor reconstruction is
    nested int32 prefix sums (exact two's-complement wrap, matching the
    host's deltas)."""
    rows, _, _ = riceunpack.unpack_lanes(
        buf, bit_start, k, nvalid, S, mode == RAW16
    )
    c1 = jnp.cumsum(rows, axis=1, dtype=jnp.int32)
    c2 = jnp.cumsum(c1, axis=1, dtype=jnp.int32)
    rec = jnp.where((mode == FIXED2)[:, None], c2,
                    jnp.where((mode == FIXED1)[:, None], c1, rows))
    valid = jnp.arange(S, dtype=jnp.int32)[None, :] < nvalid[:, None]
    return jnp.where(valid, rec, 0)
