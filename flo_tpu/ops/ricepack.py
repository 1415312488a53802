"""Device-side Rice bitstream packing: entropy coding on the TPU.

Round-1 profiling showed the bulk encoder wire-bound: the device computed
residuals + exact Rice parameters, then shipped full-size i16 residual
tensors to the host for bit packing (rice.rs:94-159 wire format, vectorized
in core/rice_host.py). Compressed data is 1.4-3x smaller than those tensors,
so this module packs the bits ON DEVICE and the host downloads only
``ceil(total_bits/8)`` bytes + tiny per-lane offsets.

Output contract: for every lane, ``packed[off[l] : off[l]+nbytes[l]]`` is
byte-for-byte identical to ``rice_host.encode(residuals[l, :n[l]], k[l])``
(lane streams are byte-aligned, exactly like the container's standalone
per-channel residual blobs). Raw-PCM lanes (candidate-0 winners) are packed
in the SAME pass as fixed-width 16-bit little-endian codes, yielding the
writer's verbatim ``<i2`` payload — no separate download path for them.

Formulation (static shapes, gather-based — no data-dependent shapes):

1. Per-code bit length ``clen = min(u>>k, 255) + 1 + k`` (Rice) or 16 (raw),
   masked by ``i < nvalid``; within-lane exclusive cumsum plus byte-aligned
   per-lane offsets gives every code's global start bit.
2. A [NB] indicator marks code starts (unique-index scatter of ones);
   its cumsum labels every bit position with its covering code id.
3. Three gathers fetch the code's start/meta/value; the bit value is then
   closed-form (unary run, terminator, k remainder bits MSB-first — or the
   raw LE16 pattern), and bits fold 8-to-1 into bytes.

NB is the static worst case of 16 bits per sample: the raw baseline bound —
selection (ops/select.py) never picks a candidate larger than raw, and raw
lanes are exactly 16 bits/sample. Callers bound L*S so NB < 2^31 (the
encoder's pipeline chunking already keeps batches far below that).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

#: Worst-case packed bits per sample (raw baseline bound).
WORST_BITS_PER_SAMPLE = 16

#: Hard cap so every bit index fits int32.
MAX_BATCH_SAMPLES = (1 << 31) // WORST_BITS_PER_SAMPLE - 1


def _zigzag_u32(r):
    z = (r << 1) ^ (r >> 31)
    return jax.lax.bitcast_convert_type(z, jnp.uint32)


@partial(jax.jit, static_argnames=("bits_per_sample",))
def pack_lanes(residuals, k, nvalid, is_raw, bits_per_sample: int = WORST_BITS_PER_SAMPLE):
    """Pack every lane's residual stream into one byte-aligned buffer.

    Args:
      residuals: [L, S] int32 — Rice lanes: residual values; raw lanes: the
        verbatim samples (wrapped to i16 on the wire, Rust ``as i16``).
      k: [L] int32 Rice parameters (ignored for raw lanes).
      nvalid: [L] int32 valid samples per lane.
      is_raw: [L] bool — lane uses the fixed-width 16-bit LE raw format.
      bits_per_sample: static per-lane bound on MEAN encoded bits/sample.
        The default 16 is guaranteed for encoder winners (selection never
        keeps a candidate larger than the 2-byte/sample raw baseline, and raw
        lanes are exactly 16); arbitrary (residuals, k) pairs can exceed it
        (a capped-quotient code is up to 255+1+k bits) and silently truncate,
        so non-encoder callers must pass a sufficient bound (272 is always
        safe). Hosts can detect violation cheaply: sum(lane_bytes)*8 > NB.

    Returns (packed u8 [L*S*bits_per_sample/8], lane_bytes [L] i32,
    lane_off [L] i32).
    """
    L, S = residuals.shape
    NB = -(-L * S * bits_per_sample // 8) * 8  # static; callers keep < 2^31
    NCODES = L * S

    ku = k[:, None].astype(jnp.uint32)
    u_rice = _zigzag_u32(residuals)
    q = jnp.minimum(u_rice >> ku, jnp.uint32(255)).astype(jnp.int32)
    u_raw = jax.lax.bitcast_convert_type(residuals & 0xFFFF, jnp.uint32)
    u = jnp.where(is_raw[:, None], u_raw, u_rice)

    valid = jnp.arange(S, dtype=jnp.int32)[None, :] < nvalid[:, None]
    clen = jnp.where(is_raw[:, None], 16, q + 1 + k[:, None])
    clen = jnp.where(valid, clen, 0)

    lane_bits = jnp.sum(clen, axis=1)
    lane_bytes = (lane_bits + 7) >> 3
    lane_off = jnp.cumsum(lane_bytes) - lane_bytes  # exclusive, bytes

    within = jnp.cumsum(clen, axis=1) - clen
    starts = lane_off[:, None] * 8 + within  # [L, S] global bit starts

    # meta per code: q (8b) | k (4b) | raw flag (1b); q is 0..255, k 0..15.
    meta = (q << 5) | (k[:, None] << 1) | is_raw[:, None].astype(jnp.int32)

    starts_f = starts.reshape(-1)
    meta_f = meta.reshape(-1)
    u_f = u.reshape(-1)
    valid_f = valid.reshape(-1)

    # Compact the per-code tables to valid codes only (code_id below counts
    # valid codes): scatter each valid code to its rank.
    rank = jnp.cumsum(valid_f.astype(jnp.int32)) - 1
    dest = jnp.where(valid_f, rank, NCODES)  # invalid -> dropped
    compact = lambda a, dt: jnp.zeros((NCODES,), dt).at[dest].set(
        a, mode="drop", unique_indices=True
    )
    starts_c = compact(starts_f, jnp.int32)
    meta_c = compact(meta_f, jnp.int32)
    u_c = compact(u_f, jnp.uint32)

    # Code-start indicator -> covering code id per bit position.
    idx = jnp.where(valid_f, starts_f, NB)  # invalid -> dropped
    cnt = jnp.zeros((NB,), jnp.int8).at[idx].set(
        jnp.int8(1), mode="drop", unique_indices=True
    )
    code_id = jnp.cumsum(cnt, dtype=jnp.int32) - 1
    code_id = jnp.clip(code_id, 0, NCODES - 1)

    st = jnp.take(starts_c, code_id)
    mt = jnp.take(meta_c, code_id)
    uu = jnp.take(u_c, code_id)

    p = jnp.arange(NB, dtype=jnp.int32)
    off = p - st
    qq = mt >> 5
    kk = (mt >> 1) & 15
    rawf = (mt & 1) == 1

    # Rice: q unary '1's, '0' terminator, k remainder bits MSB-first.
    rice_shift = jnp.clip(kk + qq - off, 0, 31).astype(jnp.uint32)
    rice_bit = jnp.where(
        off < qq,
        1,
        jnp.where(
            (off > qq) & (off <= qq + kk),
            ((uu >> rice_shift) & jnp.uint32(1)).astype(jnp.int32),
            0,
        ),
    )
    # Raw LE16: byte 0 = low byte (MSB-first), byte 1 = high byte.
    raw_shift = jnp.clip(jnp.where(off < 8, 7 - off, 23 - off), 0, 31).astype(jnp.uint32)
    raw_bit = jnp.where(
        off < 16, ((uu >> raw_shift) & jnp.uint32(1)).astype(jnp.int32), 0
    )
    bit = jnp.where(rawf, raw_bit, rice_bit)
    bit = jnp.where(off >= 0, bit, 0)  # positions before the first code

    weights = (1 << (7 - jnp.arange(8, dtype=jnp.int32)))[None, :]
    packed = jnp.sum(bit.reshape(-1, 8) * weights, axis=1).astype(jnp.uint8)
    return packed, lane_bytes.astype(jnp.int32), lane_off.astype(jnp.int32)


#: Download-slice bucket (bytes): prefixes round up to a multiple of this so
#: the slice program recompiles at most ~dozens of times per process.
PREFIX_BUCKET = 8 << 20


@partial(jax.jit, static_argnames=("n",))
def _take_prefix(arr, n: int):
    return jax.lax.dynamic_slice_in_dim(arr, 0, n)


def fetch_prefix(arr, nbytes: int) -> np.ndarray:
    """Download the first nbytes of a device byte buffer (bucketed slice)."""
    if nbytes <= 0:
        return np.zeros(0, np.uint8)
    cap = arr.shape[0]
    n = min(-(-nbytes // PREFIX_BUCKET) * PREFIX_BUCKET, cap)
    return np.asarray(_take_prefix(arr, n))[:nbytes]
