"""Device-side Rice bitstream packing: entropy coding on the TPU.

Round-1 profiling showed the bulk encoder wire-bound: the device computed
residuals + exact Rice parameters, then shipped full-size i16 residual
tensors to the host for bit packing (rice.rs:94-159 wire format, vectorized
in core/rice_host.py). Compressed data is 1.4-3x smaller than those tensors,
so this module packs the bits ON DEVICE and the host downloads only
``ceil(total_bits/8)`` bytes + tiny per-lane offsets.

Output contract: for every non-flagged lane, ``packed[off[l]:off[l]+n[l]]``
is byte-for-byte identical to ``rice_host.encode(residuals[l, :n[l]], k[l])``.
Raw-PCM lanes (candidate-0 winners) are packed in the SAME pass as
fixed-width 16-bit little-endian codes, yielding the writer's verbatim
``<i2`` payload — no separate download path for them.

TPU-shaped formulation. Indexed ops (gather/scatter) cost ~8 ns/element on
TPU regardless of array size — far above bandwidth — so the design touches
indices only per-CODE (two scatters), never per-bit:

1. Elementwise per code: bit length ``clen`` and the code's full bit
   PATTERN, MSB-aligned in one u32 (unary ones, terminator, remainder — or
   the raw LE16 pattern). Codes never span two patterns because lanes with
   any >32-bit code are flagged for exact host re-packing (below).
2. Within-lane exclusive cumsum of ``clen`` + WORD-aligned per-lane offsets
   gives every code's global start bit. Starts are non-decreasing across
   the whole batch in flat order.
3. Per-code DELTAS (value minus previous code's value, telescoping across
   the full flat order; invalid codes carry value 0) are scatter-ADDed at
   the start positions; a cumsum over the bit domain then reconstructs, at
   every bit position p, the start and pattern of the covering code — so
   the bit value is ``(pattern >> (31 - (p - start))) & 1``, elementwise.
   Duplicate start positions (zero-length tails, lanes abutting on a word
   boundary) are correct by telescoping.
4. Bits fold 8->1 into bytes via strided slices (no [N, 8] reshape: a minor
   axis of 8 would be tile-padded 16x on TPU and OOM).

Codes longer than 32 bits (quotient + 1 + k > 32) are format-legal and
COMMON on real content — one transient per 1 s frame is enough (rice.rs
caps the unary run at 255, so codes reach 271 bits). The spread writes such
a code's first 32 bits; its tail bits land as zeros and neighbours stay
intact, so a compacted patch pass (jnp.nonzero with a static cap, then
<= 31 byte-wise scatter-ADDs per long code) fills the tails additively.
Only if a chunk somehow exceeds ``MAX_LONG_CODES`` long codes (adversarial
input) are the affected lanes reported in ``bad`` for exact host re-packing
(core/rice_host.encode). Word-aligned lane offsets guarantee a bad lane
never corrupts a neighbour; selection's exact per-lane byte size already
accounts for capped quotients, so the buffer layout stands regardless.

The bit-domain buffer is the static worst case of 16 bits per sample (the
raw baseline bound: selection never keeps a candidate larger than raw) plus
one alignment word per lane. Callers bound L*S so bit indices fit int32
(the encoder's pipeline chunking keeps batches far below that).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

#: Worst-case packed bits per sample (raw baseline bound).
WORST_BITS_PER_SAMPLE = 16

#: Static cap on >32-bit codes per pack call (compacted tail-patch pass).
MAX_LONG_CODES = 8192

#: Hard cap so every bit index fits int32 (with word-align slack).
MAX_BATCH_SAMPLES = (1 << 30) // WORST_BITS_PER_SAMPLE - 1


def _zigzag_u32(r):
    z = (r << 1) ^ (r >> 31)
    return jax.lax.bitcast_convert_type(z, jnp.uint32)


@jax.jit
def pack_lanes(residuals, k, nvalid, is_raw):
    """Pack every lane's residual stream into one byte-aligned buffer.

    Args:
      residuals: [L, S] int32 — Rice lanes: residual values; raw lanes: the
        verbatim samples (wrapped to i16 on the wire, Rust ``as i16``).
      k: [L] int32 Rice parameters (ignored for raw lanes).
      nvalid: [L] int32 valid samples per lane.
      is_raw: [L] bool — lane uses the fixed-width 16-bit LE raw format.

    Returns (packed u8 [NBYTES], lane_bytes [L] i32, lane_off [L] i32,
    bad [L] bool — lanes containing a >32-bit code, to be re-packed on the
    host). lane_off is WORD-aligned; lane_bytes is the exact stream size.
    """
    L, S = residuals.shape
    NW = L * (S * WORST_BITS_PER_SAMPLE // 32 + 1)  # words, static
    NW = -(-NW // 32) * 32  # NB multiple of 1024 for the 2D byte fold
    NB = NW * 32
    kcol = k[:, None]
    ku = kcol.astype(jnp.uint32)

    u_rice = _zigzag_u32(residuals)
    q = jnp.minimum(u_rice >> ku, jnp.uint32(255)).astype(jnp.int32)
    u_raw = jax.lax.bitcast_convert_type(residuals & 0xFFFF, jnp.uint32)

    valid = jnp.arange(S, dtype=jnp.int32)[None, :] < nvalid[:, None]
    clen = jnp.where(is_raw[:, None], 16, q + 1 + kcol)
    clen = jnp.where(valid, clen, 0)
    is_long = valid & ~is_raw[:, None] & (clen > 32)
    n_long = jnp.sum(is_long)
    # Lanes are only unreliable if the compacted patch pass overflowed.
    bad = jnp.any(is_long, axis=1) & (n_long > MAX_LONG_CODES)

    # Per-code pattern, MSB-aligned: q ones, a zero, k remainder bits — or
    # the raw LE16 bit pattern (low byte first, MSB-first within bytes).
    # Long codes emit their FIRST 32 bits here; tails are patched below.
    q32 = jnp.minimum(q, 31).astype(jnp.uint32)
    ones = jnp.where(q >= 32, jnp.uint32(0xFFFFFFFF), ~(jnp.uint32(0xFFFFFFFF) >> q32))
    rem = jnp.where(ku > 0, u_rice << (jnp.uint32(32) - ku), jnp.uint32(0))
    # The remainder only reaches the first word when it starts before bit 32
    # (q + terminator < 32); for q >= 31 the first word is ones + terminator.
    pat_rice = ones | jnp.where(q < 31, rem >> jnp.minimum(q32 + 1, 31), jnp.uint32(0))
    pat_raw = ((u_raw & jnp.uint32(0x00FF)) << 24) | ((u_raw & jnp.uint32(0xFF00)) << 8)
    pattern = jnp.where(is_raw[:, None], pat_raw, pat_rice)
    pattern = jnp.where(valid, pattern, jnp.uint32(0))  # padding emits 0 bits
    pattern = jax.lax.bitcast_convert_type(pattern, jnp.int32)

    lane_bits = jnp.sum(clen, axis=1)
    lane_bytes = (lane_bits + 7) >> 3
    lane_words = (lane_bits + 31) >> 5
    lane_woff = jnp.cumsum(lane_words) - lane_words  # exclusive, words
    lane_off = lane_woff * 4
    # Layout overflow (total > 16 bits/sample — impossible for encoder
    # winners, reachable with arbitrary caller-chosen k): flag the lane and
    # every later one; their regions are unreliable.
    bad = bad | (lane_woff + lane_words > NW)

    within = jnp.cumsum(clen, axis=1) - clen
    starts = (lane_woff[:, None] * 32 + within).reshape(-1)  # non-decreasing

    # Telescoping deltas in flat order; scatter-add handles duplicates.
    def spread(vals_f):
        delta = vals_f - jnp.concatenate([vals_f[:1] * 0, vals_f[:-1]])
        seed = jnp.zeros((NB,), jnp.int32).at[starts].add(
            delta, mode="drop", indices_are_sorted=True
        )
        return jnp.cumsum(seed)

    st_exp = spread(starts)
    pat_exp = jax.lax.bitcast_convert_type(spread(pattern.reshape(-1)), jnp.uint32)

    off = jnp.arange(NB, dtype=jnp.int32) - st_exp
    bit = jnp.where(
        (off >= 0) & (off < 32),
        (pat_exp >> jnp.clip(31 - off, 0, 31).astype(jnp.uint32)) & jnp.uint32(1),
        jnp.uint32(0),
    ).astype(jnp.int32)

    # Bits -> bytes: fold 8->1 on a [M, 1024] view with minor-axis strided
    # column picks (a flat stride-8 slice or an [N, 8] reshape are both ~100x
    # slower on TPU — measured; tile-unfriendly layouts).
    b2 = bit.reshape(NB // 1024, 1024)
    byte = jnp.zeros((NB // 1024, 128), jnp.int32)
    for j in range(8):
        byte = byte + (b2[:, j::8] << (7 - j))
    byte = byte.reshape(-1)

    # Compacted tail patch for >32-bit codes: their bits [32, clen) are zeros
    # in the spread (and neighbours intact), so the missing bytes ADD in.
    NBYTES = NB // 8
    flat_long = is_long.reshape(-1)
    idx = jnp.nonzero(flat_long, size=MAX_LONG_CODES, fill_value=L * S)[0]
    live_c = jnp.arange(MAX_LONG_CODES) < jnp.minimum(n_long, MAX_LONG_CODES)
    p_c = starts[jnp.minimum(idx, L * S - 1)]
    q_c = q.reshape(-1)[jnp.minimum(idx, L * S - 1)]
    clen_c = clen.reshape(-1)[jnp.minimum(idx, L * S - 1)]
    u_c = u_rice.reshape(-1)[jnp.minimum(idx, L * S - 1)]

    def code_bit(o):
        """Bit of the Rice code at offset o (int32 [MAX_LONG_CODES])."""
        rem_bit = (u_c >> jnp.clip(clen_c - 1 - o, 0, 31).astype(jnp.uint32)) & 1
        return jnp.where(
            o < q_c, 1, jnp.where(o == q_c, 0, rem_bit.astype(jnp.int32))
        )

    first_tail_byte = (p_c + 32) >> 3
    patch = byte
    for t in range(31):  # tails span <= (271 - 32 + 7 + 7) / 8 = 31 bytes
        bt = first_tail_byte + t
        contrib = jnp.zeros_like(p_c)
        for s in range(8):
            o = bt * 8 + s - p_c
            hit = (o >= 32) & (o < clen_c)
            contrib = contrib + jnp.where(hit, code_bit(o) << (7 - s), 0)
        tgt = jnp.where(live_c & (contrib != 0), bt, NBYTES)
        patch = patch.at[tgt].add(contrib, mode="drop")
    byte = patch

    return (
        byte.astype(jnp.uint8),
        lane_bytes.astype(jnp.int32),
        lane_off.astype(jnp.int32),
        bad,
    )


#: Download-slice bucket (elements): prefixes round up to a multiple of this
#: so the slice program compiles a bounded number of shapes. 2 MB: each fetch
#: over-downloads at most one bucket, and payload sizes cluster, so the
#: shape count stays small.
PREFIX_BUCKET = 2 << 20


@partial(jax.jit, static_argnames=("n",))
def _take_prefix(arr, n: int):
    return jax.lax.dynamic_slice_in_dim(arr, 0, n)


def fetch_prefix_start(arr, nelems: int):
    """Dispatch the bucketed prefix slice and begin its host copy (does not
    block). Finish with :func:`fetch_prefix_finish` — splitting the phases
    lets one chunk's download overlap another chunk's host finalization."""
    if nelems <= 0:
        return None
    from ..futures import start_host_copy

    cap = arr.shape[0]
    n = min(-(-nelems // PREFIX_BUCKET) * PREFIX_BUCKET, cap)
    h = _take_prefix(arr, n)
    start_host_copy(h)
    return h


def fetch_prefix_finish(h, nelems: int) -> np.ndarray:
    if h is None:
        return np.zeros(0, np.uint8)
    return np.asarray(h)[:nelems]


def fetch_prefix(arr, nbytes: int) -> np.ndarray:
    """Download the first nbytes of a device byte buffer (bucketed slice)."""
    return fetch_prefix_finish(fetch_prefix_start(arr, nbytes), nbytes)
