"""Device-side Rice bitstream unpacking: entropy decoding on the TPU.

STATUS: kept as a tested alternate path; the production bulk decode moved to
host C++ Rice parse + ops/blockpack wire transport after profiling on real
hardware — the 44100-step unpack scan cost ~0.9 s per chunk and the q > 47
escape below fired on nearly every lane of real content (one transient per
1 s frame is enough, since rice.rs legally emits 271-bit codes).

The mirror of ops/ricepack.py for the decode direction: the host uploads the
container's packed residual blobs (entropy-coded size) instead of unpacked
i16 residual tensors, and the device recovers the residual rows that feed
the LPC reconstruction scan inside the same jitted program.

Wire format (rice.rs:94-159, see core/rice_host.py): per sample, ``q`` unary
'1' bits, a '0' terminator, then k remainder bits MSB-first; zigzag'd
values; per-lane streams are byte-aligned and standalone; reading past a
stream's end yields zero bits (BitReader zero-fill).

TPU-shaped formulation — indexed ops cost ~8 ns/element on TPU, so nothing
here is per-bit. A `lax.scan` walks the sample axis with all lanes in
parallel (the same lane-parallel shape as lpc.reconstruct): each step reads
a 64-bit window at the lane's current bit position (three 4-byte gathers
from a precomputed big-endian word view), takes the quotient as the window's
leading-ones count (`lax.population_count` on a smeared complement — no
per-bit loop), extracts the k remainder bits with shifts, and advances
``q + 1 + k`` bits.

The 64-bit window bounds decodable quotients: lanes containing a code with
``q > 47`` are flagged in ``bad`` (their rows are garbage) and hosts
re-decode them exactly (core/rice_host.decode). Such codes only arise from
badly mismatched Rice parameters — the same rare spiky-lane family the
packer falls back on — or from corrupt streams. Corruption that makes a
lane overrun its blob (reference semantics: zero-fill) is detected by
comparing the returned ``end_bit`` against the blob end; overrunning lanes
are re-decoded on the host too, so device decode remains bit-exact with the
reference for every input.

Callers append >= PAD_BYTES zero bytes after the last blob so truncated
lanes zero-fill (and the window reads stay in bounds); empty lanes
(silence / host-patched raw) simply point into that padding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

#: Trailing zero bytes hosts must append after the final blob: covers a
#: truncated max-length lane zero-filling every remaining code (one bit per
#: k=0 code) plus the 64-bit window lookahead.
PAD_BYTES = 1 << 14

#: Codes with quotients above this need the host fallback.
MAX_Q = 47


def _leading_ones(w):
    """Number of leading 1 bits of a uint32 (0..32)."""
    x = ~w
    x = x | (x >> 1)
    x = x | (x >> 2)
    x = x | (x >> 4)
    x = x | (x >> 8)
    x = x | (x >> 16)
    return (32 - jax.lax.population_count(x)).astype(jnp.int32)


def _unzigzag(u):
    u = u.astype(jnp.uint32)
    return (u >> 1).astype(jnp.int32) ^ -(u & 1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("S",))
def unpack_lanes(buf, lane_bit_start, k, nvalid, S: int, is_raw=None):
    """Decode every lane's Rice (or raw-LE16) stream from one byte buffer.

    Args:
      buf: [B] uint8 — concatenated per-lane blobs (byte-aligned), then
        >= PAD_BYTES zero bytes.
      lane_bit_start: [L] int32 — 8 * byte offset of each lane's blob.
      k: [L] int32 Rice parameters; nvalid: [L] codes to decode (0 for lanes
        the host patches separately — silence).
      S: static row width (>= max nvalid).
      is_raw: optional [L] bool — lane holds fixed-width 16-bit little-endian
        codes (the writer's verbatim ``<i2`` raw-PCM payload, also
        ops/ricepack's raw lane format) instead of Rice codes; values are
        sign-extended to int32.

    Returns (rows [L, S] int32, end_bit [L] int32 — first bit after the last
    consumed code, for host overrun checks, bad [L] bool — lane hit a Rice
    code with q > MAX_Q and must be host-decoded).
    """
    B = buf.shape[0]
    bl = buf.astype(jnp.uint32)
    ext = jnp.pad(bl, (0, 8))
    word_be = (
        (ext[:-8] << 24) | (ext[1:-7] << 16) | (ext[2:-6] << 8) | ext[3:-5]
    )  # [B] big-endian 4-byte windows at every byte offset

    ku = k.astype(jnp.uint32)
    raw = jnp.zeros(lane_bit_start.shape, bool) if is_raw is None else is_raw

    def step(carry, i):
        start, bad = carry
        byte = jnp.clip(start >> 3, 0, B - 1)
        sh = (start & 7).astype(jnp.uint32)
        g = lambda b: jnp.take(word_be, jnp.clip(b, 0, B - 1))
        wa, wb, wc = g(byte), g(byte + 4), g(byte + 8)
        w1 = (wa << sh) | jnp.where(sh == 0, 0, wb >> (32 - sh))
        w2 = (wb << sh) | jnp.where(sh == 0, 0, wc >> (32 - sh))

        q1 = _leading_ones(w1)
        q = jnp.where(q1 == 32, 32 + _leading_ones(w2), q1)
        o = (q + 1).astype(jnp.uint32)  # remainder offset in the window
        v32 = jnp.where(
            o < 32,
            (w1 << jnp.minimum(o, 31)) | jnp.where(o == 0, 0, w2 >> (32 - jnp.minimum(o, 31))),
            w2 << jnp.minimum(o - 32, 31),
        )
        rem = jnp.where(ku == 0, 0, v32 >> jnp.where(ku == 0, 1, 32 - ku))
        u = (q.astype(jnp.uint32) << ku) | rem
        val_rice = _unzigzag(u)

        # Raw LE16: low byte first in the stream (always byte-aligned — raw
        # lanes start byte-aligned and advance 16 bits per code).
        u16 = ((w1 >> 24) | ((w1 >> 8) & jnp.uint32(0xFF00))).astype(jnp.int32)
        val_raw = u16 - ((u16 & 0x8000) << 1)  # sign-extend 16 -> 32

        val = jnp.where(raw, val_raw, val_rice)
        live = i < nvalid
        bad = bad | (live & ~raw & (q > MAX_Q))
        nxt = jnp.where(live, start + jnp.where(raw, 16, q + 1 + k), start)
        return (nxt, bad), jnp.where(live, val, 0)

    (end_bit, bad), vals = jax.lax.scan(
        step,
        (lane_bit_start, jnp.zeros(lane_bit_start.shape, bool)),
        jnp.arange(S, dtype=jnp.int32),
    )
    return jnp.transpose(vals), end_bit, bad
