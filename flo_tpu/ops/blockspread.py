"""Device Rice bitstream packing v2: block-dense spread, no per-code scatters.

Replaces ops/ricepack.pack_lanes as the production encoder transport. The
round-2 packer spread per-code deltas over a 169M-element BIT domain; on this
chip every per-code indexed op (scatter/gather at ~10M indices) costs
~10 ns/element, so that design spent ~425 ms per [240, 44100] batch — the
entire gap between the measured candidate search (~12 ms) and the 1000x
realtime target (tools/pack_primitives.py, tools/select_decompose.py).

This design touches indices only per-BLOCK (32 codes), ~330k of them:

1. Elementwise per code: bit length ``clen`` and the 32-bit MSB-aligned
   pattern (identical math to ricepack: unary ones, terminator, remainder —
   or the raw LE16 pattern).
2. Per-lane bit offsets via a two-level cumsum (block sums + in-block log
   shifts — no flat 10M cumsum); lanes are word-aligned as before.
3. DENSE within-block spread: each 32-code block's bits land in at most 34
   consecutive output words starting at its absolute word W0; row word j is
   a broadcast compare-select-sum over the block's codes (measured ~6 ms,
   no indexing). A block's boundary straddle word overlaps the next block's
   word 0 and is folded in with one tiny per-block gather ("the move").
4. Assembly WITHOUT per-word windowed writes (XLA windowed scatter measured
   1.15 s): scatter per-block (index, W0) DELTAS at the 330k block start
   words, cumsum over the word domain, and every output word w computes its
   covering block b and offset j = w - W0[b] arithmetically; one flat gather
   ``rows[b*34 + j]`` yields the word. The gather is the only O(words)
   indexed op, so stage 2 takes a bucketed word count: callers download the
   exact lane sizes (tiny) after stage 1 and dispatch stage 2 at the
   entropy-sized bucket instead of the 16-bit/sample worst case.
5. Codes that cannot live in a 34-word row — >32-bit Rice codes (format-legal
   up to 271 bits, rice.rs caps quotients at 255) and codes pushed past word
   32 by one — are excluded from the spread and written whole by a compacted
   patch pass (<= PATCH_CAP codes; beyond that the affected lanes fall back
   to exact host re-packing, as before).

Output contract (same as ricepack.pack_lanes, but words): for every
non-flagged lane, the byte stream ``words.view(u8)[off[l]:off[l]+n[l]]`` is
byte-for-byte identical to ``rice_host.encode(residuals[l, :n[l]], k[l])``;
raw lanes carry verbatim LE16 codes. Lane offsets are word-aligned. The
MSB-first word→byte swap happens ON DEVICE at the end of pack_stage2 (4
vector shift/ors) so the downloaded u32 buffer's little-endian host layout
IS the byte stream — fetch_words_finish is a zero-copy view, not the
byteswap+tobytes double copy it replaces (~2 host passes over the payload
per pass on this single-core host).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

#: Codes per spread block. 32 codes * <=32 bits + straddle -> 34-word rows.
BLKC = 32
ROWW = 34

#: Static cap on patched codes (>32-bit or overflow-wi) per pack call.
PATCH_CAP = 16384

#: Static cap on BLOCKS containing patched codes (first compaction level).
PATCH_BLOCKS = 4096

#: Max words a patched code can span: ceil((255+1+15)/32) + straddle.
PATCH_WORDS = 10

#: Worst-case packed bits per sample (raw baseline bound) — sizes the
#: fallback single-program path and the stage-2 bucket ceiling.
WORST_BITS_PER_SAMPLE = 16

#: Hard cap so every bit index fits int32 (with word-align slack).
MAX_BATCH_SAMPLES = (1 << 30) // WORST_BITS_PER_SAMPLE - 1


def _zigzag_u32(r):
    z = (r << 1) ^ (r >> 31)
    return jax.lax.bitcast_convert_type(z, jnp.uint32)


def _exclusive_block_cumsum(x):
    """[N, BLKC] -> exclusive within-row cumsum via log2(BLKC) shifted adds."""
    c = x
    sh = 1
    while sh < BLKC:
        c = c + jnp.pad(c, ((0, 0), (sh, 0)))[:, :BLKC]
        sh <<= 1
    return c - x


def pack_stage1(residuals, k, nvalid, is_raw):
    """Candidate-independent packing analysis + block spread (call in jit).

    Args: residuals [L, S] int32 (Rice lanes: residuals; raw lanes: verbatim
    samples), k [L] int32, nvalid [L] int32, is_raw [L] bool.

    Returns a dict of device arrays for :func:`pack_stage2` plus
    (lane_bytes [L] i32, lane_off [L] i32 word-aligned, bad [L] bool).
    """
    L, S = residuals.shape
    kcol = k[:, None]
    ku = kcol.astype(jnp.uint32)

    u_rice = _zigzag_u32(residuals)
    q = jnp.minimum(u_rice >> ku, jnp.uint32(255)).astype(jnp.int32)
    u_raw = jax.lax.bitcast_convert_type(residuals & 0xFFFF, jnp.uint32)

    valid = jnp.arange(S, dtype=jnp.int32)[None, :] < nvalid[:, None]
    clen = jnp.where(is_raw[:, None], 16, q + 1 + kcol)
    clen = jnp.where(valid, clen, 0)

    # MSB-aligned 32-bit pattern (spread codes have q <= 31, so the
    # remainder always fits; patched codes never read their pattern).
    q32 = jnp.minimum(q, 31).astype(jnp.uint32)
    ones = jnp.where(q >= 32, jnp.uint32(0xFFFFFFFF), ~(jnp.uint32(0xFFFFFFFF) >> q32))
    rem = jnp.where(ku > 0, u_rice << (jnp.uint32(32) - ku), jnp.uint32(0))
    pat_rice = ones | jnp.where(q < 31, rem >> jnp.minimum(q32 + 1, 31), jnp.uint32(0))
    pat_raw = ((u_raw & jnp.uint32(0x00FF)) << 24) | ((u_raw & jnp.uint32(0xFF00)) << 8)
    pattern = jnp.where(is_raw[:, None], pat_raw, pat_rice)
    pattern = jnp.where(valid, pattern, jnp.uint32(0))

    return _spread_codes(clen, pattern, q, u_rice)


def _spread_codes(clen, pattern, q, u_rice):
    """Shared stage-1 core: variable-length codes [L, S] (bit length `clen`,
    first-32-bits MSB-aligned `pattern`, Rice (q, u) for >32-bit patch
    tails) -> block spread + deltas + patch list + lane sizes."""
    L, S = clen.shape
    NBL = -(-S // BLKC)  # blocks per lane
    Sp = NBL * BLKC

    # Two-level bit-offset cumsum: block sums, then in-block log shifts.
    pad = Sp - S
    clen_p = jnp.pad(clen, ((0, 0), (0, pad))) if pad else clen
    cb = clen_p.reshape(L, NBL, BLKC)
    blk_bits = jnp.sum(cb, axis=2)  # [L, NBL]
    blk_off = jnp.cumsum(blk_bits, axis=1) - blk_bits
    within = (
        blk_off[:, :, None] + _exclusive_block_cumsum(cb.reshape(-1, BLKC)).reshape(L, NBL, BLKC)
    ).reshape(L, Sp)

    lane_bits = blk_off[:, -1] + blk_bits[:, -1]
    lane_bytes = (lane_bits + 7) >> 3
    lane_words = (lane_bits + 31) >> 5
    lane_woff = jnp.cumsum(lane_words) - lane_words
    lane_off = lane_woff * 4
    total_words = lane_woff[-1] + lane_words[-1] if L else jnp.int32(0)

    # Absolute bit start per code; block word starts.
    abs_start = (lane_woff[:, None] << 5) + within  # [L, Sp]
    W0 = ((lane_woff << 5)[:, None] + blk_off) >> 5  # [L, NBL]
    lane_end_word = (lane_woff + lane_words)[:, None]
    # Empty blocks scatter at the lane's end word: real blocks there win by
    # flat order, and the run-off tail resolves to zero rows.
    W0_pos = jnp.where(blk_bits > 0, W0, lane_end_word).reshape(-1)
    W0_flat = W0.reshape(-1)
    NBLK = L * NBL

    # Per-code spread inputs.
    wi = (abs_start >> 5) - jnp.repeat(W0, BLKC, axis=1)
    bo = (abs_start & 31).astype(jnp.uint32)
    live = (clen_p > 0) & (clen_p <= 32) & (wi <= 32)
    is_patch = (clen_p > 0) & ~live
    pat_live = jnp.where(live, jnp.pad(pattern, ((0, 0), (0, pad))) if pad else pattern, jnp.uint32(0))
    a = pat_live >> bo
    b = jnp.where(bo > 0, pat_live << (jnp.uint32(32) - bo), jnp.uint32(0))

    # Dense within-block spread -> rows [NBLK, ROWW].
    wib = wi.reshape(NBLK, BLKC)
    ab = a.reshape(NBLK, BLKC)
    bb = b.reshape(NBLK, BLKC)
    j = jnp.arange(ROWW, dtype=jnp.int32)
    rows = jnp.sum(
        jnp.where(wib[:, :, None] == j[None, None, :], ab[:, :, None], jnp.uint32(0))
        + jnp.where(wib[:, :, None] == (j - 1)[None, None, :], bb[:, :, None], jnp.uint32(0)),
        axis=1,
    )  # [NBLK, ROWW] u32

    # Fold each block's straddle word into the next block's word 0.
    adv = jnp.concatenate([W0_pos[1:], total_words[None]]) - W0_flat
    moved = jnp.where(
        (adv >= 1) & (adv < ROWW),
        jnp.take_along_axis(rows, jnp.clip(adv, 0, ROWW - 1)[:, None], axis=1)[:, 0],
        jnp.uint32(0),
    )
    rows = rows.at[:, 0].add(jnp.concatenate([jnp.zeros(1, jnp.uint32), moved[:-1]]))

    # Per-block (index, W0) deltas for the stage-2 word-domain expansion.
    bidx = jnp.arange(NBLK, dtype=jnp.int32)
    db = bidx - jnp.concatenate([jnp.zeros(1, jnp.int32), bidx[:-1]])
    dw = W0_flat - jnp.concatenate([jnp.zeros(1, jnp.int32), W0_flat[:-1]])

    # Compacted patch list (>32-bit codes and overflow-wi codes). Patches are
    # rare, so compact in two levels with cumsum-rank + tiny scatters — a
    # flat jnp.nonzero over L*Sp codes lowers to a full device sort
    # (~100 ms at this geometry; tools/stage1_decompose.py).
    qp = jnp.pad(q, ((0, 0), (0, pad))) if pad else q
    up = jnp.pad(u_rice, ((0, 0), (0, pad))) if pad else u_rice
    patch_b = is_patch.reshape(NBLK, BLKC)
    blk_has = jnp.any(patch_b, axis=1)
    n_pblk = jnp.sum(blk_has, dtype=jnp.int32)
    brank = jnp.cumsum(blk_has.astype(jnp.int32)) - 1
    bdest = jnp.where(blk_has, brank, PATCH_BLOCKS)
    bidx_sel = (
        jnp.full((PATCH_BLOCKS,), NBLK, jnp.int32)
        .at[bdest]
        .set(jnp.arange(NBLK, dtype=jnp.int32), mode="drop",
             indices_are_sorted=True)
    )
    grab = jnp.minimum(bidx_sel, NBLK - 1)

    def gather_blocks(arr2d):  # [L, Sp] -> [PATCH_BLOCKS, BLKC]
        return arr2d.reshape(NBLK, BLKC)[grab]

    g_flag = gather_blocks(is_patch) & (bidx_sel < NBLK)[:, None]
    g_s = gather_blocks(abs_start).reshape(-1)
    g_clen = gather_blocks(clen_p).reshape(-1)
    g_q = gather_blocks(qp).reshape(-1)
    g_u = gather_blocks(up).reshape(-1)
    gf = g_flag.reshape(-1)

    n_patch = jnp.sum(patch_b, dtype=jnp.int32)
    crank = jnp.cumsum(gf.astype(jnp.int32)) - 1
    cdest = jnp.where(gf, crank, PATCH_CAP)
    put = lambda src: (
        jnp.zeros((PATCH_CAP,), src.dtype)
        .at[cdest]
        .set(src, mode="drop", indices_are_sorted=True)
    )
    p_s = put(g_s)
    p_clen = put(g_clen)
    p_q = put(g_q)
    p_u = put(g_u)
    live_c = jnp.arange(PATCH_CAP, dtype=jnp.int32) < jnp.minimum(n_patch, PATCH_CAP)

    bad = jnp.any(is_patch.reshape(L, Sp), axis=1) & (
        (n_patch > PATCH_CAP) | (n_pblk > PATCH_BLOCKS)
    )

    stage = {
        "rows": rows,
        "W0_pos": W0_pos,
        "db": db,
        "dw": dw,
        "p_s": p_s,
        "p_clen": p_clen,
        "p_q": p_q,
        "p_u": p_u,
        "p_live": live_c,
    }
    return stage, lane_bytes.astype(jnp.int32), lane_off.astype(jnp.int32), bad


@partial(jax.jit, static_argnames=("NW",))
def pack_stage2(rows, W0_pos, db, dw, p_s, p_clen, p_q, p_u, p_live, NW: int):
    """Assemble the word stream at a bucketed size (static NW words).

    Returns words u32 [NW] already byte-swapped to host little-endian
    layout: ``np.asarray(words).view(np.uint8)`` IS the MSB-first byte
    stream (fetch_words_finish is a zero-copy view).
    """
    NBLK = rows.shape[0]
    pos = jnp.minimum(W0_pos, NW)  # run-off tail -> dropped
    # (A fused [NW, 2] two-column seed scatter was measured SLOWER —
    # 49.7 vs 40.9 ms — the minor dim 2 wastes 126/128 vreg lanes.)
    seedB = jnp.zeros((NW,), jnp.int32).at[pos].add(db, mode="drop", indices_are_sorted=True)
    seedW = jnp.zeros((NW,), jnp.int32).at[pos].add(dw, mode="drop", indices_are_sorted=True)
    B1 = jnp.cumsum(seedB)
    W0e = jnp.cumsum(seedW)

    w = jnp.arange(NW, dtype=jnp.int32)
    j = w - W0e
    flat = jnp.clip(B1 * ROWW + jnp.clip(j, 0, ROWW - 1), 0, NBLK * ROWW - 1)
    words = jnp.where((j >= 0) & (j < ROWW), rows.reshape(-1)[flat], jnp.uint32(0))

    # Patch pass: write each flagged code's full bit pattern additively
    # (its words are untouched by the spread, neighbours' bits disjoint).
    first_word = p_s >> 5
    p_ku = jnp.maximum(p_clen - 1 - p_q, 0).astype(jnp.uint32)  # k bits

    def code_word(t):
        """32-bit word t of the code's span, MSB-first (vector [PATCH_CAP])."""
        base = (first_word + t) << 5  # absolute bit of word bit 0
        acc = jnp.zeros_like(p_s)
        for s2 in range(32):
            o = base + s2 - p_s
            in_code = (o >= 0) & (o < p_clen)
            is_one = o < p_q
            rem_sh = jnp.clip(p_clen - 1 - o, 0, 31).astype(jnp.uint32)
            rem_bit = ((p_u >> rem_sh) & 1).astype(jnp.int32)
            bit = jnp.where(is_one, 1, jnp.where(o == p_q, 0, rem_bit))
            acc = acc + jnp.where(in_code, bit << (31 - s2), 0)
        return acc

    # All PATCH_WORDS contributions in ONE scatter-add: ten sequential
    # .at[].add passes on the [NW] words array each risk a full aliasing
    # copy of the payload between scatters.
    contribs = jnp.stack([code_word(t) for t in range(PATCH_WORDS)])
    tgts = jnp.where(
        p_live[None, :] & (contribs != 0),
        first_word[None, :] + jnp.arange(PATCH_WORDS, dtype=p_s.dtype)[:, None],
        NW,
    )
    words = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(words, jnp.int32)
        .at[tgts.reshape(-1)]
        .add(contribs.reshape(-1), mode="drop"),
        jnp.uint32,
    )
    # Byte-swap on device: the stream is MSB-first within each u32, so
    # emitting the swapped word makes the host's little-endian u32 buffer
    # equal the byte stream — the download needs no host-side byteswap copy.
    return (
        (words >> 24)
        | ((words >> 8) & jnp.uint32(0x0000FF00))
        | ((words << 8) & jnp.uint32(0x00FF0000))
        | (words << 24)
    )


def bucket_words(n: int, floor: int = 1 << 16) -> int:
    """{1, 1.5} x 2^k growth bucket for the stage-2 word count."""
    b = floor
    while b < n:
        b <<= 1
    return b * 3 // 4 if (b * 3 // 4 >= n and b * 3 // 4 >= floor) else b


def fetch_words_start(words_dev, total_bytes: int):
    """Dispatch + async-start the packed payload download (u32 words)."""
    from .ricepack import fetch_prefix_start

    if total_bytes <= 0:
        return None
    return fetch_prefix_start(words_dev, -(-total_bytes // 4))


def fetch_words_finish(h, total_bytes: int) -> np.ndarray:
    """Finish the download; returns the MSB-first byte stream as a
    zero-copy ``np.uint8`` view of the downloaded words (pack_stage2
    byte-swapped on device)."""
    from .ricepack import fetch_prefix_finish

    if h is None:
        return np.zeros(0, np.uint8)
    w = fetch_prefix_finish(h, -(-total_bytes // 4))
    return np.ascontiguousarray(w).view(np.uint8)[:total_bytes]


def pack_lanes_words(residuals, k, nvalid, is_raw, NW: int):
    """Single-call convenience (stage1 + stage2 at a caller-chosen NW);
    the production pipelines split the stages to size NW from the downloaded
    lane sizes. Call inside jit or rely on pack_stage2's jit."""
    stage, lane_bytes, lane_off, bad = pack_stage1(residuals, k, nvalid, is_raw)
    words = pack_stage2(NW=NW, **stage)
    return words, lane_bytes, lane_off, bad
