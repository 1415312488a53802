#!/usr/bin/env python
"""Round-5 A/B for the device_decode regression (VERDICT r4, Weak #3).

Times, on the real chip at the bench geometry (tools ONLY — bench.py stays
the canonical record):

  A. _decode_lanes_bp as shipped (pack candidates 0..4, unpack cumsum x4)
  B. prototype: unpack cumsum depth limited to max(host pack mode) (static)
  C. prototype: download pack candidates limited to orders 0..2 (the r3 set)
  D. reconstruct_best alone (the sequential scan floor)

plus the actual mode histogram of the upload (host pack) and the download
payload sizes under candidate sets {0..2} vs {0..4}, so the wire win the
extra candidates buy is on the same page as their compute cost.
"""

import pathlib
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from flo_tpu.lossless.decoder import _decode_lanes_bp, div2_trunc
from flo_tpu.ops import blockpack, lpc

RATE = 44100
BREADTH_SECONDS = 15
BREADTH_FILES = 8


def _force(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


def _time_device(fn, reps=6):
    _force(fn())
    _force(fn())
    t0 = time.time()
    outs = [fn() for _ in range(reps)]
    _force(outs[-1])
    return (time.time() - t0) / reps


def bench_material():
    from bench import corpus_like_clips, make_audio

    bclips = corpus_like_clips(BREADTH_FILES, BREADTH_SECONDS)
    if bclips is None:
        bclips = [
            make_audio(BREADTH_SECONDS, RATE, seed=7 + i) for i in range(BREADTH_FILES)
        ]
    pcm = np.stack(
        [
            np.round(c.reshape(-1, 2).T * 32767).astype(np.int16)[:, : RATE * BREADTH_SECONDS]
            for c in bclips
        ]
    ).reshape(BREADTH_FILES, 2, -1)
    pcm_f = np.ascontiguousarray(
        pcm.reshape(BREADTH_FILES, 2, BREADTH_SECONDS, RATE).transpose(0, 2, 1, 3)
    ).reshape(-1, 2, RATE)
    return pcm_f


# --- prototype variants -------------------------------------------------

def unpack_rows_kmax(buf, modes, widths, lane_off, nvalid, S: int, kmax: int):
    """unpack_rows with a static cumsum depth (max mode the host packed)."""
    out = blockpack.unpack_rows.__wrapped__ if hasattr(blockpack.unpack_rows, "__wrapped__") else None
    # inline copy of the tail with bounded depth
    L, NB = widths.shape
    Sp = NB * blockpack.BLK
    NT = buf.shape[0] // 1024
    W32 = jax.lax.bitcast_convert_type(
        buf[: NT * 1024].reshape(NT, 32, 8, 4), jnp.uint32
    )
    Ttile = blockpack._planes_to_codes(W32)
    w = widths.astype(jnp.int32)
    unit0 = (lane_off.astype(jnp.int32) >> 5)[:, None] + blockpack._exclusive_cumsum(w, 1)
    u0f = unit0.reshape(-1)
    t0 = jnp.clip(u0f >> 5, 0, NT - 1)
    s = (u0f & 31).astype(jnp.uint32)[:, None, None]
    T0 = jnp.take(Ttile, t0, axis=0)
    T1 = jnp.take(Ttile, jnp.minimum(t0 + 1, NT - 1), axis=0)
    hi = jnp.where(s > 0, T1 << ((jnp.uint32(32) - s) & jnp.uint32(31)), jnp.uint32(0))
    wf = w.reshape(-1)
    mask = jnp.where(
        wf >= 32,
        jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << jnp.minimum(wf, 31).astype(jnp.uint32)) - 1,
    )[:, None, None]
    z = (((T0 >> s) | hi) & mask).reshape(L, Sp)[:, :S]
    v = ((z >> 1) ^ (-(z & 1).astype(jnp.int32)).astype(jnp.uint32)).astype(jnp.int32)
    out = v
    acc = v
    for k in range(1, kmax + 1):
        acc = jnp.cumsum(acc, axis=1, dtype=jnp.int32)
        out = jnp.where((modes == k)[:, None], acc, out)
    valid = jnp.arange(S, dtype=jnp.int32)[None, :] < nvalid.astype(jnp.int32)[:, None]
    return jnp.where(valid, out, 0)


@partial(jax.jit, static_argnames=("channels", "S", "kmax", "pack_orders"))
def decode_lanes_variant(buf, up_modes, up_widths, up_off, coeffs, shifts,
                         orders, is_fixed, mid_side, lane_nvalid,
                         channels: int, S: int, kmax: int, pack_orders: int):
    rows = unpack_rows_kmax(buf, up_modes, up_widths, up_off, lane_nvalid, S, kmax)
    samples = lpc.reconstruct_best(rows, coeffs, shifts, orders, is_fixed)
    fcs = samples.reshape(-1, channels, S)
    if channels == 2:
        m, sde = fcs[:, 0], fcs[:, 1]
        left = div2_trunc(m + sde)
        right = div2_trunc(m - sde)
        ms = mid_side[:, None]
        fcs = jnp.stack([jnp.where(ms, left, m), jnp.where(ms, right, sde)], axis=1)
    lanes = fcs.reshape(-1, S)
    if pack_orders == 4:
        return blockpack.pack_rows_fused(lanes, lane_nvalid)
    return pack_rows_fused_korders(lanes, lane_nvalid, pack_orders)


def pack_rows_fused_korders(rows, nvalid, korders: int):
    """pack_rows_stage1+2 with the candidate set limited to orders
    0..korders (prototype of the r3 behavior at korders=2)."""
    from flo_tpu.ops import blockspread

    L, S = rows.shape
    nblk = blockpack.nblocks(S)
    Spad = nblk * blockpack.BLK
    j = jnp.arange(Spad, dtype=jnp.int32)
    valid = j[None, :] < nvalid.astype(jnp.int32)[:, None]
    vpad = rows if Spad == S else jnp.pad(rows, ((0, 0), (0, Spad - S)))
    v = jnp.where(valid, vpad, 0).astype(jnp.int32)
    diffs = [v]
    for _ in range(korders):
        d = diffs[-1]
        diffs.append(d - jnp.pad(d, ((0, 0), (1, 0)))[:, :Spad])
    diffs = [jnp.where(valid, d, 0) for d in diffs]

    def zig(x):
        return ((x << 1) ^ (x >> 31)).astype(jnp.uint32)

    def wblk(z):
        m = jnp.max(z.reshape(L, nblk, blockpack.BLK), axis=2)
        return jnp.where(
            m == 0, 0, 32 - jax.lax.clz(jax.lax.bitcast_convert_type(m, jnp.int32))
        )

    zs = [zig(d) for d in diffs]
    ws = [wblk(z) for z in zs]
    sizes = jnp.stack([w.sum(axis=1) for w in ws])
    modes = jnp.argmin(sizes, axis=0).astype(jnp.int32)
    w = ws[0]
    z = zs[0]
    for k in range(1, korders + 1):
        sel = (modes == k)[:, None]
        w = jnp.where(sel, ws[k], w)
        z = jnp.where(sel, zs[k], z)
    pw = blockpack._codes_to_planes(z.reshape(L * nblk, 8, 32))
    lane_bytes = 32 * w.sum(axis=1)
    lane_off = blockpack._exclusive_cumsum(lane_bytes, 0)
    stage = {"pw": pw, "widths_i32": w, "lane_off_i32": lane_off}
    words = blockpack.pack_rows_stage2(NW=blockpack.pack_worst_words_pcm(L, S), **stage)
    return stage, words, modes, w.astype(jnp.uint8), lane_bytes, lane_off


def main():
    pcm_f = bench_material()
    F2 = pcm_f.shape[0]
    res_rows = np.asarray(
        np.clip(np.diff(pcm_f.reshape(-1, RATE), axis=1, prepend=0), -30000, 30000),
        np.int32,
    )
    L2 = res_rows.shape[0]
    nv_l = np.full(L2, RATE, np.int64)
    upb, upm, upw, upo = blockpack.pack_host(res_rows, nv_l)
    hist = np.bincount(upm.astype(int), minlength=5)
    kmax = int(upm.max())
    print(f"upload pack mode histogram (orders 0..4): {hist.tolist()}  kmax={kmax}")
    print(f"upload payload: {len(upb)/1e6:.2f} MB "
          f"({len(upb)*8/res_rows.size:.2f} bits/sample)")

    dd_args = (
        jax.device_put(upb), jax.device_put(upm.astype(np.int32)),
        jax.device_put(upw), jax.device_put(upo.astype(np.int32)),
        jax.device_put(np.tile(np.array([[2, -1] + [0] * 10], np.int32), (L2, 1))),
        jax.device_put(np.zeros(L2, np.int32)),
        jax.device_put(np.full(L2, 2, np.int32)),
        jax.device_put(np.ones(L2, bool)),
        jax.device_put(np.zeros(F2, bool)),
        jax.device_put(nv_l.astype(np.int32)),
    )

    audio_sec = BREADTH_FILES * BREADTH_SECONDS

    dt = _time_device(lambda: _decode_lanes_bp(*dd_args, 2, RATE, up_kmax=kmax))
    print(f"A shipped decode step (kmax={kmax}):  {dt*1e3:7.1f} ms  {audio_sec/dt:7.1f}x")
    dt = _time_device(lambda: _decode_lanes_bp(*dd_args, 2, RATE, up_kmax=4))
    print(f"A0 pre-fix decode step (kmax=4):  {dt*1e3:7.1f} ms  {audio_sec/dt:7.1f}x")

    dt = _time_device(lambda: decode_lanes_variant(*dd_args, 2, RATE, kmax, 4))
    print(f"B unpack kmax={kmax} (static):        {dt*1e3:7.1f} ms  {audio_sec/dt:7.1f}x")

    dt = _time_device(lambda: decode_lanes_variant(*dd_args, 2, RATE, kmax, 2))
    print(f"C B + pack candidates 0..2:       {dt*1e3:7.1f} ms  {audio_sec/dt:7.1f}x")

    dt = _time_device(lambda: decode_lanes_variant(*dd_args, 2, RATE, 4, 4))
    print(f"A'(variant, kmax=4, orders 0..4): {dt*1e3:7.1f} ms  {audio_sec/dt:7.1f}x")

    dt = _time_device(
        lambda: lpc.reconstruct_best(
            jnp.asarray(res_rows), dd_args[4], dd_args[5], dd_args[6], dd_args[7]
        )
    )
    print(f"D reconstruct scan alone:         {dt*1e3:7.1f} ms  {audio_sec/dt:7.1f}x")

    # Wire cost of the candidate restriction on the DOWNLOAD (PCM) side.
    pcm_rows = pcm_f.reshape(-1, RATE).astype(np.int32)
    for korders in (2, 4):
        ds = [pcm_rows]
        for _ in range(korders):
            d = ds[-1].copy()
            d[:, 1:] -= ds[-1][:, :-1]
            ds.append(d)
        best = None
        for d in ds:
            z = ((d << 1) ^ (d >> 31)).astype(np.uint32)
            nb = -(-RATE // blockpack.BLK)
            zp = np.pad(z, ((0, 0), (0, nb * blockpack.BLK - RATE)))
            m = zp.reshape(-1, nb, blockpack.BLK).max(axis=2)
            wbits = np.zeros_like(m, dtype=np.int64)
            nzm = m > 0
            wbits[nzm] = np.floor(np.log2(m[nzm].astype(np.float64))).astype(np.int64) + 1
            size = wbits.sum(axis=1) * 32 * 8  # bits: 32 bytes/plane-unit
            best = size if best is None else np.minimum(best, size)
        print(f"download PCM payload, candidates 0..{korders}: "
              f"{best.sum()/8/1e6:.2f} MB ({best.sum()/pcm_rows.size:.2f} bits/sample)")


if __name__ == "__main__":
    main()
