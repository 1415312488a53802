#!/usr/bin/env python
"""DCE-decompose the v3 blockspread.pack_stage2 at the bench geometry.

Stages timed (each as its own jit on resident stage-1 outputs, enqueue-N
force-last timing — see tools/select_decompose.py):
  owner     tile->owner superblock delta scatter + cumsum (NT domain)
  r0        owner window: 2 aligned 128-word unit gathers + 7-step barrel
  rN        one in-tile starter candidate: 1 unit gather + barrel + mask
  patch     the compacted >32-bit-code patch pass
  swap      the final byteswap
  full      pack_stage2 as shipped (RCAND candidates)
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

F, C, S = 120, 2, 44100


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from flo_tpu.ops.select import encode_select_device
    from flo_tpu.ops import blockspread as bs

    rng = np.random.default_rng(0)
    t = np.arange(F * S) / 44100
    sig = 20000 * np.sin(2 * np.pi * 261.6 * t) + 6000 * np.sin(2 * np.pi * 329.6 * t)
    sig += 300 * rng.standard_normal(sig.shape)
    pcm = np.stack(
        [sig.astype(np.int16), np.roll(sig, 7).astype(np.int16)], axis=1
    ).reshape(F, S, C).transpose(0, 2, 1)
    pcm_dev = jax.device_put(np.ascontiguousarray(pcm))
    nv_dev = jax.device_put(np.full(F, S, np.int32))
    kinds = ("raw", "fixed", "fixed", "fixed", "fixed", "fixed",
             "lpc", "lpc", "lpc", "lpc")
    orders = (0, 0, 1, 2, 3, 4, 5, 6, 7, 8)

    out = encode_select_device(pcm_dev, nv_dev, kinds, orders)
    # out[3] is the fused worst-case-bucket words; rebuild the stage dict
    # from the winner residuals to decompose stage 2 in isolation.
    lane_bytes = np.asarray(out[4]).astype(np.int64)
    lane_off = np.asarray(out[5]).astype(np.int64)
    nv_lane = jax.device_put(np.full(F * C, S, np.int32))
    stage, _, _, _ = jax.jit(bs.pack_stage1)(out[7], out[1], nv_lane, out[0] == 0)
    total = int(lane_off[-1] + ((lane_bytes[-1] + 3) // 4) * 4)
    NW = bs.pack_worst_words(F * C, S)
    stage = {k: jax.device_put(np.asarray(v)) for k, v in stage.items()}
    NSB = stage["sup"].shape[0]
    NT = NW // bs.TILE
    print(f"NW={NW} ({NW*4/1e6:.1f} MB) NSB={NSB} NT={NT}")

    def _force(o):
        return np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])

    def tm(name, fn, *args, reps=10):
        _force(fn(*args))
        outs = []
        t0 = time.time()
        for _ in range(reps):
            outs.append(fn(*args))
        _force(outs[-1])
        print(f"{name:7s} {(time.time()-t0)/reps*1e3:7.1f} ms", flush=True)

    TILE, SUPW, UN = bs.TILE, bs.SUPW, bs._SUP_UNITS

    @jax.jit
    def owner_of(own_t, own_ds):
        seed = (
            jnp.zeros((NT + 1,), jnp.int32)
            .at[jnp.clip(own_t, 0, NT)]
            .add(own_ds, mode="drop", indices_are_sorted=True)
        )
        return jnp.cumsum(seed)[:NT] - 1

    owner = jax.device_put(np.asarray(owner_of(stage["own_t"], stage["own_ds"])))

    @jax.jit
    def r0(sup, S0x, advx, owner):
        sup6 = sup.reshape(NSB * UN, TILE)
        u0 = jnp.arange(NT, dtype=jnp.int32) * TILE
        jj = jnp.arange(TILE, dtype=jnp.int32)
        s_cur = jnp.where(owner < 0, NSB, owner)
        S0r = jnp.take(S0x, s_cur)
        advr = jnp.take(advx, s_cur)
        o = u0 - S0r
        qo = jnp.clip(o, 0, SUPW - 1) >> 7
        base = jnp.clip(s_cur, 0, NSB - 1) * UN + qo
        hi = NSB * UN - 1
        U0 = jnp.take(sup6, jnp.clip(base, 0, hi), axis=0)
        U1 = jnp.take(sup6, jnp.clip(base + 1, 0, hi), axis=0)
        x = jnp.concatenate([U0, U1], axis=1)
        sh = jnp.clip(o, 0, SUPW - 1) & (TILE - 1)
        for bit in range(7):
            sv = 1 << bit
            x = jnp.where(((sh & sv) != 0)[:, None], jnp.pad(x, ((0, 0), (0, sv)))[:, sv:], x)
        win = x[:, :TILE]
        srcw = o[:, None] + jj[None, :]
        return jnp.where((srcw >= 0) & (srcw <= advr[:, None]), win, jnp.uint32(0))

    @jax.jit
    def rN(sup, S0x, advx, nxtx, owner):
        sup6 = sup.reshape(NSB * UN, TILE)
        u0 = jnp.arange(NT, dtype=jnp.int32) * TILE
        jj = jnp.arange(TILE, dtype=jnp.int32)
        pos = jnp.take(nxtx, owner + 1)
        s_cur = jnp.where(pos < 0, NSB, pos)
        S0r = jnp.take(S0x, s_cur)
        advr = jnp.take(advx, s_cur)
        o = u0 - S0r
        base = jnp.clip(s_cur, 0, NSB - 1) * UN
        x = jnp.take(sup6, base, axis=0)
        p = jnp.clip(-o, 0, TILE - 1)
        for bit in range(7):
            sv = 1 << bit
            x = jnp.where(((p & sv) != 0)[:, None], jnp.pad(x, ((0, 0), (sv, 0)))[:, :TILE], x)
        srcw = o[:, None] + jj[None, :]
        return jnp.where((srcw >= 0) & (srcw <= advr[:, None]), x, jnp.uint32(0))

    tm("owner", owner_of, stage["own_t"], stage["own_ds"])
    tm("r0", r0, stage["sup"], stage["S0x"], stage["advx"], owner)
    tm("rN", rN, stage["sup"], stage["S0x"], stage["advx"], stage["nxtx"], owner)
    tm("full", lambda: bs.pack_stage2(NW=NW, **stage))


if __name__ == "__main__":
    main()
