#!/usr/bin/env python
"""DCE-decompose blockspread.pack_stage2 at the bench geometry and
microbench candidate replacements for its O(payload-words) flat gather.

Stages timed (each as its own jit, on resident inputs):
  seeds     the two [NW] delta scatters (NBLK indices) + cumsums
  gather    the per-word flat expand rows_flat[B1*34+j] (the suspect)
  patch     the compacted >32-bit-code patch pass
  swap      the final byteswap
  full      pack_stage2 as shipped

Primitives (same payload volume):
  g_word    flat monotone word gather, NW indices
  g_pair    [NW/2, 2]-row gather, NW/2 indices
  g_quad    [NW/4, 4]-row gather, NW/4 indices
  g_unit    [NW/8, 8]-row gather, NW/8 indices
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
    from flo_tpu.ops import blockspread

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
    stage, lane_bytes_d, lane_off_d = out[3], out[4], out[5]
    lane_bytes = np.asarray(lane_bytes_d).astype(np.int64)
    lane_off = np.asarray(lane_off_d).astype(np.int64)
    total = int(lane_off[-1] + ((lane_bytes[-1] + 3) // 4) * 4)
    NW = blockspread.bucket_words(total // 4)
    stage = {k: jax.device_put(v) for k, v in stage.items()}
    NBLK = stage["rows"].shape[0]
    print(f"NW={NW} ({NW*4/1e6:.1f} MB) NBLK={NBLK}")

    def tm(fn, *args, reps=10):
        o = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
        t0 = time.time()
        outs = [fn(*args) for _ in range(reps)]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0].ravel()[:1])
        for o in outs[:-1]:
            jax.tree_util.tree_leaves(o)[0].block_until_ready()
        return (time.time() - t0) / reps

    ROWW = blockspread.ROWW
    PATCH_WORDS = blockspread.PATCH_WORDS

    @jax.jit
    def seeds(rows, W0_pos, db, dw):
        pos = jnp.minimum(W0_pos, NW)
        seedB = jnp.zeros((NW,), jnp.int32).at[pos].add(db, mode="drop", indices_are_sorted=True)
        seedW = jnp.zeros((NW,), jnp.int32).at[pos].add(dw, mode="drop", indices_are_sorted=True)
        return jnp.cumsum(seedB), jnp.cumsum(seedW)

    B1, W0e = seeds(stage["rows"], stage["W0_pos"], stage["db"], stage["dw"])
    B1 = jax.device_put(np.asarray(B1))
    W0e = jax.device_put(np.asarray(W0e))

    @jax.jit
    def gather(rows, B1, W0e):
        w = jnp.arange(NW, dtype=jnp.int32)
        j = w - W0e
        flat = jnp.clip(B1 * ROWW + jnp.clip(j, 0, ROWW - 1), 0, NBLK * ROWW - 1)
        return jnp.where((j >= 0) & (j < ROWW), rows.reshape(-1)[flat], jnp.uint32(0))

    words = gather(stage["rows"], B1, W0e)
    words = jax.device_put(np.asarray(words))

    @jax.jit
    def patch(words, p_s, p_clen, p_q, p_u, p_live):
        first_word = p_s >> 5

        def code_word(t):
            base = (first_word + t) << 5
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

        contribs = jnp.stack([code_word(t) for t in range(PATCH_WORDS)])
        tgts = jnp.where(
            p_live[None, :] & (contribs != 0),
            first_word[None, :] + jnp.arange(PATCH_WORDS, dtype=p_s.dtype)[:, None],
            NW,
        )
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(words, jnp.int32)
            .at[tgts.reshape(-1)]
            .add(contribs.reshape(-1), mode="drop"),
            jnp.uint32,
        )

    @jax.jit
    def swap(words):
        return ((words >> 24) | ((words >> 8) & jnp.uint32(0x0000FF00))
                | ((words << 8) & jnp.uint32(0x00FF0000)) | (words << 24))

    t_seed = tm(seeds, stage["rows"], stage["W0_pos"], stage["db"], stage["dw"])
    t_gath = tm(gather, stage["rows"], B1, W0e)
    t_pat = tm(patch, words, stage["p_s"], stage["p_clen"], stage["p_q"],
               stage["p_u"], stage["p_live"])
    t_swap = tm(swap, words)
    t_full = tm(lambda: blockspread.pack_stage2(NW=NW, **stage))
    print(f"seeds  {t_seed*1e3:7.1f} ms")
    print(f"gather {t_gath*1e3:7.1f} ms")
    print(f"patch  {t_pat*1e3:7.1f} ms")
    print(f"swap   {t_swap*1e3:7.1f} ms")
    print(f"full   {t_full*1e3:7.1f} ms")

    # --- gather granularity primitives, same output volume ---
    src = jax.device_put(rng.integers(0, 1 << 32, (NBLK * ROWW,), np.uint64).astype(np.uint32))
    for gran in (1, 2, 4, 8):
        n = NW // gran
        idx = jax.device_put(np.sort(rng.integers(0, NBLK * ROWW // gran - 1, n)).astype(np.int32))

        @jax.jit
        def g(src, idx, gran=gran, n=n):
            return jnp.take(src.reshape(-1, gran), idx, axis=0)

        print(f"g_x{gran}   {tm(g, src, idx)*1e3:7.1f} ms  ({n} indices)")


def scatter_bench():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
    )
    rng = np.random.default_rng(1)
    NBLK, NU = 330960, 524288
    rows = jax.device_put(
        rng.integers(0, 1 << 32, (NBLK, 6, 8), np.uint64).astype(np.uint32))
    uw0 = jax.device_put(np.sort(rng.integers(0, NU - 8, NBLK)).astype(np.int32))

    def tm(fn, *args, reps=10):
        o = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
        t0 = time.time()
        outs = [fn(*args) for _ in range(reps)]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0].ravel()[:1])
        return (time.time() - t0) / reps

    @jax.jit
    def six_rounds(rows, uw0):
        units = jnp.zeros((NU, 8), jnp.uint32)
        for r in range(6):
            units = units.at[uw0 + r].add(
                rows[:, r, :], mode="drop", indices_are_sorted=True)
        return units

    @jax.jit
    def one_round(rows, uw0):
        return jnp.zeros((NU, 8), jnp.uint32).at[uw0].add(
            rows[:, 0, :], mode="drop", indices_are_sorted=True)

    @jax.jit
    def fused(rows, uw0):
        idx = (uw0[:, None] + jnp.arange(6, dtype=jnp.int32)[None, :]).reshape(-1)
        return jnp.zeros((NU, 8), jnp.uint32).at[idx].add(
            rows.reshape(-1, 8), mode="drop")
    print(f"scatter6  {tm(six_rounds, rows, uw0)*1e3:7.1f} ms")
    print(f"scatter1  {tm(one_round, rows, uw0)*1e3:7.1f} ms")
    print(f"scatterF  {tm(fused, rows, uw0)*1e3:7.1f} ms")


if __name__ == "__main__":
    if "scatter" in sys.argv[1:]:
        scatter_bench()
    else:
        main()
