#!/usr/bin/env python
"""Microbench assembly primitives for the gather-based stage-2 redesign,
with RTT-free chained timing: each candidate runs R iterations inside ONE
jit (inputs perturbed per-iteration so nothing is CSE'd; outputs folded
into a scalar carry so nothing is DCE'd). Per-iter time = (total - base)/R
where `base` times the same loop with the op replaced by the fold only.

Geometry matches the bench headline (NW payload words, NBLK blocks).

  word    per-word flat gather, NW indices (current production)
  align2  two aligned 8-row gathers + 8-way static-shift select
  g_x8    aligned 8-row gather, NW/8 indices
  scat8   8-word-row scatter-add, NBLK indices
  useed   unit-granularity seed scatter + cumsum (NU domain)
  wseed   word-granularity seeds + 2 cumsums (NW domain, current)
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

NW = 4194304
NBLK = 330960
ROWW = 34
PADW = 48
R = 16


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    rng = np.random.default_rng(0)
    NU = NW // 8

    rows = jax.device_put(
        rng.integers(0, 1 << 32, (NBLK, PADW), np.uint64).astype(np.uint32))
    B1 = jax.device_put(np.sort(rng.integers(0, NBLK, NW)).astype(np.int32))
    bFirst = jax.device_put(np.sort(rng.integers(0, NBLK, NU)).astype(np.int32))
    offs = jax.device_put(rng.integers(0, 41, NU).astype(np.int32))
    W0e = jax.device_put(np.sort(rng.integers(0, NW, NW)).astype(np.int32))
    posu = jax.device_put(np.sort(rng.integers(0, NU, NBLK)).astype(np.int32))
    db = jax.device_put(rng.integers(0, 3, NBLK).astype(np.int32))
    rrows = jax.device_put(
        rng.integers(0, 1 << 32, (NBLK, 8), np.uint64).astype(np.uint32))

    def chain(op):
        """Time R chained iterations of op(i) inside one jit."""

        @jax.jit
        def run():
            def body(i, c):
                return c + jnp.sum(op(i).astype(jnp.uint32), dtype=jnp.uint32)

            return jax.lax.fori_loop(0, R, body, jnp.uint32(0))

        np.asarray(run())  # compile + warm
        t0 = time.time()
        o = run()
        np.asarray(o)
        return (time.time() - t0) / R

    base = chain(lambda i: jnp.zeros((8,), jnp.uint32) + i)

    def word_op(i):
        w = jnp.arange(NW, dtype=jnp.int32)
        j = w - W0e + i
        flat = jnp.clip(B1 * ROWW + jnp.clip(j, 0, ROWW - 1), 0, NBLK * ROWW - 1)
        return jnp.where((j >= 0) & (j < ROWW), rows[:, :ROWW].reshape(-1)[flat], jnp.uint32(0))

    def align2_op(i):
        r6 = rows.reshape(NBLK * (PADW // 8), 8)
        base_i = bFirst * (PADW // 8) + ((offs + i) >> 3)
        left = jnp.take(r6, jnp.clip(base_i, 0, r6.shape[0] - 1), axis=0)
        right = jnp.take(r6, jnp.clip(base_i + 1, 0, r6.shape[0] - 1), axis=0)
        cat = jnp.concatenate([left, right], axis=1)
        s = ((offs + i) & 7)[:, None]
        out = jnp.zeros((NU, 8), jnp.uint32)
        for sh in range(8):
            out = jnp.where(s == sh, jax.lax.dynamic_slice_in_dim(cat, sh, 8, axis=1), out)
        return out

    def gx8_op(i):
        idx = jnp.clip(bFirst + i, 0, NBLK * (PADW // 8) - 1)
        return jnp.take(rows.reshape(-1, 8)[: NBLK * 4], idx, axis=0)

    def scat8_op(i):
        return jnp.zeros((NU, 8), jnp.uint32).at[jnp.clip(posu + i, 0, NU - 1)].add(
            rrows, mode="drop", indices_are_sorted=True)

    def useed_op(i):
        seed = jnp.zeros((NU,), jnp.int32).at[jnp.clip(posu + i, 0, NU - 1)].add(
            db, mode="drop", indices_are_sorted=True)
        return jnp.cumsum(seed)

    def wseed_op(i):
        pos = jnp.clip(posu * 8 + i, 0, NW - 1)
        sB = jnp.zeros((NW,), jnp.int32).at[pos].add(db, mode="drop", indices_are_sorted=True)
        sW = jnp.zeros((NW,), jnp.int32).at[pos].add(db + 1, mode="drop", indices_are_sorted=True)
        return jnp.cumsum(sB) + jnp.cumsum(sW)

    print(f"base    {base*1e3:7.2f} ms")
    for name, op in [("word", word_op), ("align2", align2_op), ("g_x8", gx8_op),
                     ("scat8", scat8_op), ("useed", useed_op), ("wseed", wseed_op)]:
        t = chain(op)
        print(f"{name:7s} {max(t-base,0)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
