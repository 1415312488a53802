#!/usr/bin/env python
"""Measure the primitives for the block-spread Rice packer redesign.

  rowscatter   lax.scatter_add of [330k, 34] u32 row windows into [5.3M]
  rowscat64    same with 165k x 66 rows
  spread       dense within-block spread [330k, 32 codes, 34 words]
  blkcumsum    within-block exclusive cumsum of clen via shifted adds
  rowgather    lax.gather of [330k, 34] windows (for completeness)
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

L, S = 240, 44100
BLKC = 32
NBLK = L * (-(-S // BLKC))  # 331,200
NW = 5292256


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    print(f"device: {dev}  NBLK={NBLK}", flush=True)

    rng = np.random.default_rng(0)
    rows = rng.integers(0, 2**31, (NBLK, 34), dtype=np.int64).astype(np.uint32)
    # Sorted block word starts ~ realistic spacing (avg ~11 words/block).
    starts = np.sort(rng.integers(0, NW - 40, NBLK, dtype=np.int32))
    d_rows = jax.device_put(rows, dev)
    d_starts = jax.device_put(starts, dev)

    def _force(out):
        return np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

    def timeit(name, fn, reps=5):
        t0 = time.time()
        _force(fn())
        print(f"{name:10s} compile+run {time.time()-t0:7.1f} s", flush=True)
        t0 = time.time()
        for _ in range(reps):
            _force(fn())
        print(f"{name:10s} hot {(time.time()-t0)/reps*1e3:8.1f} ms", flush=True)

    from jax.lax import GatherDimensionNumbers, ScatterDimensionNumbers

    def rowscatter(ops_shape, upd, idx):
        dnums = ScatterDimensionNumbers(
            update_window_dims=(1,),
            inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,),
        )
        return jax.lax.scatter_add(
            jnp.zeros(ops_shape, jnp.uint32),
            idx[:, None],
            upd,
            dnums,
            indices_are_sorted=True,
            unique_indices=False,
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    timeit(
        "rowscatter",
        lambda: jax.jit(lambda u, i: rowscatter((NW,), u, i))(d_rows, d_starts),
    )

    rows64 = rng.integers(0, 2**31, (NBLK // 2, 66), dtype=np.int64).astype(np.uint32)
    starts64 = np.sort(rng.integers(0, NW - 70, NBLK // 2, dtype=np.int32))
    d_rows64 = jax.device_put(rows64, dev)
    d_starts64 = jax.device_put(starts64, dev)
    timeit(
        "rowscat64",
        lambda: jax.jit(lambda u, i: rowscatter((NW,), u, i))(d_rows64, d_starts64),
    )

    # Dense within-block spread: out[blk, j] = sum_c where(wi==j, a, 0)
    #                                        + where(wi==j-1, b, 0)
    wi = np.sort(rng.integers(0, 33, (NBLK, BLKC), dtype=np.int32), axis=1)
    a = rng.integers(0, 2**31, (NBLK, BLKC), dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, 2**31, (NBLK, BLKC), dtype=np.int64).astype(np.uint32)
    d_wi, d_a, d_b = map(lambda x: jax.device_put(x, dev), (wi, a, b))

    @jax.jit
    def spread(wi, a, b):
        j = jnp.arange(34, dtype=jnp.int32)
        eq = wi[:, :, None] == j[None, None, :]
        eq1 = wi[:, :, None] == (j - 1)[None, None, :]
        return jnp.sum(
            jnp.where(eq, a[:, :, None], jnp.uint32(0))
            + jnp.where(eq1, b[:, :, None], jnp.uint32(0)),
            axis=1,
        )

    timeit("spread", lambda: spread(d_wi, d_a, d_b))

    clen = jax.device_put(
        rng.integers(1, 20, (NBLK, BLKC), dtype=np.int32), dev
    )

    @jax.jit
    def blkcumsum(c):
        x = c
        for sh in (1, 2, 4, 8, 16):
            x = x + jnp.pad(x, ((0, 0), (sh, 0)))[:, :BLKC]
        return x - c  # exclusive

    timeit("blkcumsum", lambda: blkcumsum(clen))

    def rowgather(src, idx):
        dnums = GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
        )
        return jax.lax.gather(
            src, idx[:, None], dnums, slice_sizes=(34,),
            indices_are_sorted=True, mode=jax.lax.GatherScatterMode.CLIP,
        )

    big = jax.device_put(
        rng.integers(0, 2**31, NW, dtype=np.int64).astype(np.uint32), dev
    )
    timeit(
        "rowgather",
        lambda: jax.jit(rowgather)(big, d_starts),
    )


if __name__ == "__main__":
    main()
