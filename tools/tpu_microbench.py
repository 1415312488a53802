#!/usr/bin/env python
"""TPU microbenchmarks: transfer bandwidth, dispatch latency, stage timings.

Run manually on the TPU host to guide optimization:
    python tools/tpu_microbench.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # Dispatch latency: tiny op round trip.
    x = jax.device_put(np.zeros((8, 128), np.float32), dev)
    f = jax.jit(lambda a: a + 1)
    jax.block_until_ready(f(x))
    t0 = time.time()
    n = 50
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(x)
    print(f"dispatch+tiny-op: {(time.time()-t0)/n*1e3:.2f} ms/call", flush=True)

    # Host->device and device->host bandwidth.
    for mb in (1, 16, 64):
        a = np.random.default_rng(0).integers(-1000, 1000, (mb * 262144,), np.int32)
        t0 = time.time()
        d = jax.device_put(a, dev)
        jax.block_until_ready(d)
        up = mb / (time.time() - t0)
        t0 = time.time()
        _ = np.asarray(d)
        down = mb / (time.time() - t0)
        print(f"{mb:3d} MB: up {up:7.1f} MB/s   down {down:7.1f} MB/s", flush=True)

    # Stage timings on a 2x60s-equivalent lane batch.
    from flo_tpu.ops import lpc, mdct

    L, S = 240, 44100
    lanes = np.random.default_rng(1).integers(-30000, 30000, (L, S)).astype(np.int32)
    coeffs = np.zeros((L, 12), np.int32)
    coeffs[:, 0] = 1 << 10
    shifts = np.full(L, 10, np.int32)
    orders = np.ones(L, np.int32)
    fixed = np.zeros(L, bool)

    try:
        d_lanes = jax.device_put(lanes, dev)
        t0 = time.time()
        r = lpc.reconstruct(d_lanes, coeffs, shifts, orders, fixed)
        jax.block_until_ready(r)
        print(f"reconstruct compile+run [{L},{S}]: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        r = lpc.reconstruct(d_lanes, coeffs, shifts, orders, fixed)
        jax.block_until_ready(r)
        print(f"reconstruct hot [{L},{S}]: {time.time()-t0:.2f}s", flush=True)
    except Exception as e:
        print("reconstruct failed:", e, flush=True)

    try:
        blocks = np.random.default_rng(2).standard_normal((4, 2590, 2048)).astype(np.float32)
        d_blocks = jax.device_put(blocks, dev)
        t0 = time.time()
        c = mdct.forward(d_blocks)
        jax.block_until_ready(c)
        print(f"mdct fwd compile+run [4,2590,2048]: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        c = mdct.forward(d_blocks)
        jax.block_until_ready(c)
        print(f"mdct fwd hot: {time.time()-t0:.2f}s", flush=True)
    except Exception as e:
        print("mdct failed:", e, flush=True)


if __name__ == "__main__":
    main()
