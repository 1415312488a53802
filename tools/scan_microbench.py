#!/usr/bin/env python
"""Time each device program of the bulk pipelines in isolation (real TPU).

Separates upload / compute / download per program so the slow stage is
unambiguous. Shapes mirror one bench chunk: 4 files x 60 s stereo
(F=240 1-s frames, L=480 lanes, S=44100).
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            str(pathlib.Path(__file__).parent.parent / ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from flo_tpu.ops import lpc, ricepack, riceunpack, wirecodec
    from flo_tpu.core import rice_host

    print("platform:", jax.devices()[0].platform, flush=True)

    rng = np.random.default_rng(0)
    L, S = 480, 44100
    # tonal-ish residuals, k ~ 4
    res = (rng.integers(-40, 40, (L, S))).astype(np.int32)
    ks = np.full(L, 4, np.int32)
    nvalid = np.full(L, S, np.int32)
    blobs = rice_host.encode_batch(res, ks, nvalid.astype(np.int64))
    sizes = np.array([len(b) for b in blobs], np.int64)
    offs = np.zeros(L, np.int64)
    np.cumsum(sizes[:-1], out=offs[1:])
    total = int(offs[-1] + sizes[-1])
    buf = np.zeros(total + riceunpack.PAD_BYTES, np.uint8)
    buf[:total] = np.frombuffer(b"".join(blobs), np.uint8)
    print(f"packed {total/1e6:.1f} MB for {L}x{S} codes", flush=True)

    def force(out):
        # block_until_ready is a no-op under the axon tunnel backend; a real
        # 4-byte download is the only reliable execution barrier.
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf.ravel()[:1])

    def timeit(label, fn, reps=3):
        out = fn()
        force(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn()
            force(out)
        dt = (time.time() - t0) / reps
        print(f"  {label:42s} {dt*1e3:9.1f} ms", flush=True)
        return out

    buf_d = jax.device_put(buf)
    bs_d = jax.device_put((offs * 8).astype(np.int32))
    k_d = jax.device_put(ks)
    nv_d = jax.device_put(nvalid)
    jax.block_until_ready((buf_d, bs_d))

    import functools
    unpack = jax.jit(functools.partial(riceunpack.unpack_lanes, S=S))
    timeit("riceunpack.unpack_lanes (44100-step scan)", lambda: unpack(buf_d, bs_d, k_d, nv_d))

    rows_d = jax.device_put(res)
    coeffs = np.zeros((L, lpc.MAX_ORDER), np.int32)
    shifts = np.zeros(L, np.int32)
    orders = np.zeros(L, np.int32)
    fixed = np.zeros(L, bool)
    timeit(
        "lpc.reconstruct (44100-step scan, unroll=8)",
        lambda: lpc.reconstruct(rows_d, jnp.asarray(coeffs), jnp.asarray(shifts),
                                jnp.asarray(orders), jnp.asarray(fixed)),
    )

    pack = jax.jit(wirecodec.pack_pcm)
    timeit("wirecodec.pack_pcm (download pack)", lambda: pack(rows_d, nv_d))

    # ricepack direct (encode winner payload pack)
    raw_d = jax.device_put(np.zeros(L, bool))
    pk = jax.jit(ricepack.pack_lanes)
    timeit("ricepack.pack_lanes", lambda: pk(rows_d, k_d, nv_d, raw_d))

    # upload-direction unpack at lossy segmentation
    seg = 1 << 15
    Lc, W = 16, 2646016  # 16 lanes x ~60 s padded
    rows2 = (3000 * np.sin(np.arange(W) * 0.01)[None, :]).astype(np.int32).repeat(Lc, 0)
    rows2 += rng.integers(-30, 30, rows2.shape).astype(np.int32)
    nseg = -(-W // seg)
    pad_w = nseg * seg
    rows2p = np.zeros((Lc, pad_w), np.int32)
    rows2p[:, :W] = rows2
    segnv = np.full(Lc * nseg, seg, np.int32)
    b2, bs2, k2, m2 = wirecodec.pack_pcm_host(rows2p.reshape(Lc * nseg, seg), segnv.astype(np.int64))
    up = jax.jit(functools.partial(wirecodec.unpack_pcm_device, S=seg))
    b2_d, bs2_d, k2_d, m2_d, nv2_d = map(jax.device_put, (b2, bs2, k2, m2.astype(np.int32), segnv))
    jax.block_until_ready(b2_d)
    timeit(f"unpack_pcm_device seg=32768 ({Lc*nseg} lanes)", lambda: up(b2_d, bs2_d, k2_d, m2_d, nv2_d))


if __name__ == "__main__":
    main()
