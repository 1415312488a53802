#!/usr/bin/env python
"""Decompose the bench device_kernels steady state: dispatch enqueue cost,
size-array residency wait, stage-2 enqueue cost, force cadence."""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

RATE = 44100
F, C, S = 120, 2, RATE


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flo_tpu.ops.select import encode_select_device
    from flo_tpu.ops import blockspread
    from flo_tpu.futures import start_host_copy as _shc

    rng = np.random.default_rng(0)
    t = np.arange(F * S) / RATE
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

    def _force(out):
        return np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

    def dk_dispatch():
        out = encode_select_device(pcm_dev, nv_dev, kinds, orders)
        _shc(out[4], out[5])
        return out

    def dk_finish(out):
        stage, lane_bytes_d, lane_off_d = out[3], out[4], out[5]
        t0 = time.time()
        lane_bytes = np.asarray(lane_bytes_d).astype(np.int64)
        tb = time.time() - t0
        lane_off = np.asarray(lane_off_d).astype(np.int64)
        t_sizes = time.time() - t0
        print(f"    [sizes: bytes={tb*1e3:6.1f} off={(t_sizes-tb)*1e3:6.1f} ms]")
        total = int(lane_off[-1] + ((lane_bytes[-1] + 3) // 4) * 4)
        NW = blockspread.bucket_words(total // 4)
        t0 = time.time()
        w = blockspread.pack_stage2(NW=NW, **stage)
        t_enq2 = time.time() - t0
        return w, t_sizes, t_enq2

    # compile
    _force(dk_finish(dk_dispatch())[0])
    # steady state, 3-deep
    depth, reps = 3, 8
    states = [dk_dispatch() for _ in range(depth)]
    words = []
    t_disp = t_sz = t_e2 = t_fc = 0.0
    t0 = time.time()
    for _ in range(reps):
        ta = time.time()
        states.append(dk_dispatch())
        t_disp += time.time() - ta
        w, a, b = dk_finish(states.pop(0))
        t_sz += a
        t_e2 += b
        words.append(w)
        if len(words) > depth:
            ta = time.time()
            _force(words.pop(0))
            t_fc += time.time() - ta
    for w in words:
        _force(w)
    dt = (time.time() - t0) / reps
    print(f"steady {dt*1e3:7.1f} ms/pass -> {120/dt:7.0f}x realtime")
    print(f"  dispatch-enqueue {t_disp/reps*1e3:7.1f} ms")
    print(f"  size-wait        {t_sz/reps*1e3:7.1f} ms")
    print(f"  stage2-enqueue   {t_e2/reps*1e3:7.1f} ms")
    print(f"  force-wait       {t_fc/reps*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
