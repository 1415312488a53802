#!/usr/bin/env python
"""Decompose the bench device_kernels steady state (single-phase pack):
dispatch enqueue cost, lane-size readback stall, force cadence.

Since the worst-case-bucket fuse (ops/select._transport_outputs) the whole
search + pack is ONE dispatch; the only per-pass reads left are the lane
sizes (production needs them to size the payload fetch) and the execution
barrier. Every device->host read stalls the device stream ~15 ms through
the axon tunnel (zero-read vs one-read A/B), so the steady states with and
without the size readback bracket the production chunk cadence."""
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

    _force(dk_dispatch()[3])  # compile

    audio_sec = F * S / RATE
    reps = 8

    # A: pure kernel cadence (no per-pass reads, force last words).
    t0 = time.time()
    outs = [dk_dispatch() for _ in range(reps)]
    _force(outs[-1][3])
    dt = (time.time() - t0) / reps
    print(f"no-read   {dt*1e3:7.1f} ms/pass -> {audio_sec/dt:7.0f}x realtime")

    # B: + per-pass size readback (the production fetch-sizing read).
    t0 = time.time()
    t_sz = 0.0
    outs = []
    for _ in range(reps):
        outs.append(dk_dispatch())
        if len(outs) > 3:
            o = outs.pop(0)
            ta = time.time()
            np.asarray(o[4]); np.asarray(o[5])
            t_sz += time.time() - ta
    for o in outs:
        np.asarray(o[4]); np.asarray(o[5])
    dt = (time.time() - t0) / reps
    print(f"with-size {dt*1e3:7.1f} ms/pass -> {audio_sec/dt:7.0f}x realtime"
          f"   (size-read wait {t_sz/reps*1e3:5.1f} ms/pass)")


if __name__ == "__main__":
    main()
