#!/usr/bin/env python
"""Kernel-only microbench for the Pallas LPC reconstruction scan.

Reproduces the docs/tpu-architecture.md "reconstruction recurrence" number:
[960, 44100] int32 lanes (= 8 minutes of 44.1 kHz stereo audio, 480
audio-seconds), device-resident input and output, steady state. This is the
KERNEL-ONLY figure — no wire unpack/pack around it; the driver's
`device_reconstruct` bench config (bench.py) wraps the same kernel with
device-resident I/O at the production batch geometry and reads lower.

Run on the TPU host:  python tools/reconstruct_microbench.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    import jax

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    from flo_tpu.ops import lpc

    recon = jax.jit(lpc.reconstruct_best)
    rng = np.random.default_rng(1)
    for L in (240, 960):
        S = 44100
        audio_secs = L * S / 44100 / 2  # lanes are channels: stereo halves it
        lanes = rng.integers(-30000, 30000, (L, S)).astype(np.int32)
        coeffs = np.zeros((L, 12), np.int32)
        coeffs[:, :4] = rng.integers(-(1 << 12), 1 << 12, (L, 4)).astype(np.int32)
        shifts = jax.device_put(np.full(L, 12, np.int32), dev)
        orders = jax.device_put(np.full(L, 4, np.int32), dev)
        fixed = jax.device_put(np.zeros(L, bool), dev)
        d_lanes = jax.device_put(lanes, dev)
        d_coeffs = jax.device_put(coeffs, dev)

        t0 = time.time()
        r = recon(d_lanes, d_coeffs, shifts, orders, fixed)
        jax.block_until_ready(r)
        _ = np.asarray(r[:2, :8])  # device->host read: hard sync point
        print(f"compile+run [{L},{S}]: {time.time() - t0:.1f}s", flush=True)

        times = []
        for _ in range(5):
            t0 = time.time()
            r = recon(d_lanes, d_coeffs, shifts, orders, fixed)
            jax.block_until_ready(r)
            _ = np.asarray(r[:2, :8])
            times.append(time.time() - t0)
        best = min(times)
        print(
            f"hot [{L},{S}]: {best * 1e3:.1f} ms  -> "
            f"{audio_secs / best:,.0f}x realtime (kernel-only, {audio_secs:.0f} "
            f"stereo audio-sec/iter)",
            flush=True,
        )


if __name__ == "__main__":
    main()
