#!/usr/bin/env python
"""Wire-ceiling audit: measured bytes per headline pass per direction.

Instruments the actual bulk pipelines (bench.py's headline pass) by wrapping
the upload entry point (jnp.asarray / device_put on numpy arrays) and every
download fetch helper, then reports per-direction byte totals alongside the
measured pass wall time and the link's measured bandwidth — the numbers
behind docs/tpu-architecture.md's wire-ceiling analysis (VERDICT #7).

Run on the TPU host: python tools/wire_audit.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

WORKLOAD_SECONDS = 60
BATCH_FILES = 8
RATE = 44100
CHANNELS = 2


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)

    # ---- link bandwidth probes (8 MB transfers, 3 reps each) ----
    probe = np.random.default_rng(0).integers(-2**31, 2**31 - 1, 2 * 1024 * 1024, dtype=np.int64).astype(np.int32)
    ups, downs = [], []
    for _ in range(3):
        t0 = time.time()
        d = jax.device_put(probe)
        np.asarray(d.ravel()[:1])
        ups.append(probe.nbytes / (time.time() - t0) / 1e6)
        t0 = time.time()
        _ = np.asarray(d)
        downs.append(probe.nbytes / (time.time() - t0) / 1e6)
    up_bw, down_bw = sorted(ups)[1], sorted(downs)[1]
    print(f"link: up {up_bw:.0f} MB/s   down {down_bw:.0f} MB/s (8 MB median)", flush=True)

    # ---- instrument uploads + downloads ----
    stats = {"up": 0, "down": 0, "up_calls": 0, "down_calls": 0}

    real_asarray = jnp.asarray

    def counting_asarray(x, *a, **k):
        if isinstance(x, np.ndarray):
            stats["up"] += x.nbytes
            stats["up_calls"] += 1
        return real_asarray(x, *a, **k)

    jnp.asarray = counting_asarray

    # Every download ultimately runs np.asarray on a jax array (fetch
    # helpers and small tables alike) — one global patch counts them all.
    real_np_asarray = np.asarray

    def counting_np_asarray(x, *a, **k):
        out = real_np_asarray(x, *a, **k)
        if type(x).__module__.startswith("jax"):
            stats["down"] += out.nbytes
            stats["down_calls"] += 1
        return out

    np.asarray = counting_np_asarray

    import flo_tpu  # noqa: F401
    from flo_tpu.container import reader as _reader
    from flo_tpu.lossless import decoder as lld
    from flo_tpu.lossless import encoder as lle
    from flo_tpu.lossy import decoder as lod
    from flo_tpu.lossy import encoder as loe
    from flo_tpu.lossy.presets import QUALITY_U8_TO_F32

    # ---- headline pass (bench.py pass_once) ----
    p = pathlib.Path("/root/reference/Examples/chord_cmajor_stereo.flo")
    base = lld.decode(p.read_bytes())
    need = WORKLOAD_SECONDS * RATE * 2
    tiled = np.tile(base, -(-need // len(base)))[:need]
    clips = [np.roll(tiled, i * 2 * RATE) for i in range(BATCH_FILES)]
    q_med = QUALITY_U8_TO_F32[1]

    def pass_once():
        h_ll = lle.encode_many_async(clips, RATE, CHANNELS, 16, 5)
        h_lo = loe.encode_many_async(clips, RATE, CHANNELS, q_med, transport_dtype="packed")
        d_ll = h_ll.result()
        h_lld = lld.decode_many_async([_reader.read(d) for d in d_ll])
        d_lo = h_lo.result()
        h_lod = lod.decode_many_async([_reader.read(d) for d in d_lo])
        return d_ll, h_lld.result(), d_lo, h_lod.result()

    pass_once()  # warmup/compile
    for key in stats:
        stats[key] = 0
    t0 = time.time()
    pass_once()
    wall = time.time() - t0

    up_mb, down_mb = stats["up"] / 1e6, stats["down"] / 1e6
    predicted = up_mb / up_bw + down_mb / down_bw
    audio = BATCH_FILES * WORKLOAD_SECONDS * 4
    print(
        f"pass: {wall:.1f}s wall  up {up_mb:.1f} MB ({stats['up_calls']} xfers)"
        f"  down {down_mb:.1f} MB ({stats['down_calls']} xfers)",
        flush=True,
    )
    print(
        f"wire-only predicted {predicted:.1f}s ({predicted/wall*100:.0f}% of wall)"
        f"   throughput {audio/wall:.0f} au-s/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
