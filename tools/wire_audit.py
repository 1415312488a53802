#!/usr/bin/env python
"""Measure wire bytes per headline pass per direction + tunnel bandwidth.

VERDICT r2 #7: pin the wire ceiling in writing. This instruments the three
funnels every bulk byte crosses (parallel.pipeline.put_batch/put_replicated
for uploads; ops.ricepack.fetch_prefix_start for bucketed payload downloads;
futures.start_host_copy for the small side arrays), runs the bench headline
pass once, and separately times raw device_put / device->host transfers to
estimate per-direction bandwidth. Output feeds docs/tpu-architecture.md.

Run on the TPU host with a warm compile cache (after bench.py).
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

WORKLOAD_SECONDS = 60
BATCH_FILES = 8
RATE = 44100


class Meter:
    def __init__(self):
        self.up = 0
        self.down_payload = 0
        self.down_small = 0
        self.in_fetch = False


METER = Meter()


def install():
    from flo_tpu import futures
    from flo_tpu.ops import ricepack
    from flo_tpu.parallel import pipeline as pp

    orig_pb, orig_pr = pp.put_batch, pp.put_replicated
    orig_fp = ricepack.fetch_prefix_start
    orig_shc = futures.start_host_copy

    def put_batch(x, mesh):
        METER.up += np.asarray(x).nbytes
        return orig_pb(x, mesh)

    def put_replicated(x, mesh):
        METER.up += np.asarray(x).nbytes
        return orig_pr(x, mesh)

    def fetch_prefix_start(arr, nelems):
        if nelems > 0:
            step = max(ricepack.PREFIX_BUCKET // max(arr.dtype.itemsize, 1), 1)
            n = min(-(-nelems // step) * step, arr.shape[0])
            METER.down_payload += n * arr.dtype.itemsize
        METER.in_fetch = True
        try:
            return orig_fp(arr, nelems)
        finally:
            METER.in_fetch = False

    def start_host_copy(*arrays):
        if not METER.in_fetch:
            for a in arrays:
                try:
                    METER.down_small += a.nbytes
                except Exception:
                    pass
        return orig_shc(*arrays)

    pp.put_batch = put_batch
    pp.put_replicated = put_replicated
    ricepack.fetch_prefix_start = fetch_prefix_start
    futures.start_host_copy = start_host_copy
    # Rebind call sites that did `from ..futures import start_host_copy`.
    import flo_tpu.lossless.decoder as lld

    lld.start_host_copy = start_host_copy


def barrier(x):
    """The only reliable execution barrier through this tunnel: download."""
    return np.asarray(x.ravel()[:1])


def measure_bandwidth():
    import jax

    out = {}
    rng = np.random.default_rng(0)
    incompressible = rng.integers(0, 256, 32 << 20, dtype=np.uint8)
    compressible = np.zeros(32 << 20, np.uint8)
    compressible[:: 64] = rng.integers(0, 256, (32 << 20) // 64, dtype=np.uint8)
    for name, buf in (("random", incompressible), ("sparse", compressible)):
        # Upload: device_put + barrier. Two reps, keep the best (stalls).
        ups, downs = [], []
        for _ in range(3):
            t0 = time.time()
            d = jax.device_put(buf)
            barrier(d)
            ups.append(time.time() - t0)
            t0 = time.time()
            h = np.asarray(d)
            downs.append(time.time() - t0)
            del d, h
        out[name] = {
            "up_MBps": round(len(buf) / (1 << 20) / min(ups), 1),
            "down_MBps": round(len(buf) / (1 << 20) / min(downs), 1),
            "up_s": [round(x, 2) for x in ups],
            "down_s": [round(x, 2) for x in downs],
        }
    return out


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)

    print("bandwidth probe (32 MB buffers):", flush=True)
    bw = measure_bandwidth()
    for k, v in bw.items():
        print(f"  {k}: up {v['up_MBps']} MB/s {v['up_s']}  down {v['down_MBps']} MB/s {v['down_s']}", flush=True)

    install()
    from flo_tpu.container import reader as _reader
    from flo_tpu.lossless import decoder as lld
    from flo_tpu.lossless import encoder as lle
    from flo_tpu.lossy import decoder as lod
    from flo_tpu.lossy import encoder as loe
    from flo_tpu.lossy.presets import QUALITY_U8_TO_F32

    p = pathlib.Path("/root/reference/Examples/chord_cmajor_stereo.flo")
    base = lld.decode(p.read_bytes())
    need = WORKLOAD_SECONDS * RATE * 2
    tiled = np.tile(base, -(-need // len(base)))[:need]
    clips = [np.roll(tiled, i * 2 * RATE) for i in range(BATCH_FILES)]
    q_med = QUALITY_U8_TO_F32[1]

    def pass_once():
        h_ll = lle.encode_many_async(clips, RATE, 2, 16, 5)
        h_lo = loe.encode_many_async(clips, RATE, 2, q_med, transport_dtype="packed")
        d_ll = h_ll.result()
        h_lld = lld.decode_many_async([_reader.read(d) for d in d_ll])
        d_lo = h_lo.result()
        h_lod = lod.decode_many_async([_reader.read(d) for d in d_lo])
        h_lld.result(), h_lod.result()

    pass_once()  # warmup / compile
    METER.up = METER.down_payload = METER.down_small = 0
    laps = []
    for _ in range(3):
        t0 = time.time()
        pass_once()
        laps.append(time.time() - t0)
    n = len(laps)
    up = METER.up / n / (1 << 20)
    dp = METER.down_payload / n / (1 << 20)
    ds = METER.down_small / n / (1 << 20)
    audio = BATCH_FILES * WORKLOAD_SECONDS * 4  # 2 codecs x enc+dec
    med = sorted(laps)[n // 2]
    print(f"\nheadline pass ({BATCH_FILES}x{WORKLOAD_SECONDS}s, lossless+lossy enc+dec):")
    print(f"  up       {up:8.1f} MB/pass")
    print(f"  down pay {dp:8.1f} MB/pass (bucketed payload downloads)")
    print(f"  down sml {ds:8.1f} MB/pass (side arrays via start_host_copy)")
    print(f"  observed median {med:.1f}s  ({audio/med:.1f} au-s/s)  laps={[round(x,1) for x in laps]}")
    up_bw = bw["random"]["up_MBps"]
    dn_bw = bw["random"]["down_MBps"]
    pred_serial = up / up_bw + (dp + ds) / dn_bw
    pred_duplex = max(up / up_bw, (dp + ds) / dn_bw)
    print(f"  predicted wire time: serial {pred_serial:.1f}s, full-duplex {pred_duplex:.1f}s "
          f"(at random-payload {up_bw}/{dn_bw} MB/s)")


if __name__ == "__main__":
    main()
