#!/usr/bin/env python
"""TPU timing of the two-phase select+pack flow (bench.py device_kernels)."""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

F, C, S = 120, 2, 44100
RATE = 44100


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from flo_tpu.ops import blockspread
    from flo_tpu.ops.select import encode_select_device

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    audio_sec = F * S / RATE

    rng = np.random.default_rng(0)
    t = np.arange(F * S) / RATE
    sig = 20000 * np.sin(2 * np.pi * 261.6 * t) + 6000 * np.sin(2 * np.pi * 329.6 * t)
    sig += 300 * rng.standard_normal(sig.shape)
    pcm = np.stack(
        [sig.astype(np.int16), np.roll(sig, 7).astype(np.int16)], axis=1
    ).reshape(F, S, C).transpose(0, 2, 1)
    pcm_dev = jax.device_put(np.ascontiguousarray(pcm), dev)
    nv_dev = jax.device_put(np.full(F, S, np.int32), dev)

    kinds = ("raw", "fixed", "fixed", "fixed", "fixed", "fixed",
             "lpc", "lpc", "lpc", "lpc")
    orders = (0, 0, 1, 2, 3, 4, 5, 6, 7, 8)

    def _force(out):
        return np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

    def select_and_pack():
        out = encode_select_device(pcm_dev, nv_dev, kinds, orders)
        stage, lane_bytes_d, lane_off_d = out[3], out[4], out[5]
        lane_bytes = np.asarray(lane_bytes_d).astype(np.int64)
        lane_off = np.asarray(lane_off_d).astype(np.int64)
        total = int(lane_off[-1] + ((lane_bytes[-1] + 3) // 4) * 4)
        NW = blockspread.bucket_words(total // 4)
        return blockspread.pack_stage2(NW=NW, **stage), total

    t0 = time.time()
    w, total = select_and_pack()
    _force(w)
    print(f"compile+run {time.time()-t0:.1f} s  payload {total/1e6:.1f} MB", flush=True)

    for reps in (5,):
        t0 = time.time()
        for _ in range(reps):
            w, _ = select_and_pack()
            _force(w)
        dt = (time.time() - t0) / reps
        print(f"two-phase hot {dt*1e3:8.1f} ms -> {audio_sec/dt:7.0f} au-s/s", flush=True)

    # Stage-1 only (fused search + spread)
    t0 = time.time()
    out = encode_select_device(pcm_dev, nv_dev, kinds, orders)
    _force(out[4])
    print(f"stage1 compile+run {time.time()-t0:.1f} s", flush=True)
    t0 = time.time()
    for _ in range(5):
        out = encode_select_device(pcm_dev, nv_dev, kinds, orders)
        _force(out[4])
    dt1 = (time.time() - t0) / 5
    print(f"stage1 hot {dt1*1e3:8.1f} ms -> {audio_sec/dt1:7.0f} au-s/s", flush=True)

    # 2-deep pipelined steady state: the next chunk's stage 1 is dispatched
    # BEFORE this chunk's size download, so the device never idles during
    # the inter-phase round trip — exactly how _start_chunk_fetch's phase-1
    # loop overlaps chunks in the production bulk pipeline.
    def finish_pack(out):
        stage, lane_bytes_d, lane_off_d = out[3], out[4], out[5]
        lane_bytes = np.asarray(lane_bytes_d).astype(np.int64)
        lane_off = np.asarray(lane_off_d).astype(np.int64)
        total = int(lane_off[-1] + ((lane_bytes[-1] + 3) // 4) * 4)
        NW = blockspread.bucket_words(total // 4)
        return blockspread.pack_stage2(NW=NW, **stage)

    def s1():
        return encode_select_device(pcm_dev, nv_dev, kinds, orders)

    states = [s1()]
    prev_words = None
    reps = 6
    t0 = time.time()
    for _ in range(reps):
        states.append(s1())
        words = finish_pack(states.pop(0))
        if prev_words is not None:
            _force(prev_words)
        prev_words = words
    _force(prev_words)
    dt = (time.time() - t0) / reps
    print(f"pipelined2   {dt*1e3:8.1f} ms -> {audio_sec/dt:7.0f} au-s/s", flush=True)


if __name__ == "__main__":
    main()
