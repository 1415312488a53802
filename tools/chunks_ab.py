#!/usr/bin/env python
"""A/B PIPELINE_CHUNKS (lossless encoder) under the overlapped headline pass.

VERDICT r2 weak #3: commit b07e80c recorded '2 chunks' as the standing
decision but the lossless encoder was left at 4. This measures the real
headline pass (bench.py pass_once) at both settings and prints medians.
Run on the TPU host after bench.py has warmed the compile cache.
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
PASSES = 4


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from flo_tpu.container import reader as _reader
    from flo_tpu.lossless import decoder as lld
    from flo_tpu.lossless import encoder as lle
    from flo_tpu.lossy import decoder as lod
    from flo_tpu.lossy import encoder as loe
    from flo_tpu.lossy.presets import QUALITY_U8_TO_F32

    print("device:", jax.devices()[0], flush=True)
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
        h_lld.result(), h_lod.result()

    audio = BATCH_FILES * WORKLOAD_SECONDS * 4
    for chunks in (4, 2, 4, 2):  # interleave to cancel tunnel drift
        lle.PIPELINE_CHUNKS = chunks
        pass_once()  # warmup/compile for this chunking
        laps = []
        for _ in range(PASSES):
            t0 = time.time()
            pass_once()
            laps.append(time.time() - t0)
        med = sorted(laps)[len(laps) // 2]
        print(
            f"PIPELINE_CHUNKS={chunks}: median {med:.1f}s "
            f"({audio/med:.1f} au-s/s)  laps={[round(x,1) for x in laps]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
