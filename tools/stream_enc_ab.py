#!/usr/bin/env python
"""Round-5 A/B for the streaming_encode r3->r4 regression (VERDICT Weak #3).

Times the exact bench.py streaming_encode workload (corpus chord tiled to
30 s stereo, 0.25 s pushes, native C++ candidate search) several times to
separate code from host weather, then decomposes a frame: candidate search
vs rice pack vs python state machine.
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import corpus_like_clips, make_audio, RATE, CHANNELS, WORKLOAD_SECONDS

from flo_tpu.streaming import StreamingEncoder

clips = corpus_like_clips(1, WORKLOAD_SECONDS)
audio = clips[0] if clips else make_audio(WORKLOAD_SECONDS, RATE, seed=7)


def stream_encode_bytes(prune: int) -> bytes:
    se = StreamingEncoder(RATE, CHANNELS)
    se.lpc_prune_topk = prune
    se.push_samples(audio)
    return se.finalize()


def stream_encode_all(prune: int):
    se = StreamingEncoder(RATE, CHANNELS)
    se.lpc_prune_topk = prune
    step = RATE // 4 * CHANNELS
    for i in range(0, len(audio), step):
        se.push_samples(audio[i : i + step])
        while se.next_frame() is not None:
            pass
    return se.flush()


stream_encode_all(0)  # warmup (native build, caches)
for prune in (0, 3, 2):
    laps = []
    for _ in range(5):
        t0 = time.time()
        stream_encode_all(prune)
        laps.append(time.time() - t0)
    print(f"streaming_encode prune={prune} laps:",
          [round(WORKLOAD_SECONDS / t, 1) for t in laps], "x realtime")

# Size + correctness impact of the prune: full-search vs top-3/top-2 file
# bytes on the same content, and bit-exact decode for every variant.
import flo_tpu  # noqa: E402

full = stream_encode_bytes(0)
dec_full = flo_tpu.decode(full)
for prune in (3, 2):
    b = stream_encode_bytes(prune)
    dec = flo_tpu.decode(b)
    assert np.array_equal(dec, dec_full), f"prune={prune} decode mismatch"
    print(f"prune={prune}: {len(b)} bytes vs full {len(full)} "
          f"({100 * (len(b) / len(full) - 1):+.3f}%), decode bit-exact")

# Frame decomposition: where does one 1 s stereo frame go?
import cProfile, pstats, io
pr = cProfile.Profile()
pr.enable()
stream_encode_all(0)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(12)
print(s.getvalue())
