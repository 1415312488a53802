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


def stream_encode_all():
    se = StreamingEncoder(RATE, CHANNELS)
    step = RATE // 4 * CHANNELS
    for i in range(0, len(audio), step):
        se.push_samples(audio[i : i + step])
        while se.next_frame() is not None:
            pass
    return se.flush()


stream_encode_all()  # warmup (native build, caches)
laps = []
for _ in range(5):
    t0 = time.time()
    stream_encode_all()
    laps.append(time.time() - t0)
print("streaming_encode laps:", [round(WORKLOAD_SECONDS / t, 1) for t in laps], "x realtime")

# Frame decomposition: where does one 1 s stereo frame go?
import cProfile, pstats, io
pr = cProfile.Profile()
pr.enable()
stream_encode_all()
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
print(s.getvalue())
