#!/usr/bin/env python
"""Generate an example .flo corpus (the Scripts/generate_examples.sh analog,
sox replaced by synthesized signals).

    python tools/generate_examples.py [out_dir]
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def tone(freqs, rate, seconds, amps=None):
    t = np.arange(int(rate * seconds)) / rate
    amps = amps or [0.5 / len(freqs)] * len(freqs)
    out = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps))
    return out.astype(np.float32)


def stereo(l, r):
    out = np.empty(2 * len(l), np.float32)
    out[0::2], out[1::2] = l, r
    return out


def main(out_dir: str = "examples_out") -> None:
    import flo_tpu
    from flo_tpu import batch

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rate = 44100
    rng = np.random.default_rng(7)

    chord = stereo(
        tone([261.63, 329.63, 392.0], rate, 2.0, [0.25, 0.2, 0.2]),
        tone([261.63, 329.63, 392.0], rate, 2.0, [0.2, 0.25, 0.2]),
    )
    sine = tone([440.0], rate, 2.0, [0.5])
    sweep_t = np.arange(rate * 2) / rate
    sweep = (0.5 * np.sin(2 * np.pi * (20 * (1000.0 ** (sweep_t / 2.0))) * sweep_t)).astype(
        np.float32
    )
    noise = (0.3 * rng.standard_normal(rate)).clip(-1, 1).astype(np.float32)
    silence = np.zeros(rate, np.float32)

    jobs = {
        "sine_440hz_mono.flo": (sine, 1, None),
        "chord_cmajor_stereo.flo": (chord, 2, None),
        "sweep_20_20k.flo": (sweep, 1, None),
        "white_noise.flo": (noise, 1, None),
        "silence_1sec.flo": (silence, 1, None),
    }
    for name, (samples, ch, _) in jobs.items():
        data = flo_tpu.encode(samples, rate, ch)
        (out / name).write_bytes(data)
        print(f"{name}: {len(data)} bytes")

    for q, label in [(0, "low"), (1, "medium"), (2, "high"), (3, "veryhigh"), (4, "transparent")]:
        data = flo_tpu.encode_lossy(chord, rate, 2, q)
        (out / f"lossy_chord_{label}.flo").write_bytes(data)
        print(f"lossy_chord_{label}.flo: {len(data)} bytes")

    # Validate everything we wrote.
    blobs = [p.read_bytes() for p in sorted(out.glob("*.flo"))]
    assert all(flo_tpu.validate(b) for b in blobs)
    outs = batch.decode_many(blobs)
    assert all(np.isfinite(o).all() for o in outs)
    print(f"OK: {len(blobs)} files validate and decode")


if __name__ == "__main__":
    main(*sys.argv[1:])
