"""Seeded randomized round-trip fuzzing across rates/channels/levels/signals.

Deterministic (fixed seeds) so failures reproduce; every case asserts the
lossless bit-exactness contract end-to-end through the public API.
"""

import numpy as np
import pytest

import flo_tpu
from flo_tpu.container import reader
from flo_tpu.core.convert import f32_to_i32_np
from flo_tpu.lossless import decoder as lld

TOL = 1 / 32768 + 1e-6


def make_signal(rng, kind, n):
    t = np.arange(n)
    if kind == "tone":
        f = rng.uniform(0.001, 0.4)
        return (rng.uniform(0.1, 0.9) * np.sin(2 * np.pi * f * t)).astype(np.float32)
    if kind == "noise":
        return (rng.uniform(0.05, 0.8) * rng.standard_normal(n)).clip(-1, 1).astype(np.float32)
    if kind == "tone+noise":
        f = rng.uniform(0.001, 0.4)
        s = 0.5 * np.sin(2 * np.pi * f * t) + 0.05 * rng.standard_normal(n)
        return s.clip(-1, 1).astype(np.float32)
    if kind == "steps":
        levels = rng.uniform(-1, 1, 8).astype(np.float32)
        return np.repeat(levels, n // 8 + 1)[:n]
    if kind == "impulses":
        s = np.zeros(n, np.float32)
        idx = rng.integers(0, n, max(n // 100, 1))
        s[idx] = rng.uniform(-1, 1, len(idx)).astype(np.float32)
        return s
    raise ValueError(kind)


CASES = [
    (seed, rate, ch, level, kind)
    for seed, (rate, ch, level, kind) in enumerate(
        [
            (1000, 1, 0, "noise"),
            (1000, 2, 1, "tone"),
            (3001, 1, 2, "steps"),
            (4000, 2, 3, "tone+noise"),
            (5512, 1, 4, "impulses"),
            (8000, 2, 5, "tone+noise"),
            (11025, 1, 6, "noise"),
            (16000, 2, 7, "tone"),
            (22050, 1, 8, "tone+noise"),
            (2000, 2, 9, "impulses"),
        ]
    )
]


@pytest.mark.parametrize("seed,rate,ch,level,kind", CASES)
def test_lossless_fuzz_bit_exact(seed, rate, ch, level, kind):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(rate // 2, rate * 2 + 3))
    if ch == 2:
        l = make_signal(rng, kind, n)
        r = make_signal(rng, kind, n)
        s = np.empty(2 * n, np.float32)
        s[0::2], s[1::2] = l, r
    else:
        s = make_signal(rng, kind, n)
    data = flo_tpu.encode(s, rate, ch, compression_level=level, analyze=False)
    out = flo_tpu.decode(data)
    assert len(out) == n * ch
    assert np.abs(out - s).max() <= TOL
    # Integer-domain bit exactness.
    ints = lld.decode_file_i32(reader.read(data))
    np.testing.assert_array_equal(ints, f32_to_i32_np(s).reshape(-1, ch))
    assert flo_tpu.validate(data)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lossy_fuzz_envelope(seed):
    rng = np.random.default_rng(100 + seed)
    rate = int(rng.choice([22050, 32000, 44100]))
    n = int(rng.integers(rate // 2, rate))
    f = rng.uniform(100, 2000)
    s = (0.5 * np.sin(2 * np.pi * f * np.arange(n) / rate)).astype(np.float32)
    q = int(rng.integers(0, 5))
    data = flo_tpu.encode_lossy(s, rate, 1, q, analyze=False)
    out = flo_tpu.decode(data)
    m = min(len(out), n)
    snr = 10 * np.log10((s[:m] ** 2).sum() / max(((out[:m] - s[:m]) ** 2).sum(), 1e-30))
    assert snr > 10
    assert flo_tpu.validate(data)


@pytest.mark.parametrize("seed", [0, 1])
def test_streaming_fuzz(seed):
    from flo_tpu.streaming import StreamingDecoder

    rng = np.random.default_rng(200 + seed)
    rate = 2000
    n = int(rng.integers(rate, 3 * rate))
    s = make_signal(rng, "tone+noise", n)
    data = flo_tpu.encode(s, rate, 1, analyze=False)
    d = StreamingDecoder()
    outs = []
    pos = 0
    while pos < len(data):
        step = int(rng.integers(1, 400))
        d.feed(data[pos : pos + step])
        pos += step
        while (o := d.next_frame()) is not None:
            if o.size:
                outs.append(o)
    got = np.concatenate(outs)
    np.testing.assert_array_equal(got, flo_tpu.decode(data))
