"""Lossless decoder: device scan vs a direct-transliteration oracle.

The oracle implements the reference decoder semantics (decoder.rs:92-273) in
plain python/numpy int64 — slow but indisputable. The batched device kernel
must match it sample-for-sample on the real corpus and on synthetic lanes.
"""

import numpy as np
import pytest

from flo_tpu.container import reader
from flo_tpu.core import rice_host
from flo_tpu.core.constants import FrameType
from flo_tpu.lossless import decoder as lossless_decoder


# --- oracle (reference semantics, per channel) ------------------------------

def _oracle_reconstruct_lpc(coeffs, residuals, shift, target_len):
    order = len(coeffs)
    n = min(target_len, len(residuals))
    out = list(residuals[: min(order, n)])
    for i in range(order, n):
        pred = 0
        for j in range(order):
            pred += int(coeffs[j]) * int(out[i - j - 1])
        out.append(((pred >> shift) + int(residuals[i])) % 2**32)
        out[-1] = out[-1] - 2**32 if out[-1] >= 2**31 else out[-1]
    out += [0] * (target_len - len(out))
    return np.array(out, dtype=np.int64)


_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _oracle_reconstruct_fixed(order, residuals, target_len):
    if order not in _FIXED or order == 0:
        out = list(residuals)
    else:
        out = []
        n = min(len(residuals), target_len)
        for i in range(n):
            eff = _FIXED[min(i, order)]
            pred = 0
            for j, c in enumerate(eff):
                pred += c * int(out[i - j - 1])
            v = (pred + int(residuals[i])) % 2**32
            out.append(v - 2**32 if v >= 2**31 else v)
    out = out[:target_len] + [0] * max(0, target_len - len(out))
    return np.array(out, dtype=np.int64)


def _oracle_decode_channel(ch, frame_samples):
    has_coeffs = len(ch.predictor_coeffs) > 0
    has_res = len(ch.residuals) > 0
    if not has_coeffs and has_res and ch.shift_bits >= 128:
        order = ch.shift_bits - 128
        res = rice_host.decode(ch.residuals, ch.rice_parameter, frame_samples)
        return _oracle_reconstruct_fixed(order, res, frame_samples)
    if has_coeffs:
        res = rice_host.decode(ch.residuals, ch.rice_parameter, frame_samples)
        return _oracle_reconstruct_lpc(
            ch.predictor_coeffs, res, min(ch.shift_bits, 15), frame_samples
        )
    if has_res:
        raw = np.frombuffer(ch.residuals[: (len(ch.residuals) // 2) * 2], dtype="<i2")
        out = np.zeros(frame_samples, dtype=np.int64)
        out[: min(len(raw), frame_samples)] = raw[: min(len(raw), frame_samples)]
        return out
    return np.zeros(frame_samples, dtype=np.int64)


def _oracle_decode_file(flo):
    channels = flo.header.channels
    per_ch = [[] for _ in range(channels)]
    for frame in flo.frames:
        if FrameType.from_byte(frame.frame_type).is_transform:
            continue
        ms = channels == 2 and bool(frame.flags & 0x01)
        cols = [
            _oracle_decode_channel(frame.channels[c], frame.frame_samples)
            for c in range(channels)
        ]
        if ms:
            m, s = cols

            def trunc2(t):
                q = np.abs(t) // 2
                return np.where(t >= 0, q, -q)

            cols = [trunc2(m + s), trunc2(m - s)]
        for c in range(channels):
            per_ch[c].append(cols[c])
    stacked = [np.concatenate(p) if p else np.zeros(0) for p in per_ch]
    return np.stack(stacked, axis=1).astype(np.int32)  # [n, C]


import os

_FAST_SET = [
    "sine_440hz_mono.flo",
    "chord_cmajor_stereo.flo",
    "telephone_8khz.flo",
    "audio_lossless.flo",
    "silence_1sec.flo",
    "white_noise.flo",
]
_FULL_EXTRA = [
    "multitone_stereo.flo",
    "sweep_20_20k.flo",
    "click_track_120bpm.flo",
    "dtmf_tones.flo",
    "hires_96khz.flo",
]
# The pure-python oracle is O(samples * order); the long files take minutes.
# Set FLO_TPU_FULL_ORACLE=1 to run the complete corpus comparison.
LOSSLESS_EXAMPLES = _FAST_SET + (_FULL_EXTRA if os.environ.get("FLO_TPU_FULL_ORACLE") else [])


@pytest.mark.parametrize("name", LOSSLESS_EXAMPLES)
def test_decode_matches_oracle(examples_dir, name):
    flo = reader.read((examples_dir / name).read_bytes())
    got = lossless_decoder.decode_file_i32(flo)
    want = _oracle_decode_file(flo)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_sine_signal_properties(examples_dir):
    """Decoded sine_440hz_mono must actually be a 440 Hz sine."""
    data = (examples_dir / "sine_440hz_mono.flo").read_bytes()
    samples = lossless_decoder.decode(data)
    assert len(samples) == 2 * 44100
    spectrum = np.abs(np.fft.rfft(samples * np.hanning(len(samples))))
    freq = np.fft.rfftfreq(len(samples), 1 / 44100)
    assert abs(freq[np.argmax(spectrum)] - 440.0) < 1.0
    assert 0.1 < np.abs(samples).max() <= 1.0


def test_stereo_decode_shapes(examples_dir):
    data = (examples_dir / "chord_cmajor_stereo.flo").read_bytes()
    flo = reader.read(data)
    samples = lossless_decoder.decode(data)
    assert len(samples) == flo.header.total_samples * 2
