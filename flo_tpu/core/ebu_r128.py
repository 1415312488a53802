"""EBU R128 / BS.1770 loudness measurement.

Behavioral mirror of libflo/src/core/ebu_r128.rs: K-weighting (libebur128
high-shelf + high-pass biquad coefficients), 400 ms blocks at 100 ms hop,
-70 LUFS absolute gate + relative -10 LU gate, LRA as interpolated p10-p95,
and "true peak" via the reference's 49-tap windowed-sinc filter.

Implementation notes:
* The biquad cascade is a sequential IIR; it runs as one scipy.signal.lfilter
  call per stage in f64 (the survey's sanctioned host path; a lax.scan device
  variant is only worth it for bulk batches).
* The reference's 4x "oversampling" loop truncates its fractional source
  index (`src as usize`, ebu_r128.rs:160-168), so all four subphases evaluate
  the same convolution — true peak reduces to max|conv(x, h)|, reproduced
  here exactly with one convolution per channel.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from scipy.signal import lfilter


@dataclass
class LoudnessMetrics:
    """EBU R128 metrics (ebu_r128.rs:5-17)."""

    integrated_lufs: float = -23.0
    loudness_range_lu: float = 0.0
    true_peak_dbtp: float = -150.0
    sample_peak_dbfs: float = -150.0


def k_weighting_coeffs(sample_rate: float):
    """(shelf_b, shelf_a, hp_b, hp_a) biquad coefficients
    (ebu_r128.rs:57-101, libebur128 constants)."""
    f0 = 1681.974450955533
    g_db = 3.999843853973347
    q = 0.7071752369554196
    k = math.tan(math.pi * f0 / sample_rate)
    vh = 10.0 ** (g_db / 20.0)
    vb = vh**0.4996667741545416
    a0 = 1.0 + k / q + k * k
    shelf_b = np.array(
        [(vh + vb * k / q + k * k) / a0, 2.0 * (k * k - vh) / a0, (vh - vb * k / q + k * k) / a0]
    )
    shelf_a = np.array([1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - k / q + k * k) / a0])

    f0_hp = 38.13547087602444
    q_hp = 0.5003270373238773
    k_hp = math.tan(math.pi * f0_hp / sample_rate)
    a0_hp = 1.0 + k_hp / q_hp + k_hp * k_hp
    hp_b = np.array([1.0, -2.0, 1.0])
    hp_a = np.array(
        [1.0, 2.0 * (k_hp * k_hp - 1.0) / a0_hp, (1.0 - k_hp / q_hp + k_hp * k_hp) / a0_hp]
    )
    return shelf_b, shelf_a, hp_b, hp_a


def k_weight(per_channel: np.ndarray, sample_rate: float) -> np.ndarray:
    """Apply the K-weighting cascade to [C, n] float64 channels."""
    sb, sa, hb, ha = k_weighting_coeffs(sample_rate)
    y1 = lfilter(sb, sa, per_channel, axis=-1)
    return lfilter(hb, ha, y1, axis=-1)


def _true_peak_kernel(sample_rate: float) -> np.ndarray:
    factor = 4
    oversample_rate = sample_rate * factor
    cutoff = sample_rate * 0.45
    taps = 49
    center = (taps - 1) / 2.0
    n = np.arange(taps, dtype=np.float64) - center
    with np.errstate(invalid="ignore"):
        sinc = np.where(
            np.abs(n) < 1e-12,
            2.0 * cutoff / oversample_rate,
            np.sin(2.0 * cutoff * n / oversample_rate) / (np.pi * n),
        )
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(taps) / (taps - 1)))
    h = sinc * window
    return h / h.sum()


def compute_true_peak(samples, channels: int, sample_rate: int) -> float:
    """dBTP per ebu_r128.rs:112-179 (see module note on the 4x quirk)."""
    samples = np.asarray(samples, dtype=np.float64).reshape(-1)
    if samples.size == 0 or channels == 0:
        return -150.0
    h = _true_peak_kernel(float(sample_rate))
    n = samples.size // channels
    frames = samples[: n * channels].reshape(n, channels)
    max_peak = 0.0
    for ch in range(channels):
        x = frames[:, ch]
        if x.size == 0:
            continue
        # z[i] = sum_k h[k] * x[i - 24 + k], zero outside, i in [0, len).
        full = np.convolve(x, h[::-1], mode="full")
        z = full[24 : 24 + x.size]
        max_peak = max(max_peak, float(np.abs(z).max(initial=0.0)))
    return 20.0 * math.log10(max_peak) if max_peak > 1e-9 else -150.0


def compute_ebu_r128_loudness(samples, channels: int, sample_rate: int) -> LoudnessMetrics:
    """Integrated LUFS + LRA + peaks (ebu_r128.rs:182-355)."""
    samples = np.asarray(samples, dtype=np.float32).reshape(-1)
    if samples.size == 0 or channels == 0:
        return LoudnessMetrics()

    sr = float(sample_rate)
    hop = int(round(sr * 0.1))
    block = hop * 4

    n = samples.size // channels
    per_ch = samples[: n * channels].reshape(n, channels).T.astype(np.float64)

    sample_peak_dbfs = -150.0
    for ch in range(channels):
        peak = float(np.abs(per_ch[ch]).max(initial=0.0))
        if peak > 1e-6:
            sample_peak_dbfs = max(sample_peak_dbfs, 20.0 * math.log10(peak))

    kw = k_weight(per_ch, sr)

    # Block energies: 400 ms windows, 100 ms hop, channel-summed mean square.
    energies = []
    loudness = []
    csum = np.concatenate([np.zeros((channels, 1)), np.cumsum(kw * kw, axis=1)], axis=1)
    start = 0
    while start < n:
        end = min(start + block, n)
        if end <= start:
            break
        ln = end - start
        e = float(((csum[:, end] - csum[:, start]) / ln).sum())
        energies.append(e)
        loudness.append(-0.691 + 10.0 * math.log10(e) if e > 0 else -150.0)
        if end == n:
            break
        start += hop

    true_peak = compute_true_peak(samples, channels, sample_rate)
    if not energies:
        return LoudnessMetrics(-23.0, 0.0, true_peak, sample_peak_dbfs)

    energies_arr = np.array(energies)
    loudness_arr = np.array(loudness)

    abs_gate_energy = 10.0 ** ((-70.0 + 0.691) / 10.0)
    gated = energies_arr >= abs_gate_energy
    if not gated.any():
        return LoudnessMetrics(-23.0, 0.0, true_peak, sample_peak_dbfs)

    ungated_lufs = -0.691 + 10.0 * math.log10(energies_arr[gated].mean())
    rel_gate_energy = 10.0 ** ((ungated_lufs - 10.0 + 0.691) / 10.0)
    final = gated & (energies_arr >= rel_gate_energy)

    if not final.any():
        integrated = ungated_lufs
    else:
        integrated = -0.691 + 10.0 * math.log10(energies_arr[final].mean())

    n_final = int(final.sum())
    if n_final < 2:
        lra = 0.0
    else:
        vals = np.sort(loudness_arr[final])

        def interp(pos):
            i = int(math.floor(pos))
            frac = pos - i
            return vals[i] * (1.0 - frac) + vals[i + 1] * frac if i + 1 < len(vals) else vals[i]

        lra = float(interp(0.95 * (n_final - 1)) - interp(0.10 * (n_final - 1)))

    return LoudnessMetrics(float(integrated), lra, true_peak, sample_peak_dbfs)
