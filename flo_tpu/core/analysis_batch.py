"""Bulk analysis auto-embed: lib.rs:219-283 semantics at batch throughput.

The reference embeds waveform peaks, a spectral fingerprint, and an EBU R128
loudness point into every encoded file's metadata. Per-file host code
(scipy lfilter + numpy BLAKE3) costs seconds per minute of audio — far too
slow for the bulk pipelines — so this module routes the three hot loops
through flo_tpu/native/analysis.cpp (K-weighting biquads, true-peak FIR,
parallel BLAKE3) with the exact same numerics (f64 direct-form-I biquads
match scipy to ~1e-12; BLAKE3 is bit-identical), falling back to the
portable implementations when no toolchain is available.

Entry point: analyze_many — one call per bulk encode batch, returning the
updated metadata blob per file.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

from .. import native
from . import analysis, ebu_r128
from .metadata import FloMetadata, LoudnessPoint


def _loudness_fast_interleaved(
    samples: np.ndarray, channels: int, sample_rate: int
) -> ebu_r128.LoudnessMetrics:
    """compute_ebu_r128_loudness via ONE fused native pass over the
    interleaved f32 signal (native/analysis.cpp loudness_pass: deinterleave,
    sample peak, true-peak FIR, K-weighting biquads, per-hop energy sums —
    no Python-side copies). Falls back to the per_ch composition path."""
    C = max(int(channels), 1)
    samples = np.ascontiguousarray(samples, dtype=np.float32).reshape(-1)
    n = samples.size // C
    if n == 0:
        return ebu_r128.LoudnessMetrics()
    sr = float(sample_rate)
    hop = int(round(sr * 0.1))
    sb, sa, hb, ha = ebu_r128.k_weighting_coeffs(sr)
    cf = np.concatenate([sb, sa[1:], hb, ha[1:]])
    h = ebu_r128._true_peak_kernel(sr)
    out = native.loudness_pass(samples[: n * C], C, cf, h, 24, hop)
    if out is None:
        per_ch = np.ascontiguousarray(
            samples[: n * C].reshape(n, C).T.astype(np.float64)
        )
        return _loudness_fast(per_ch, sample_rate)
    seg_sum, tp, peak = out
    sample_peak_dbfs = 20.0 * math.log10(peak) if peak > 1e-6 else -150.0
    true_peak = 20.0 * math.log10(tp) if tp > 1e-9 else -150.0
    nseg = n // hop
    bounds = np.concatenate([np.arange(nseg + 1, dtype=np.int64) * hop, [n]])
    seg_cum = np.concatenate([[0.0], np.cumsum(seg_sum)])
    return _gate_metrics(
        seg_cum[None, :], bounds, n, nseg, hop, true_peak, sample_peak_dbfs
    )


def _loudness_fast(per_ch: np.ndarray, sample_rate: int) -> ebu_r128.LoudnessMetrics:
    """compute_ebu_r128_loudness with the native biquad/FIR kernels.

    per_ch: [C, n] float64. Falls back to the portable path if native code
    is unavailable.
    """
    C, n = per_ch.shape
    if n == 0 or C == 0:
        return ebu_r128.LoudnessMetrics()
    sr = float(sample_rate)

    sample_peak_dbfs = -150.0
    peak = float(np.abs(per_ch).max(initial=0.0))
    if peak > 1e-6:
        sample_peak_dbfs = 20.0 * math.log10(peak)

    sb, sa, hb, ha = ebu_r128.k_weighting_coeffs(sr)
    cf = np.concatenate([sb, sa[1:], hb, ha[1:]])
    kw = per_ch.copy()  # kweight_cascade filters in place; keep per_ch pristine
    if native.kweight_cascade(kw, cf) is None:
        kw = ebu_r128.k_weight(per_ch, sr)

    h = ebu_r128._true_peak_kernel(sr)
    tp = native.fir_absmax(per_ch, h, 24)
    if tp is None:
        interleaved = per_ch.T.reshape(-1).astype(np.float32)
        true_peak = ebu_r128.compute_true_peak(interleaved, C, sample_rate)
    else:
        m = float(np.max(tp, initial=0.0))
        true_peak = 20.0 * math.log10(m) if m > 1e-9 else -150.0

    hop = int(round(sr * 0.1))
    # 400 ms / 100 ms gating blocks via per-hop segment sums (one pass over
    # the signal) instead of a full f64 cumsum + Python block loop — those
    # two cost ~315 ms per minute of audio on this 1-core host and dominated
    # bulk analysis. Same block boundaries as the reference loop
    # (ebu_r128.rs:196-218): starts at 0, hop, ...; the final block clamps
    # to n and iteration stops once a block reaches the end.
    # f32-extreme inputs (|x| ~ 1e38) overflow to inf here; that propagates
    # to the same inf/NaN gating values the reference's f64 math produces.
    with np.errstate(over="ignore"):
        kk = kw * kw
    nseg = n // hop
    seg = kk[:, : nseg * hop].reshape(C, nseg, hop).sum(axis=2)
    tail = kk[:, nseg * hop :].sum(axis=1)  # partial last hop (may be empty)
    seg_all = np.concatenate([seg, tail[:, None]], axis=1)  # [C, nseg+1]
    bounds = np.concatenate([np.arange(nseg + 1, dtype=np.int64) * hop, [n]])
    seg_cum = np.concatenate(
        [np.zeros((C, 1)), np.cumsum(seg_all, axis=1)], axis=1
    )  # cumsum over ~n/hop entries, not n
    return _gate_metrics(seg_cum, bounds, n, nseg, hop, true_peak, sample_peak_dbfs)


def _gate_metrics(seg_cum, bounds, n, nseg, hop, true_peak, sample_peak_dbfs):
    """Shared BS.1770 gating over per-hop energy cumsums (either per-channel
    [C, nseg+2] or pre-summed [1, nseg+2])."""
    block = hop * 4

    starts_idx = []
    start = 0
    while start < n:
        end = min(start + block, n)
        if end <= start:
            break
        starts_idx.append(start // hop)
        if end == n:
            break
        start += hop
    if not starts_idx:
        return ebu_r128.LoudnessMetrics(-23.0, 0.0, true_peak, sample_peak_dbfs)
    si = np.asarray(starts_idx, dtype=np.int64)
    ei = np.minimum(si + 4, nseg + 1)
    lens = bounds[ei] - bounds[si]
    sums = (seg_cum[:, ei] - seg_cum[:, si]).sum(axis=0)
    energies_arr = sums / np.maximum(lens, 1)
    with np.errstate(divide="ignore"):
        loudness_arr = np.where(
            energies_arr > 0, -0.691 + 10.0 * np.log10(np.maximum(energies_arr, 1e-300)), -150.0
        )
    abs_gate_energy = 10.0 ** ((-70.0 + 0.691) / 10.0)
    gated = energies_arr >= abs_gate_energy
    if not gated.any():
        return ebu_r128.LoudnessMetrics(-23.0, 0.0, true_peak, sample_peak_dbfs)
    ungated_lufs = -0.691 + 10.0 * math.log10(energies_arr[gated].mean())
    rel_gate_energy = 10.0 ** ((ungated_lufs - 10.0 + 0.691) / 10.0)
    final = gated & (energies_arr >= rel_gate_energy)
    integrated = (
        -0.691 + 10.0 * math.log10(energies_arr[final].mean())
        if final.any()
        else ungated_lufs
    )
    n_final = int(final.sum())
    if n_final < 2:
        lra = 0.0
    else:
        vals = np.sort(loudness_arr[final])

        def interp(pos):
            i = int(math.floor(pos))
            frac = pos - i
            return vals[i] * (1.0 - frac) + vals[i + 1] * frac if i + 1 < len(vals) else vals[i]

        # Inputs at the f32 extreme (|x| ~ 1e38) push block energies to inf,
        # so inf - inf here is NaN — the same value the reference's f64 math
        # produces (ebu_r128.rs:322-345). Keep the semantics, mute the numpy
        # warning.
        with np.errstate(invalid="ignore"):
            lra = float(
                interp(0.95 * (n_final - 1)) - interp(0.10 * (n_final - 1))
            )
    return ebu_r128.LoudnessMetrics(float(integrated), lra, true_peak, sample_peak_dbfs)


def analyze_one(
    metadata: bytes, samples: np.ndarray, sample_rate: int, channels: int,
    peaks_per_second: int = 50,
) -> bytes:
    """add_analysis_data_if_missing with the fast kernels (lib.rs:219-283)."""
    try:
        meta = FloMetadata.from_msgpack(metadata) if metadata else FloMetadata()
    except Exception:
        meta = FloMetadata()

    samples = np.asarray(samples, dtype=np.float32).reshape(-1)
    C = max(int(channels), 1)
    n = len(samples) // C

    if meta.waveform_data is None:
        meta.waveform_data = analysis.extract_waveform_peaks(
            samples, channels, sample_rate, peaks_per_second
        )
    if meta.spectrum_fingerprint is None:
        fp = analysis.extract_spectral_fingerprint(samples, channels, sample_rate)
        meta.spectrum_fingerprint = fp.to_bytes()
    if not meta.loudness_profile:
        metrics = _loudness_fast_interleaved(samples, C, sample_rate)
        meta.loudness_profile = [
            LoudnessPoint(timestamp_ms=0, lufs=float(metrics.integrated_lufs))
        ]
    meta.length_ms = int(n / sample_rate * 1000.0)
    return meta.to_msgpack()


def analyze_many(
    samples_list: Sequence[np.ndarray],
    sample_rate: int,
    channels: int,
    metadata_list: Optional[Sequence[bytes]] = None,
) -> list[bytes]:
    """Per-file analysis metadata for a bulk encode batch."""
    metas = metadata_list or [b""] * len(samples_list)
    return [
        analyze_one(m, s, sample_rate, channels)
        for m, s in zip(metas, samples_list)
    ]
