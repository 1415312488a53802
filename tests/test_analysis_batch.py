"""Bulk auto-embed analysis: same fields as the single-file facade
(lib.rs:219-283), computed by the fast native kernels."""

import numpy as np

import flo_tpu
from flo_tpu import batch
from flo_tpu.container import reader
from flo_tpu.core import ebu_r128
from flo_tpu.core.analysis_batch import _loudness_fast, analyze_many
from flo_tpu.core.metadata import FloMetadata


def _signal(seconds=2.0, rate=22050, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * rate)) / rate
    s = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.01 * rng.standard_normal(t.size)
    out = np.empty(2 * t.size, np.float32)
    out[0::2] = np.clip(s, -1, 1)
    out[1::2] = np.clip(s * 0.8, -1, 1)
    return out


def test_loudness_fast_matches_reference_path():
    s = _signal()
    want = ebu_r128.compute_ebu_r128_loudness(s, 2, 22050)
    n = len(s) // 2
    per_ch = np.ascontiguousarray(s[: n * 2].reshape(n, 2).T.astype(np.float64))
    got = _loudness_fast(per_ch, 22050)
    assert abs(got.integrated_lufs - want.integrated_lufs) < 1e-9
    assert abs(got.loudness_range_lu - want.loudness_range_lu) < 1e-9
    assert abs(got.true_peak_dbtp - want.true_peak_dbtp) < 1e-9
    assert abs(got.sample_peak_dbfs - want.sample_peak_dbfs) < 1e-9


def test_analyze_many_matches_single_facade():
    files = [_signal(seed=i) for i in range(3)]
    metas = analyze_many(files, 22050, 2)
    for s, mb in zip(files, metas):
        single = flo_tpu.add_analysis_data_if_missing(b"", s, 22050, 2)
        assert mb == single


def test_bulk_encode_embeds_analysis():
    files = [_signal(seed=i) for i in range(2)]
    datas = batch.encode_many(files, 22050, 2)
    singles = [flo_tpu.encode(s, 22050, 2) for s in files]
    for s, d, ref in zip(files, datas, singles):
        meta = FloMetadata.from_msgpack(reader.read(d).metadata)
        assert meta.waveform_data is not None and len(meta.waveform_data.peaks) > 0
        assert meta.spectrum_fingerprint
        assert meta.loudness_profile and meta.loudness_profile[0].lufs < 0
        assert meta.length_ms == int(len(s) // 2 / 22050 * 1000)
        # identical fields as the single-file facade embeds
        ref_meta = FloMetadata.from_msgpack(reader.read(ref).metadata)
        assert meta.spectrum_fingerprint == ref_meta.spectrum_fingerprint
        assert meta.loudness_profile[0].lufs == ref_meta.loudness_profile[0].lufs

    # analyze=False keeps metadata empty
    plain = batch.encode_many(files, 22050, 2, analyze=False)
    assert not reader.read(plain[0]).metadata


def test_bulk_lossy_encode_embeds_analysis():
    files = [_signal(seed=9)]
    datas = batch.encode_lossy_many(files, 22050, 2, quality=2)
    meta = FloMetadata.from_msgpack(reader.read(datas[0]).metadata)
    assert meta.waveform_data is not None
    assert meta.loudness_profile
