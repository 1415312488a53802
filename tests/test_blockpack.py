"""Fixed-width block-pack wire transport: exact round trips in both
directions, C++ vs numpy fallback equality, and adversarial content (the
spiky lanes that defeat per-lane Rice escape hatches)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flo_tpu import native
from flo_tpu.ops import blockpack


def _lanes(seed=0, L=11, S=1900):
    rng = np.random.default_rng(seed)
    rows = np.zeros((L, S), np.int32)
    nvalid = np.zeros(L, np.int64)
    for l in range(L):
        n = int(rng.integers(1, S + 1))
        nvalid[l] = n
        kind = l % 6
        if kind == 0:  # smooth tone -> delta wins
            rows[l, :n] = (20000 * np.sin(np.arange(n) * 0.013)).astype(np.int32)
        elif kind == 1:  # full-range noise
            rows[l, :n] = rng.integers(-32768, 32768, n)
        elif kind == 2:  # tone + noise
            rows[l, :n] = (3000 * np.sin(np.arange(n) * 0.4)).astype(
                np.int32
            ) + rng.integers(-40, 40, n)
        elif kind == 3:  # quiet with HUGE transient spikes (tile joints)
            rows[l, :n] = rng.integers(-8, 8, n)
            rows[l, : n : max(n // 7, 1)] = rng.integers(-(1 << 28), 1 << 28)
        elif kind == 4:  # int32 extremes
            rows[l, :n] = np.where(
                np.arange(n) % 2 == 0, np.int32(-(2**31)), np.int32(2**31 - 1)
            )
        # kind 5: silence
    return rows, nvalid


def _upload_roundtrip(rows, nvalid):
    L, S = rows.shape
    buf, modes, widths, lane_off = blockpack.pack_host(rows, nvalid)
    fn = jax.jit(blockpack.unpack_rows, static_argnames=("S",))
    out = np.asarray(
        fn(
            jnp.asarray(buf), jnp.asarray(modes.astype(np.int32)),
            jnp.asarray(widths), jnp.asarray(lane_off.astype(np.int32)),
            jnp.asarray(nvalid.astype(np.int32)), S,
        )
    )
    return out, buf, modes, widths, lane_off


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_host_pack_device_unpack_exact(seed):
    rows, nvalid = _lanes(seed)
    out, buf, modes, widths, lane_off = _upload_roundtrip(rows, nvalid)
    want = np.where(np.arange(rows.shape[1])[None, :] < nvalid[:, None], rows, 0)
    np.testing.assert_array_equal(out, want)


def test_host_pack_host_unpack_exact():
    rows, nvalid = _lanes(3)
    L, S = rows.shape
    buf, modes, widths, lane_off = blockpack.pack_host(rows, nvalid)
    out = blockpack.unpack_host(buf, modes, widths, lane_off, nvalid, S)
    want = np.where(np.arange(S)[None, :] < nvalid[:, None], rows, 0)
    np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("seed", [0, 3])
def test_device_unpack_bucketed_buffer(seed):
    """unpack_rows on a bucket-padded buffer (the production shape) equals
    the tight buffer."""
    rows, nvalid = _lanes(seed)
    L, S = rows.shape
    buf, modes, widths, lane_off = blockpack.pack_host(rows, nvalid)
    nb = 1 << (len(buf) - 1).bit_length()
    bufp = np.concatenate([buf, np.zeros(nb - len(buf), np.uint8)])
    fn = jax.jit(blockpack.unpack_rows, static_argnames=("S",))
    out = np.asarray(
        fn(
            jnp.asarray(bufp), jnp.asarray(modes.astype(np.int32)),
            jnp.asarray(widths), jnp.asarray(lane_off.astype(np.int32)),
            jnp.asarray(nvalid.astype(np.int32)), S,
        )
    )
    want = np.where(np.arange(S)[None, :] < nvalid[:, None], rows, 0)
    np.testing.assert_array_equal(out, want)


def test_numpy_unpack_fallback_exact():
    """The pure-numpy unpack path (no C++) inverts pack_host exactly."""
    rows, nvalid = _lanes(4, L=9, S=1500)
    L, S = rows.shape
    buf, modes, widths, lane_off = blockpack.pack_host(rows, nvalid)

    from flo_tpu import native

    orig = native.blockpack_unpack
    native.blockpack_unpack = lambda *a, **k: None
    try:
        out = blockpack.unpack_host(buf, modes, widths, lane_off, nvalid, S)
    finally:
        native.blockpack_unpack = orig
    want = np.where(np.arange(S)[None, :] < nvalid[:, None], rows, 0)
    np.testing.assert_array_equal(out, want)


def test_numpy_fallback_matches_cpp():
    if not native.available():
        pytest.skip("no native toolchain")
    rows, nvalid = _lanes(6, L=8, S=700)
    L, S = rows.shape
    nblk = blockpack.nblocks(S)
    got = native.blockpack_analyze(
        np.ascontiguousarray(rows), np.ascontiguousarray(nvalid), nblk
    )
    assert got is not None
    modes_c, widths_c, bytes_c = got
    # force the numpy path by calling the private fallbacks directly
    valid = np.arange(S)[None, :] < nvalid[:, None]
    buf_c, modes2, widths2, lane_off = blockpack.pack_host(rows, nvalid)
    buf_np = np.zeros_like(buf_c)
    blockpack._np_pack_into(
        np.where(valid, rows, 0).astype(np.int32), nvalid, modes2, widths2,
        lane_off, buf_np,
    )
    np.testing.assert_array_equal(buf_np, buf_c)
    out_np = blockpack.unpack_host.__wrapped__(  # type: ignore[attr-defined]
        buf_c, modes2, widths2, lane_off, nvalid, S
    ) if hasattr(blockpack.unpack_host, "__wrapped__") else None
    if out_np is not None:
        np.testing.assert_array_equal(
            out_np, np.where(valid, rows, 0)
        )


def test_higher_order_modes_chosen_and_exact():
    """Polynomial-smooth lanes force transform orders 3 and 4; every
    implementation pair (C++ pack / numpy pack / device unpack / host
    unpack / fused f32 finalizer) agrees bit-for-bit, and the higher
    orders genuinely shrink the payload vs a d2-only packer would."""
    rng = np.random.default_rng(21)
    S = 4000
    j = np.arange(S, dtype=np.float64)
    rows = np.zeros((4, S), np.int32)
    # cubic ramp -> d3 constant-ish; quartic -> d4; tone -> order 3/4 wins
    rows[0] = (j**3 / 2e6).astype(np.int32)
    rows[1] = (j**4 / 4e9).astype(np.int32)
    rows[2] = (30000 * np.sin(j * 0.02)).astype(np.int32)
    rows[3] = np.cumsum(np.cumsum(np.cumsum(rng.integers(-2, 3, S)))).astype(
        np.int32
    )
    nvalid = np.full(4, S, np.int64)

    buf, modes, widths, lane_off = blockpack.pack_host(rows, nvalid)
    assert modes.max() >= 3, f"expected an order-3/4 lane, got modes={modes}"

    # d2-capped widths for comparison: the extension must strictly help.
    ds, _ = blockpack._np_transform(rows, nvalid, blockpack.nblocks(S))
    w2 = min(
        32 * blockpack._np_widths(blockpack._np_zigzag(d), blockpack.nblocks(S))
        .astype(np.int64).sum() for d in ds[:3]
    )
    assert len(buf) - blockpack.PAD_BYTES < w2

    # host unpack (C++), forced-numpy unpack, device unpack all invert
    out_c = blockpack.unpack_host(buf, modes, widths, lane_off, nvalid, S)
    np.testing.assert_array_equal(out_c, rows)
    from unittest import mock

    with mock.patch("flo_tpu.native.blockpack_unpack", return_value=None):
        out_np = blockpack.unpack_host(buf, modes, widths, lane_off, nvalid, S)
    np.testing.assert_array_equal(out_np, rows)
    out_d, *_ = _upload_roundtrip(rows, nvalid)
    np.testing.assert_array_equal(out_d, rows)

    # device pack (stage1+stage2) emits identical bytes and widths
    import jax

    from flo_tpu.ops import blockspread

    stage, modes_d, widths_d, lane_bytes_d, _ = jax.jit(
        blockpack.pack_rows_stage1
    )(jnp.asarray(rows), jnp.asarray(nvalid))
    np.testing.assert_array_equal(np.asarray(modes_d), modes.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(widths_d), widths)
    total = int(np.asarray(lane_bytes_d).sum())
    NW = blockspread.bucket_words(max(total // 4, 1))
    buf_d = np.asarray(
        blockpack.pack_rows_stage2(NW=NW, **stage)
    ).view(np.uint8)[:total]
    np.testing.assert_array_equal(buf_d, buf[:total])

    # numpy pack fallback emits identical bytes
    buf_np = np.zeros_like(buf)
    blockpack._np_pack_into(rows, nvalid, modes, widths, lane_off, buf_np)
    np.testing.assert_array_equal(buf_np, buf)

    # fused f32 finalizer (C++ and forced-numpy)
    out_base = np.arange(4, dtype=np.int64) * S
    for force_np in (False, True):
        out = np.zeros(4 * S, np.float32)
        ctx = (
            mock.patch("flo_tpu.native.blockpack_unpack_f32", return_value=False)
            if force_np else mock.patch("builtins.id", id)
        )
        with ctx:
            blockpack.unpack_f32_into(
                buf, modes, widths, lane_off, nvalid, S,
                out_base, 1, 1.0 / 32767.0, out,
            )
        np.testing.assert_array_equal(
            out.reshape(4, S),
            rows.astype(np.float32) * np.float32(1.0 / 32767.0),
        )


def test_pcm_worst_bits_covers_chosen_modes():
    """The fused download bucket (PCM_WORST_BITS) must cover ANY width the
    analyzer can pick for spec-valid i16 PCM — including the widest block
    of an order-4 lane. Adversarial content: max-amplitude alternation
    (the largest possible 4th difference)."""
    S = 2048
    rows = np.where(
        np.arange(S) % 2 == 0, np.int32(-32768), np.int32(32767)
    )[None, :].astype(np.int32)
    nvalid = np.full(1, S, np.int64)
    _, modes, widths, _ = blockpack.pack_host(rows, nvalid)
    assert int(widths.max()) <= blockpack.PCM_WORST_BITS
    # and the bound is exactly the d4 zigzag width of 2^4 * 32768
    assert blockpack.PCM_WORST_BITS == 20


def test_silence_packs_to_zero_bytes():
    rows = np.zeros((3, 512), np.int32)
    nvalid = np.full(3, 512, np.int64)
    buf, modes, widths, lane_off = blockpack.pack_host(rows, nvalid)
    assert len(buf) == blockpack.PAD_BYTES
    assert (widths == 0).all()
    out = blockpack.unpack_host(buf, modes, widths, lane_off, nvalid, 512)
    np.testing.assert_array_equal(out, 0)


def test_empty_batch():
    rows = np.zeros((0, 256), np.int32)
    nvalid = np.zeros(0, np.int64)
    buf, modes, widths, lane_off = blockpack.pack_host(rows, nvalid)
    assert len(buf) == blockpack.PAD_BYTES


def test_encode_marshal_f32_matches_numpy():
    """Fused C++ marshal (interleaved f32 -> compacted lane-major i32 +
    silence flags) is byte-identical to the numpy reference chain,
    including clip/truncation boundary values and the partial tail frame."""
    import pytest

    from flo_tpu import native
    from flo_tpu.core.constants import I16_MAX_F32, SILENCE_THRESHOLD
    from flo_tpu.core.convert import f32_to_i32_np

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    C, spf, total = 2, 1000, 3500
    flat = (rng.standard_normal(total * C) * 0.4).astype(np.float32)
    flat[1000 * C : 2000 * C] = 0.0  # frame 1 silent
    flat[:10] = [2.0, -2.0, 1.0, -1.0, 0.99997, -0.99997,
                 SILENCE_THRESHOLD, -SILENCE_THRESHOLD,
                 0.5 / 32767, -0.5 / 32767]
    F = -(-total // spf)
    lanes = np.empty((F * C, spf), np.int32)
    res = native.encode_marshal_f32(
        np.ascontiguousarray(flat), total, C, spf, SILENCE_THRESHOLD,
        float(I16_MAX_F32), lanes, 0,
    )
    assert res is not None
    n_act, silent, active_idx = res

    padded = np.zeros(F * spf * C, np.float32)
    padded[: total * C] = flat
    f32 = padded.reshape(F, spf, C)
    silent_np = (np.abs(f32) < SILENCE_THRESHOLD).all(axis=(1, 2))
    fsc = f32_to_i32_np(f32)
    ai = np.flatnonzero(~silent_np)
    want = np.ascontiguousarray(np.moveaxis(fsc[ai], 2, 1)).reshape(-1, spf)
    assert np.array_equal(silent, silent_np)
    assert np.array_equal(active_idx, ai)
    np.testing.assert_array_equal(lanes[: n_act * C], want)


def test_lossy_marshal_f32_matches_numpy():
    """Fused lossy marshal (deinterleave + pre-roll + rint-quantize) equals
    the numpy chain rint/clip/astype on the padded signal."""
    import pytest

    from flo_tpu import native
    from flo_tpu.lossy.encoder import HOP, _file_padded

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(11)
    C, n = 2, 3 * HOP + 137
    flat = (rng.standard_normal(n * C) * 0.6).astype(np.float32)
    flat[:4] = [2.0, -2.0, 0.5 / 32767, -0.5 / 32767]  # clip + rounding edges

    padded, nh = _file_padded(flat, C)
    want = np.zeros((C, (nh + 1) * HOP), np.int32)
    want[:, : padded.shape[1]] = np.clip(
        np.rint(padded * np.float32(32767.0)), -32768, 32767
    ).astype(np.int32)

    rows = np.zeros((C, (nh + 1) * HOP), np.int32)
    assert native.lossy_marshal_f32(flat, n, C, HOP, 32767.0, rows)
    np.testing.assert_array_equal(rows, want)
