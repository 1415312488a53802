"""Decode-output transport compression must be bit-exact and smaller."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flo_tpu.ops import wirecodec


def _roundtrip(rows, nvalid):
    rows = np.asarray(rows, np.int32)
    L, S = rows.shape
    fn = jax.jit(wirecodec.pack_pcm)
    packed, lane_bytes, lane_off, mode, k, overflow = (
        np.asarray(a) for a in fn(jnp.asarray(rows), jnp.asarray(nvalid))
    )
    out = wirecodec.unpack_pcm(packed, lane_bytes, lane_off, mode, k, nvalid, S)
    return out, mode, lane_bytes, overflow


@pytest.mark.parametrize("seed", [0, 1])
def test_pcm_roundtrip_exact(seed):
    rng = np.random.default_rng(seed)
    L, S = 12, 2000
    rows = np.zeros((L, S), np.int32)
    nvalid = np.zeros(L, np.int32)
    for l in range(L):
        n = int(rng.integers(10, S + 1))
        nvalid[l] = n
        kind = l % 4
        if kind == 0:  # smooth tone -> order-2 wins big
            rows[l, :n] = (9000 * np.sin(np.arange(n) * 0.02)).astype(np.int32)
        elif kind == 1:  # noisy
            rows[l, :n] = rng.integers(-30000, 30000, n)
        elif kind == 2:  # tone + noise
            rows[l, :n] = (5000 * np.sin(np.arange(n) * 0.01)).astype(
                np.int32
            ) + rng.integers(-100, 100, n)
        else:  # constant
            rows[l, :n] = 1234
    out, mode, lane_bytes, overflow = _roundtrip(rows, nvalid)
    assert not overflow.any()
    np.testing.assert_array_equal(out, rows)
    # smooth lanes must compress well below raw
    smooth = np.arange(L) % 4 == 0
    assert (lane_bytes[smooth] < 2 * nvalid[smooth] * 0.6).all()
    # pure noise should fall back to raw16 (never expand)
    assert (lane_bytes <= 2 * nvalid).all()


def test_pcm_overflow_lane_flagged():
    rows = np.zeros((2, 64), np.int32)
    rows[0] = 40
    rows[1, ::7] = 10_000_000  # i32 spikes, no safe rice candidate at any order
    nvalid = np.full(2, 64, np.int32)
    out, mode, lane_bytes, overflow = _roundtrip(rows, nvalid)
    assert not overflow[0] and overflow[1]
    np.testing.assert_array_equal(out[0], rows[0])  # good lane unaffected


def test_pcm_empty_and_single():
    rows = np.zeros((2, 8), np.int32)
    rows[1, 0] = -32768
    out, mode, lane_bytes, overflow = _roundtrip(rows, np.array([0, 1], np.int32))
    assert not overflow.any()
    np.testing.assert_array_equal(out[0], 0)
    assert out[1, 0] == -32768


# ---------------- upload direction (host pack -> device unpack) ----------------


def _upload_roundtrip(rows, nvalid):
    rows = np.asarray(rows, np.int32)
    L, S = rows.shape
    buf, bit_start, k, mode = wirecodec.pack_pcm_host(rows, nvalid)
    fn = jax.jit(wirecodec.unpack_pcm_device, static_argnames=("S",))
    out = np.asarray(
        fn(
            jnp.asarray(buf), jnp.asarray(bit_start), jnp.asarray(k),
            jnp.asarray(mode), jnp.asarray(np.asarray(nvalid, np.int32)), S,
        )
    )
    return out, mode, buf, bit_start


@pytest.mark.parametrize("seed", [0, 3])
def test_upload_roundtrip_exact(seed):
    rng = np.random.default_rng(seed)
    L, S = 13, 1777
    rows = np.zeros((L, S), np.int32)
    nvalid = np.zeros(L, np.int32)
    for l in range(L):
        n = int(rng.integers(1, S + 1))
        nvalid[l] = n
        kind = l % 5
        if kind == 0:  # smooth tone
            rows[l, :n] = (20000 * np.sin(np.arange(n) * 0.013)).astype(np.int32)
        elif kind == 1:  # full-range noise -> raw16
            rows[l, :n] = rng.integers(-32768, 32768, n)
        elif kind == 2:  # tone + noise
            rows[l, :n] = (3000 * np.sin(np.arange(n) * 0.4)).astype(
                np.int32
            ) + rng.integers(-40, 40, n)
        elif kind == 3:  # extremes
            rows[l, :n] = np.where(np.arange(n) % 2 == 0, 32767, -32768)
        else:  # silence
            pass
    out, mode, buf, _ = _upload_roundtrip(rows, nvalid)
    np.testing.assert_array_equal(out, rows)
    # packed buffer (minus padding) never exceeds the raw i16 size
    from flo_tpu.ops import riceunpack

    assert len(buf) - riceunpack.PAD_BYTES <= int(2 * nvalid.sum()) + 1


def test_upload_matches_download_format():
    """Host packer and device packer agree on the lane stream bytes for the
    same (residuals, k, mode) choices — the formats are the same."""
    rng = np.random.default_rng(7)
    S = 512
    rows = np.zeros((3, S), np.int32)
    rows[0] = (10000 * np.sin(np.arange(S) * 0.02)).astype(np.int32)
    rows[1] = rng.integers(-32768, 32768, S)
    rows[2] = np.cumsum(rng.integers(-3, 4, S)).astype(np.int32)
    nvalid = np.full(3, S, np.int32)

    buf, bit_start, k_up, mode_up = wirecodec.pack_pcm_host(rows, nvalid)
    packed, lane_bytes, lane_off, mode_dn, k_dn, overflow = (
        np.asarray(a)
        for a in jax.jit(wirecodec.pack_pcm)(jnp.asarray(rows), jnp.asarray(nvalid))
    )
    assert not overflow.any()
    np.testing.assert_array_equal(mode_up, mode_dn)
    np.testing.assert_array_equal(k_up, k_dn)
    for l in range(3):
        nb = int(lane_bytes[l])
        up = buf[bit_start[l] // 8 : bit_start[l] // 8 + nb]
        dn = packed[lane_off[l] : lane_off[l] + nb]
        np.testing.assert_array_equal(up, dn)
