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
