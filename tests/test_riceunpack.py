"""Device-side Rice unpacking must match the host decoder exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from flo_tpu.core import rice_host
from flo_tpu.ops import riceunpack


def _device_unpack(blobs, ks, nvalid, S):
    offs = []
    pos = 0
    for b in blobs:
        offs.append(pos * 8)
        pos += len(b)
    buf = b"".join(blobs) + b"\x00" * riceunpack.PAD_BYTES
    out = riceunpack.unpack_lanes(
        jnp.asarray(np.frombuffer(buf, np.uint8)),
        jnp.asarray(np.array(offs, np.int32)),
        jnp.asarray(np.asarray(ks, np.int32)),
        jnp.asarray(np.asarray(nvalid, np.int32)),
        S,
    )
    rows, end_bit, bad = (np.asarray(a) for a in out)
    return rows, end_bit, bad, offs


@pytest.mark.parametrize("seed", [0, 1])
def test_unpack_matches_host(seed):
    rng = np.random.default_rng(seed)
    L, S = 11, 500
    rows = np.zeros((L, S), np.int32)
    ks, nvalid, blobs = [], [], []
    for l in range(L):
        n = int(rng.integers(1, S + 1))
        scale = [3, 40, 3000, 30000][l % 4]
        r = rng.integers(-scale, scale, n).astype(np.int32)
        k = rice_host.estimate_parameter(r)
        blobs.append(rice_host.encode(r, k))
        rows[l, :n] = r
        ks.append(k)
        nvalid.append(n)
    got, end_bit, bad, offs = _device_unpack(blobs, ks, nvalid, S)
    assert not bad.any()
    np.testing.assert_array_equal(got, rows)
    for l in range(L):
        assert end_bit[l] <= offs[l] + 8 * len(blobs[l])  # no overrun


def test_unpack_zero_fill_on_truncation():
    """Truncated blobs zero-fill exactly like the reference BitReader."""
    r = np.arange(-50, 50, dtype=np.int32)
    k = rice_host.estimate_parameter(r)
    full = rice_host.encode(r, k)
    cut = full[: len(full) // 3]
    want = rice_host.decode(cut, k, len(r))
    got, end_bit, bad, offs = _device_unpack([cut], [k], [len(r)], len(r))
    assert not bad.any()
    np.testing.assert_array_equal(got[0], want)


def test_unpack_flags_big_quotients():
    """A code with q > MAX_Q flags the lane for host fallback."""
    r = np.zeros(64, np.int32)
    r[10] = 5000  # k=0 spike: q = 10000
    blob = rice_host.encode(r, 0)
    got, end_bit, bad, _ = _device_unpack([blob, rice_host.encode(r * 0, 0)], [0, 0], [64, 64], 64)
    assert bad[0] and not bad[1]
    np.testing.assert_array_equal(got[1], 0)


def test_unpack_empty_lane_points_at_padding():
    got, end_bit, bad, _ = _device_unpack([b""], [0], [0], 8)
    assert not bad.any()
    np.testing.assert_array_equal(got, 0)


def test_unpack_raw16_lanes():
    """Raw lanes decode the writer's verbatim little-endian i16 payload,
    interleaved with Rice lanes in the same buffer."""
    rng = np.random.default_rng(5)
    S = 300
    raw_vals = rng.integers(-32768, 32768, S).astype(np.int32)
    rice_vals = rng.integers(-50, 50, S).astype(np.int32)
    k = rice_host.estimate_parameter(rice_vals)
    blobs = [
        raw_vals.astype("<i2").tobytes(),
        rice_host.encode(rice_vals, k),
        raw_vals[::-1].astype("<i2").tobytes(),
    ]
    offs, pos = [], 0
    for b in blobs:
        offs.append(pos * 8)
        pos += len(b)
    buf = b"".join(blobs) + b"\x00" * riceunpack.PAD_BYTES
    rows, end_bit, bad = (
        np.asarray(a)
        for a in riceunpack.unpack_lanes(
            jnp.asarray(np.frombuffer(buf, np.uint8)),
            jnp.asarray(np.array(offs, np.int32)),
            jnp.asarray(np.array([0, k, 0], np.int32)),
            jnp.asarray(np.full(3, S, np.int32)),
            S,
            jnp.asarray(np.array([True, False, True])),
        )
    )
    assert not bad.any()
    np.testing.assert_array_equal(rows[0], raw_vals)
    np.testing.assert_array_equal(rows[1], rice_vals)
    np.testing.assert_array_equal(rows[2], raw_vals[::-1])
    assert end_bit[0] == offs[0] + 16 * S
