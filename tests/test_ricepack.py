"""Device-side Rice packing must be byte-identical to the host packer."""

import numpy as np
import jax.numpy as jnp
import pytest

from flo_tpu.core import rice_host
from flo_tpu.ops import ricepack


def _pack_np(residuals, ks, nvalid, is_raw, bits_per_sample=16):
    out = ricepack.pack_lanes(
        jnp.asarray(residuals),
        jnp.asarray(ks),
        jnp.asarray(nvalid),
        jnp.asarray(is_raw),
        bits_per_sample,
    )
    packed, lane_bytes, lane_off = (np.asarray(a) for a in out)
    return packed, lane_bytes, lane_off


def _expected_blob(row, k, n, raw):
    if raw:
        return row[:n].astype("<i2").tobytes()
    return rice_host.encode(row[:n], int(k))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pack_lanes_matches_host_packer(seed):
    rng = np.random.default_rng(seed)
    L, S = 13, 700
    rows = np.zeros((L, S), np.int32)
    ks = np.zeros(L, np.int32)
    nvalid = np.zeros(L, np.int32)
    is_raw = np.zeros(L, bool)
    for l in range(L):
        n = int(rng.integers(1, S + 1))
        nvalid[l] = n
        kind = l % 4
        if kind == 0:  # small residuals, small k
            rows[l, :n] = rng.integers(-40, 40, n)
        elif kind == 1:  # wide dynamic range
            rows[l, :n] = rng.integers(-30000, 30000, n)
        elif kind == 2:  # raw lane incl. mid/side-style overflow values
            rows[l, :n] = rng.integers(-65536, 65535, n)
            is_raw[l] = True
            continue
        else:  # zeros + spikes
            rows[l, :n] = np.where(rng.random(n) < 0.95, 0, rng.integers(-500, 500, n))
        ks[l] = rice_host.estimate_parameter(rows[l, :n])

    packed, lane_bytes, lane_off = _pack_np(rows, ks, nvalid, is_raw)
    for l in range(L):
        got = packed[lane_off[l] : lane_off[l] + lane_bytes[l]].tobytes()
        want = _expected_blob(rows[l], ks[l], nvalid[l], is_raw[l])
        assert got == want, f"lane {l} (raw={is_raw[l]}, k={ks[l]}, n={nvalid[l]})"


def test_pack_lanes_k_sweep():
    """Every k 0..15 packs byte-identically (incl. quotient cap at 255)."""
    S = 64
    L = 16
    rows = np.zeros((L, S), np.int32)
    ks = np.arange(L, dtype=np.int32)
    nvalid = np.full(L, S, np.int32)
    rng = np.random.default_rng(7)
    for l in range(L):
        # values sized so quotients span 0..>255 at this k
        hi = max(2, (1 << min(ks[l] + 9, 22)))
        rows[l] = rng.integers(-hi, hi, S)
    # Arbitrary (residuals, k) pairs can hit capped-quotient codes far above
    # the encoder's 16-bit/sample bound; 272 = 255+1+16 is always safe.
    packed, lane_bytes, lane_off = _pack_np(
        rows, ks, nvalid, np.zeros(L, bool), bits_per_sample=272
    )
    for l in range(L):
        got = packed[lane_off[l] : lane_off[l] + lane_bytes[l]].tobytes()
        assert got == rice_host.encode(rows[l], int(ks[l]))


def test_pack_lanes_edge_lanes():
    """Zero lanes, single-sample lanes, all-zero residuals, k=0."""
    rows = np.zeros((4, 8), np.int32)
    rows[1, 0] = -1
    rows[2] = np.array([0, 1, -1, 2, -2, 3, -3, 32767])
    rows[3] = np.array([-32768, 32767, 100, -100, 0, 0, 0, 1])
    ks = np.array([0, 0, 2, 15], np.int32)
    nvalid = np.array([8, 1, 8, 8], np.int32)
    is_raw = np.array([False, False, False, True])
    packed, lane_bytes, lane_off = _pack_np(rows, ks, nvalid, is_raw)
    for l in range(4):
        got = packed[lane_off[l] : lane_off[l] + lane_bytes[l]].tobytes()
        want = _expected_blob(rows[l], ks[l], nvalid[l], is_raw[l])
        assert got == want, f"lane {l}"


def test_fetch_prefix_roundtrip():
    import jax.numpy as jnp

    arr = jnp.arange(1000, dtype=jnp.uint8)
    got = ricepack.fetch_prefix(arr, 123)
    assert got.tolist() == list(range(123))
    assert ricepack.fetch_prefix(arr, 0).size == 0
