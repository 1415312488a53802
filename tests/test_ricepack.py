"""Device-side Rice packing must be byte-identical to the host packer."""

import numpy as np
import jax.numpy as jnp
import pytest

from flo_tpu.core import rice_host
from flo_tpu.ops import ricepack


def _pack_np(residuals, ks, nvalid, is_raw):
    out = ricepack.pack_lanes(
        jnp.asarray(residuals), jnp.asarray(ks), jnp.asarray(nvalid), jnp.asarray(is_raw)
    )
    packed, lane_bytes, lane_off, bad = (np.asarray(a) for a in out)
    return packed, lane_bytes, lane_off, bad


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

    packed, lane_bytes, lane_off, bad = _pack_np(rows, ks, nvalid, is_raw)
    for l in range(L):
        want = _expected_blob(rows[l], ks[l], nvalid[l], is_raw[l])
        assert lane_bytes[l] == len(want)  # size exact even for flagged lanes
        assert lane_off[l] % 4 == 0  # word-aligned lanes
        if bad[l]:
            # spiky lane with a >32-bit code: host fallback re-packs it;
            # the device must still flag it (never silently corrupt).
            assert not is_raw[l]
            continue
        got = packed[lane_off[l] : lane_off[l] + lane_bytes[l]].tobytes()
        assert got == want, f"lane {l} (raw={is_raw[l]}, k={ks[l]}, n={nvalid[l]})"
    # smooth/raw lanes never flag; only the zeros+spikes family may
    assert not bad[np.arange(L) % 4 != 3].any()


def test_pack_lanes_long_codes_pack_exactly():
    """Codes with q+1+k > 32 bits (format-legal up to 271 bits) pack
    byte-identically via the compacted tail-patch pass; no lane flags."""
    S = 64
    rows = np.zeros((3, S), np.int32)
    rows[0] = np.arange(S) - 30
    rows[1, 10] = 5000  # one spike at k=0: capped-q code of 256 bits
    rows[2] = np.arange(S) * 3 - 90
    ks = np.array([5, 0, 4], np.int32)
    nvalid = np.full(3, S, np.int32)
    packed, lane_bytes, lane_off, bad = _pack_np(rows, ks, nvalid, np.zeros(3, bool))
    assert not bad.any()
    for l in range(3):
        got = packed[lane_off[l] : lane_off[l] + lane_bytes[l]].tobytes()
        assert got == rice_host.encode(rows[l], int(ks[l])), f"lane {l}"


def test_pack_lanes_layout_overflow_flags_lanes():
    """Total size beyond 16 bits/sample (impossible for encoder winners)
    must flag lanes, never silently truncate."""
    S = 64
    rows = np.full((2, S), 40, np.int32)  # k=0 -> 81 bits per code
    ks = np.zeros(2, np.int32)
    nvalid = np.full(2, S, np.int32)
    _, lane_bytes, _, bad = _pack_np(rows, ks, nvalid, np.zeros(2, bool))
    assert bad.all()
    assert lane_bytes[0] == len(rice_host.encode(rows[0], 0))


def test_pack_lanes_k_sweep():
    """Every k 0..15 packs byte-identically when codes fit 32 bits."""
    S = 64
    L = 16
    rows = np.zeros((L, S), np.int32)
    ks = np.arange(L, dtype=np.int32)
    nvalid = np.full(L, S, np.int32)
    rng = np.random.default_rng(7)
    for l in range(L):
        # |u| < 2^(k+5): quotients < 32 and q+1+k <= 36... keep q+1+k <= 32
        hi = max(2, 1 << (ks[l] + 3))
        rows[l] = rng.integers(-hi, hi, S)
    packed, lane_bytes, lane_off, bad = _pack_np(rows, ks, nvalid, np.zeros(L, bool))
    assert not bad.any()
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
    packed, lane_bytes, lane_off, bad = _pack_np(rows, ks, nvalid, is_raw)
    assert not bad.any()  # lane 2's capped-q 258-bit code packs via the patch
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


def test_pack_lanes_long_codes():
    """Codes longer than 32 bits (big quotients — one spike per frame on
    real content) pack byte-identically via the compacted tail-patch pass;
    no lane is flagged bad."""
    rng = np.random.default_rng(9)
    L, S = 6, 400
    rows = np.zeros((L, S), np.int32)
    ks = np.zeros(L, np.int32)
    nvalid = np.full(L, S, np.int32)
    is_raw = np.zeros(L, bool)
    for l in range(L):
        rows[l] = rng.integers(-30, 30, S)
        # spikes at several positions, including lane start/end and
        # adjacent long codes
        spots = [0, 7, 8, S // 2, S - 1]
        for i, p in enumerate(spots):
            rows[l, p] = int((1 << (17 + l)) * (1 if i % 2 == 0 else -1))
        # the estimator's k keeps q <= 255 but spikes still yield >32-bit
        # codes (the capped-q escape codes, up to 256+k bits)
        ks[l] = rice_host.estimate_parameter(rows[l])
    packed, lane_bytes, lane_off, bad = _pack_np(rows, ks, nvalid, is_raw)
    assert not bad.any()
    for l in range(L):
        want = _expected_blob(rows[l], ks[l], nvalid[l], False)
        got = packed[lane_off[l] : lane_off[l] + lane_bytes[l]].tobytes()
        assert got == want, f"lane {l} k={ks[l]}"
