"""The Pallas reconstruction kernel must be bit-identical to the lax.scan
formulation (itself pinned to the numpy oracle). Runs in interpret mode on
the CPU test backend; the same kernel compiles natively on TPU."""

import numpy as np
import pytest

import jax.numpy as jnp

from flo_tpu.ops import lpc
from flo_tpu.ops.pallas_lpc import reconstruct_pallas


def _mixed_lanes(seed, L, S):
    rng = np.random.default_rng(seed)
    residuals = rng.integers(-3000, 3000, (L, S)).astype(np.int32)
    residuals[:, :: max(S // 5, 1)] = rng.integers(
        -(1 << 20), 1 << 20, residuals[:, :: max(S // 5, 1)].shape
    )  # spikes incl. int32-wrap territory after accumulation
    coeffs = np.zeros((L, lpc.MAX_ORDER), np.int32)
    shifts = np.zeros(L, np.int32)
    orders = np.zeros(L, np.int32)
    is_fixed = np.zeros(L, bool)
    for l in range(L):
        kind = l % 4
        if kind == 0:  # LPC, random order/shift
            o = int(rng.integers(1, 13))
            coeffs[l, :o] = rng.integers(-(1 << 14), 1 << 14, o)
            shifts[l] = rng.integers(0, 16)
            orders[l] = o
        elif kind == 1:  # fixed predictor
            o = int(rng.integers(0, 5))
            coeffs[l] = lpc._FIXED_COEFFS[o]
            orders[l] = o
            is_fixed[l] = True
        elif kind == 2:  # identity (raw/silence)
            pass
        else:  # max-order LPC
            coeffs[l] = rng.integers(-(1 << 15), 1 << 15, lpc.MAX_ORDER)
            shifts[l] = 15
            orders[l] = 12
    return residuals, coeffs, shifts, orders, is_fixed


@pytest.mark.parametrize("seed,L,S", [(0, 7, 300), (1, 20, 1500)])
def test_pallas_matches_scan(seed, L, S):
    residuals, coeffs, shifts, orders, is_fixed = _mixed_lanes(seed, L, S)
    want = np.asarray(
        lpc.reconstruct(
            jnp.asarray(residuals), jnp.asarray(coeffs), jnp.asarray(shifts),
            jnp.asarray(orders), jnp.asarray(is_fixed),
        )
    )
    got = np.asarray(
        reconstruct_pallas(
            jnp.asarray(residuals), jnp.asarray(coeffs), jnp.asarray(shifts),
            jnp.asarray(orders), jnp.asarray(is_fixed), interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_time_tile_boundary():
    """The carry must hand off exactly across S_TILE boundaries."""
    from flo_tpu.ops.pallas_lpc import S_TILE

    S = S_TILE + 37
    residuals, coeffs, shifts, orders, is_fixed = _mixed_lanes(3, 5, S)
    want = np.asarray(
        lpc.reconstruct(
            jnp.asarray(residuals), jnp.asarray(coeffs), jnp.asarray(shifts),
            jnp.asarray(orders), jnp.asarray(is_fixed),
        )
    )
    got = np.asarray(
        reconstruct_pallas(
            jnp.asarray(residuals), jnp.asarray(coeffs), jnp.asarray(shifts),
            jnp.asarray(orders), jnp.asarray(is_fixed), interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)
