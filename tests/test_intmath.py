"""Exactness proof-by-test for the int32 limb arithmetic.

Ground truth is numpy int64 (same semantics as the reference's Rust i64 path:
wide MAC, arithmetic shift, truncating i32 cast).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from flo_tpu.ops.intmath import div2_trunc, predict_shift


def _ground_truth(c, s, shift):
    acc = (c.astype(np.int64) * s.astype(np.int64)).sum(axis=-1)
    return ((acc >> shift) & 0xFFFFFFFF).astype(np.uint32).view(np.int32)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("shift", [0, 1, 7, 14, 15])
def test_predict_shift_random(seed, shift):
    rng = np.random.default_rng(seed)
    n = 4096
    # Samples up to 2^17 (mid channel), coeffs up to 2^20 (typical LD output).
    c = rng.integers(-(2**20), 2**20, size=(n, 12)).astype(np.int32)
    s = rng.integers(-(2**17), 2**17, size=(n, 12)).astype(np.int32)
    got = np.asarray(predict_shift(jnp.asarray(c), jnp.asarray(s), shift))
    want = _ground_truth(c, s, np.int64(shift))
    np.testing.assert_array_equal(got, want)


def test_predict_shift_extreme_domain():
    # Documented exactness domain: |s| < 2^25, |c| < 2^31.
    rng = np.random.default_rng(3)
    n = 2048
    c = rng.integers(-(2**31), 2**31, size=(n, 12)).astype(np.int64).astype(np.int32)
    s = rng.integers(-(2**25), 2**25, size=(n, 12)).astype(np.int32)
    for shift in (0, 15):
        got = np.asarray(predict_shift(jnp.asarray(c), jnp.asarray(s), shift))
        want = _ground_truth(c, s, np.int64(shift))
        np.testing.assert_array_equal(got, want)


def test_predict_shift_per_lane_shift():
    rng = np.random.default_rng(4)
    n = 1000
    c = rng.integers(-(2**18), 2**18, size=(n, 12)).astype(np.int32)
    s = rng.integers(-(2**17), 2**17, size=(n, 12)).astype(np.int32)
    shifts = rng.integers(0, 16, size=n).astype(np.int32)
    got = np.asarray(predict_shift(jnp.asarray(c), jnp.asarray(s), jnp.asarray(shifts)))
    want = np.array(
        [_ground_truth(c[i : i + 1], s[i : i + 1], np.int64(shifts[i]))[0] for i in range(n)]
    )
    np.testing.assert_array_equal(got, want)


def test_div2_trunc():
    x = np.array([5, -5, 4, -4, 0, 1, -1, 2**30, -(2**30)], dtype=np.int32)
    got = np.asarray(div2_trunc(jnp.asarray(x)))
    want = np.array([2, -2, 2, -2, 0, 0, 0, 2**29, -(2**29)], dtype=np.int32)
    np.testing.assert_array_equal(got, want)
