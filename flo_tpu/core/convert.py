"""Sample-domain conversions (f32 <-> integer).

Numerical contract (libflo/src/core/audio_constants.rs:17-26):

  f32_to_i32(s) = clamp(s * 32767, -32768, 32767) truncated toward zero
  i32_to_f32(s) = s * (1 / 32767)

The asymmetric scale (multiply by 32767, clamp at -32768) is part of the
format's numerical contract: lossless round-trips are bit-exact in the integer
domain and within 1/32768 + eps in the f32 domain. Rust's `as i32` cast on an
f32 truncates toward zero, so we must use trunc, not floor/round.
"""

from __future__ import annotations

import numpy as np

from .constants import I16_MAX_F32, I16_MIN_F32


def f32_to_i32_np(samples: np.ndarray) -> np.ndarray:
    x = samples.astype(np.float32) * np.float32(I16_MAX_F32)
    x = np.clip(x, np.float32(I16_MIN_F32), np.float32(I16_MAX_F32))
    return np.trunc(x).astype(np.int32)


def i32_to_f32_np(samples: np.ndarray) -> np.ndarray:
    return samples.astype(np.float32) * np.float32(1.0 / I16_MAX_F32)


def f32_to_i32_jnp(samples):
    import jax.numpy as jnp

    x = samples.astype(jnp.float32) * jnp.float32(I16_MAX_F32)
    x = jnp.clip(x, jnp.float32(I16_MIN_F32), jnp.float32(I16_MAX_F32))
    return jnp.trunc(x).astype(jnp.int32)


def i32_to_f32_jnp(samples):
    import jax.numpy as jnp

    return samples.astype(jnp.float32) * jnp.float32(1.0 / I16_MAX_F32)
