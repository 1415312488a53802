"""Sparse coefficient transport: compact/expand must invert exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from flo_tpu.ops import compact


@pytest.mark.parametrize("seed,density", [(0, 0.1), (1, 0.5), (2, 0.0), (3, 1.0)])
def test_compact_expand_roundtrip(seed, density):
    rng = np.random.default_rng(seed)
    R, W = 37, 256
    q = np.where(
        rng.random((R, W)) < density, rng.integers(-32768, 32768, (R, W)), 0
    ).astype(np.int16)

    entries_d, row_nnz_d = compact.compact_nonzeros(jnp.asarray(q))
    row_nnz = np.asarray(row_nnz_d)
    assert np.array_equal(row_nnz, (q != 0).sum(axis=1))
    total = int(row_nnz.sum())
    entries = compact.fetch_prefix(entries_d, total)

    # Host-side view of the entries matches numpy nonzeros in row-major order.
    cols, vals = compact.split_entries(entries)
    rid, cid = np.nonzero(q)
    assert np.array_equal(cols, cid)
    assert np.array_equal(vals, q[rid, cid])

    # Device expansion rebuilds the dense rows exactly.
    padded = compact.pad_entries(entries, bucket=1024)
    dense = np.asarray(
        compact.expand_nonzeros(
            jnp.asarray(padded), jnp.asarray(row_nnz), jnp.int32(total), R, W
        )
    )
    assert np.array_equal(dense, q.astype(np.int32))


@pytest.mark.parametrize("seed,density", [(0, 0.05), (1, 0.5), (2, 0.0), (3, 1.0)])
def test_two_phase_compaction_matches_oracle(seed, density):
    """compact_blocks + assemble_entries == compact_nonzeros prefix."""
    import jax

    rng = np.random.default_rng(seed)
    R, W = 23, 160  # W not a BLKE multiple: blocks straddle rows
    q = np.where(
        rng.random((R, W)) < density, rng.integers(-32768, 32768, (R, W)), 0
    ).astype(np.int16)
    ref_entries_d, ref_nnz_d = compact.compact_nonzeros(jnp.asarray(q))
    total = int(np.asarray(ref_nnz_d).sum())

    comp, blk_nnz, row_nnz = jax.jit(compact.compact_blocks)(jnp.asarray(q))
    assert np.array_equal(np.asarray(row_nnz), np.asarray(ref_nnz_d))
    NE = compact.bucket_entries(total)
    got = np.asarray(compact.assemble_entries(comp, blk_nnz, NE=NE))
    want = compact.fetch_prefix(ref_entries_d, total)
    assert np.array_equal(got[:total], want)
    assert not got[total:].any()


def test_make_entries_negative_values():
    cols = np.array([0, 5, 1023], np.int32)
    vals = np.array([-32768, -1, 32767], np.int16)
    e = compact.make_entries(cols, vals)
    c2, v2 = compact.split_entries(e)
    assert np.array_equal(c2, cols) and np.array_equal(v2, vals)
