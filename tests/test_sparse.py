"""Sparse formats and SpMV kernels vs dense oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.ops.block import block4_apply, block4_inverse
from navierstokes_tpu.ops.spmv import (
    compute_window_starts,
    spmv_bcsr_ref,
    spmv_bell,
    spmv_bell_multi,
    spmv_bell_windowed,
)
from navierstokes_tpu.sparse.bcsr import bcsr_from_coo
from navierstokes_tpu.sparse.bell import bell_from_bcsr


def random_block_matrix(nb, rng, density=0.3, band=None):
    """Random BCSR4 with guaranteed diagonal blocks."""
    rows, cols = [], []
    for r in range(nb):
        for c in range(nb):
            if band is not None and abs(r - c) > band:
                continue
            if r == c or rng.random() < density:
                rows.append(r)
                cols.append(c)
    rows = np.asarray(rows, dtype=np.int32)
    cols = np.asarray(cols, dtype=np.int32)
    blocks = rng.standard_normal((len(rows), 4, 4))
    return bcsr_from_coo(rows, cols, jnp.asarray(blocks), nb)


def test_bcsr_coo_dedup():
    rows = np.array([0, 0, 1], dtype=np.int32)
    cols = np.array([1, 1, 0], dtype=np.int32)
    blocks = jnp.asarray(np.ones((3, 4, 4)))
    m = bcsr_from_coo(rows, cols, blocks, 2)
    assert m.nnzb == 2
    dense = m.to_dense()
    np.testing.assert_allclose(dense[0:4, 4:8], 2.0)  # duplicates summed
    np.testing.assert_allclose(dense[4:8, 0:4], 1.0)


@pytest.mark.parametrize("nb", [5, 17])
def test_spmv_variants_match_dense(nb):
    rng = np.random.default_rng(42)
    m = random_block_matrix(nb, rng)
    dense = m.to_dense()
    x = jnp.asarray(rng.standard_normal(4 * nb))
    y_dense = dense @ np.asarray(x)

    y_ref = spmv_bcsr_ref(jnp.asarray(m.row_ids()), jnp.asarray(m.indices), m.values, x)
    np.testing.assert_allclose(y_ref, y_dense, rtol=1e-12, atol=1e-12)

    ell = bell_from_bcsr(m)
    y_ell = spmv_bell(ell.indices_dev if hasattr(ell, "indices_dev") else jnp.asarray(ell.indices), ell.values, x)
    np.testing.assert_allclose(y_ell, y_dense, rtol=1e-12, atol=1e-12)

    np.testing.assert_allclose(ell.to_dense(), dense, rtol=1e-13, atol=1e-13)


def test_spmv_windowed_banded():
    rng = np.random.default_rng(7)
    nb, tile, band = 32, 8, 6
    m = random_block_matrix(nb, rng, density=0.5, band=band)
    ell = bell_from_bcsr(m)
    window = 24  # >= band span + tile
    starts = compute_window_starts(ell.indices, tile, window)
    x = jnp.asarray(rng.standard_normal(4 * nb))
    y = spmv_bell_windowed(
        jnp.asarray(ell.indices), ell.values, x,
        tile=tile, window_starts=jnp.asarray(starts), window=window,
    )
    y_dense = m.to_dense() @ np.asarray(x)
    np.testing.assert_allclose(y, y_dense, rtol=1e-12, atol=1e-12)


def test_spmm_multivector():
    rng = np.random.default_rng(3)
    nb, s = 10, 4
    m = random_block_matrix(nb, rng)
    ell = bell_from_bcsr(m)
    X = jnp.asarray(rng.standard_normal((4 * nb, s)))
    Y = spmv_bell_multi(jnp.asarray(ell.indices), ell.values, X)
    np.testing.assert_allclose(Y, m.to_dense() @ np.asarray(X), rtol=1e-12, atol=1e-12)


def test_block4_inverse():
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(rng.standard_normal((20, 4, 4)) + 4 * np.eye(4))
    inv = block4_inverse(blocks)
    prod = np.einsum("kab,kbc->kac", np.asarray(blocks), np.asarray(inv))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (20, 4, 4)), atol=1e-10)

    x = jnp.asarray(rng.standard_normal(80))
    y = block4_apply(blocks, x)
    np.testing.assert_allclose(block4_apply(inv, y), x, atol=1e-9)


def test_block4_inverse_zero_pivot_regularization():
    """Singular block triggers the reference's +1e-8 diagonal shift path
    (`src/kernels/baij4_factor_avx2.c:283-290`) instead of producing NaNs."""
    singular = jnp.zeros((1, 4, 4)).at[0].set(jnp.diag(jnp.asarray([1.0, 0.0, 2.0, 3.0])))
    inv = block4_inverse(singular, pivot_eps=1e-12, shift=1e-8)
    assert np.all(np.isfinite(np.asarray(inv)))
