"""Fused CGS2 projection kernel (ops/cgs2_pallas.py): algebra + GMRES wiring.

The kernel restructures the four full-buffer XLA GEMVs of the CGS2
orthogonalization (solvers/gmres.py) into three Pallas sweeps that read only
the live rows 0..k — algebraically identical output (w after both
projection passes, h = h1 + h2), verified here against a numpy reference
and end-to-end through `gmres(cgs2_kernel=True)`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.ops.cgs2_pallas import cgs2_project
from navierstokes_tpu.solvers.gmres import gmres


def _reference(V, w, k):
    """The four-GEMV CGS2 projection (rows 0..k), f64 numpy."""
    V = np.asarray(V, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    active = (np.arange(V.shape[0]) <= k).astype(np.float64)
    h1 = (V @ w) * active
    w1 = w - V.T @ h1
    h2 = (V @ w1) * active
    w2 = w1 - V.T @ h2
    return w2, h1 + h2


@pytest.mark.parametrize("k", [0, 1, 7, 8, 13, 30])
def test_cgs2_project_matches_reference(k):
    m1p, n, tile = 32, 2048, 512
    rng = np.random.default_rng(5)
    # Orthonormal live rows — the real GMRES invariant (a raw gaussian V
    # amplifies the projection to O(1e5) values, where f64 summation-order
    # differences alone exceed any tight tolerance).
    V = np.zeros((m1p, n))
    V[: k + 1] = np.linalg.qr(
        rng.standard_normal((n, k + 1))
    )[0].T
    w = rng.standard_normal(n)
    w2, h = jax.jit(
        lambda V, w, k: cgs2_project(V, w, k, tile=tile, interpret=True)
    )(jnp.asarray(V), jnp.asarray(w), k)
    w2_ref, h_ref = _reference(V, w, k)
    np.testing.assert_allclose(np.asarray(w2), w2_ref, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(h), h_ref, rtol=1e-12, atol=1e-12)


def test_cgs2_project_dead_rows_exact_zero():
    # h beyond row k must be exactly zero (the Givens recurrence reads the
    # whole column), and live garbage in dead V rows must not leak through.
    m1p, n, tile = 16, 1024, 512
    rng = np.random.default_rng(7)
    V = rng.standard_normal((m1p, n))
    V[5:] = np.nan                        # poison the dead rows
    w = rng.standard_normal(n)
    w2, h = cgs2_project(jnp.asarray(V), jnp.asarray(w), 4, tile=tile,
                         interpret=True)
    assert np.all(np.isfinite(np.asarray(w2)))
    assert np.all(np.asarray(h)[5:] == 0.0)


def test_gmres_cgs2_kernel_matches_xla():
    """gmres(cgs2_kernel=True) == gmres(cgs2_kernel=False) on a well-
    conditioned dense system with a tile-aligned n."""
    n, tile = 1024, 512
    rng = np.random.default_rng(3)
    A = np.eye(n) * 4.0 + 0.5 * rng.standard_normal((n, n)) / np.sqrt(n)
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)

    def matvec(x):
        return jnp.matmul(Aj, x, precision=jax.lax.Precision.HIGHEST)

    kw = dict(restart=30, rtol=1e-12, atol=1e-14, maxiter=300)
    res_x = gmres(matvec, jnp.asarray(b), **kw)
    res_p = gmres(matvec, jnp.asarray(b), cgs2_kernel=True, cgs2_tile=tile,
                  **kw)
    assert bool(res_p.converged)
    x_np = np.linalg.solve(A, b)
    err = np.linalg.norm(np.asarray(res_p.x) - x_np) / np.linalg.norm(x_np)
    assert err < 1e-10, f"kernel-orthogonalized GMRES error {err}"
    # identical iteration trajectory (same algebra, both f64 on CPU)
    assert int(res_p.iters) == int(res_x.iters)


def test_cgs2_project_compensated_matches():
    """Kahan-compensated fold == plain fold to f64 roundoff (and at least
    as accurate against the exact f64 projection)."""
    m1p, n, tile = 16, 2048, 512
    rng = np.random.default_rng(13)
    k = 9
    V = np.zeros((m1p, n))
    V[: k + 1] = np.linalg.qr(rng.standard_normal((n, k + 1)))[0].T
    w = rng.standard_normal(n)
    w2p, hp_ = cgs2_project(jnp.asarray(V), jnp.asarray(w), k, tile=tile,
                            interpret=True)
    w2c, hc = cgs2_project(jnp.asarray(V), jnp.asarray(w), k, tile=tile,
                           interpret=True, compensated=True)
    w2_ref, h_ref = _reference(V, w, k)
    for got in (np.asarray(hp_), np.asarray(hc)):
        np.testing.assert_allclose(got, h_ref, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(w2c), w2_ref, rtol=1e-12,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(w2p), np.asarray(w2c), rtol=1e-12,
                               atol=1e-12)


def test_gmres_cgs2_kernel_fallback_unaligned():
    # n not a tile multiple -> silent static fallback to the XLA path
    n = 700
    rng = np.random.default_rng(9)
    A = np.eye(n) * 3.0 + 0.1 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = gmres(lambda x: Aj @ x, jnp.asarray(b), cgs2_kernel=True,
                rtol=1e-10, atol=1e-12, maxiter=200)
    assert bool(res.converged)


def test_model_cgs2_pallas_end_to_end():
    """Full transient step with cgs2='pallas' on the plane layout ==
    cgs2='xla' (identical algebra; CPU interpret mode)."""
    import dataclasses

    from navierstokes_tpu.config import NewtonConfig, NSConfig, SolverConfig
    from navierstokes_tpu.mesh import channel_mesh
    from navierstokes_tpu.model import NavierStokesSolver

    mesh = channel_mesh(6, 3, 3)
    kr = SolverConfig(rtol=1e-10, atol=1e-12, maxiter=2000,
                      preconditioner="two_level", coarse_agg=4, spmv="plane")
    cfg = NSConfig(dt=0.01, t_final=0.01, reynolds=100.0, delta=0.1,
                   dtype="float64",
                   newton=NewtonConfig(rtol=1e-8, atol=1e-10, stol=1e-12,
                                       du_tol=float("inf")),
                   krylov=kr, stokes_krylov=kr)
    u_x = NavierStokesSolver(mesh, cfg).run(1, monitor=False)
    cfg_p = dataclasses.replace(
        cfg,
        krylov=dataclasses.replace(kr, cgs2="pallas"),
        stokes_krylov=dataclasses.replace(kr, cgs2="pallas"),
    )
    u_p = NavierStokesSolver(mesh, cfg_p).run(1, monitor=False)
    err = np.linalg.norm(np.asarray(u_p) - np.asarray(u_x)) / (
        np.linalg.norm(np.asarray(u_x))
    )
    assert err < 1e-10, f"cgs2=pallas vs xla drift {err}"


def test_model_rejects_unknown_cgs2():
    import dataclasses

    from navierstokes_tpu.config import NSConfig, SolverConfig
    from navierstokes_tpu.mesh import channel_mesh
    from navierstokes_tpu.model import NavierStokesSolver

    cfg = NSConfig(krylov=SolverConfig(cgs2="Pallas"))
    with pytest.raises(ValueError, match="cgs2"):
        NavierStokesSolver(channel_mesh(3, 2, 2), cfg)


@pytest.mark.parametrize("k", [0, 7, 8, 30])
def test_cgs2_project_tiled_matches_rowmajor(k):
    """The tiled (grid, m1p, tile) V layout (contiguous window DMAs — the
    layout solvers.gmres keeps when the kernel is on) must produce exactly
    the row-major kernel's output."""
    m1p, n, tile = 32, 2048, 512
    rng = np.random.default_rng(11)
    V = np.zeros((m1p, n))
    V[: k + 1] = np.linalg.qr(rng.standard_normal((n, k + 1)))[0].T
    w = rng.standard_normal(n)
    Vt = V.reshape(m1p, n // tile, tile).swapaxes(0, 1)   # (grid, m1p, tile)
    w2r, hr = cgs2_project(jnp.asarray(V), jnp.asarray(w), k, tile=tile,
                           interpret=True)
    w2t, ht = cgs2_project(jnp.asarray(np.ascontiguousarray(Vt)),
                           jnp.asarray(w), k, tile=tile, interpret=True)
    np.testing.assert_array_equal(np.asarray(w2t), np.asarray(w2r))
    np.testing.assert_array_equal(np.asarray(ht), np.asarray(hr))
    w2_ref, h_ref = _reference(V, w, k)
    np.testing.assert_allclose(np.asarray(w2t), w2_ref, rtol=1e-12,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(ht), h_ref, rtol=1e-12, atol=1e-12)
