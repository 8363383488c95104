"""Per-aggregate LINEAR coarse basis (SolverConfig.coarse_basis='linear').

The prolongator carries orthonormalized {1, x, y, z} modes per aggregate
per component (16 coarse dofs/aggregate), built host-side from the
band-ordered node coordinates (solvers.coarse.build_linear_weights); the
Galerkin matrix accumulates by strided diagonal adds with dof=16.  These
tests pin the builder and the plane-layout restrict/prolong against
explicit dense algebra, and the end-to-end solver against block-Jacobi.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.config import NewtonConfig, NSConfig, SolverConfig
from navierstokes_tpu.fem.assembly import (
    LINEAR_TERMS,
    assemble_operator,
    build_discretization,
)
from navierstokes_tpu.mesh import channel_mesh
from navierstokes_tpu.model import NavierStokesSolver
from navierstokes_tpu.solvers.coarse import (
    build_aggregates,
    build_linear_weights,
    linear_coarse_dense_matrix,
    prolong_planes_linear,
    restrict_planes_linear,
)
from navierstokes_tpu.sparse.dia import dia_from_bcsr


def _dense_p_linear(nb: int, agg: int, w: np.ndarray) -> np.ndarray:
    """Explicit linear prolongator (4*nb, 16*n_agg):
    P[4i+c, 16*(i//agg) + 4m + c] = w[m, i]."""
    n_agg = (nb + agg - 1) // agg
    P = np.zeros((4 * nb, 16 * n_agg))
    for i in range(nb):
        g = i // agg
        for m in range(4):
            for c in range(4):
                P[4 * i + c, 16 * g + 4 * m + c] = w[m, i]
    return P


def _setup(agg):
    mesh = channel_mesh(4, 3, 3, length=2.0)
    disc = build_discretization(mesh, dtype=jnp.float64)
    op = assemble_operator(disc, jnp.zeros(disc.ndof), 0.01, 50.0, 0.1,
                           LINEAR_TERMS)
    dia = dia_from_bcsr(op)
    nb = disc.mesh.nv
    cs = build_aggregates(nb, agg)
    w = build_linear_weights(cs, np.asarray(disc.mesh.coords))
    return disc, op, dia, cs, w


@pytest.mark.parametrize("agg", [3, 5])
def test_linear_galerkin_matrix_vs_dense(agg):
    """Host builder == P^T A P on a real FEM band (incl. inert-mode
    pinning: agg=3 aggregates cannot span 4 linear modes, so the
    rank-deficiency path is exercised)."""
    disc, op, dia, cs, w = _setup(agg)
    nb = disc.mesh.nv
    shift = 1e-6
    ac = linear_coarse_dense_matrix(cs, dia.offsets, dia.data, w,
                                    shift=shift)

    A = np.asarray(op.to_dense())
    P = _dense_p_linear(nb, agg, w)
    nc = 16 * cs.n_agg
    ref = P.T @ A @ P
    # replicate the inert-dof diagonal pinning (zeroed weight columns)
    w3 = w.reshape(4, cs.n_agg, cs.agg_size)
    for g in range(cs.n_agg):
        for m in range(4):
            if not np.any(w3[m, g]):
                for c in range(4):
                    ref[16 * g + 4 * m + c, 16 * g + 4 * m + c] += 1.0
    ref += shift * np.eye(nc)
    np.testing.assert_allclose(ac, ref, rtol=1e-10, atol=1e-10)
    # pinned matrix must be invertible
    assert np.isfinite(np.linalg.cond(ac))


@pytest.mark.parametrize("agg", [3, 5])
def test_restrict_prolong_linear_vs_dense(agg):
    """Plane-layout weighted reshape-sums == explicit P^T r / P zc."""
    disc, op, dia, cs, w = _setup(agg)
    nb = disc.mesh.nv
    nbp = cs.nb_pad  # minimal legal kernel padding for the test
    P = _dense_p_linear(nb, agg, w)
    rng = np.random.default_rng(0)

    r = rng.standard_normal(4 * nb)
    rp = np.zeros((4, nbp))
    for c in range(4):
        rp[c, :nb] = r[c::4]
    rc = np.asarray(restrict_planes_linear(
        cs, jnp.asarray(rp.ravel()), nbp, jnp.asarray(w)))
    np.testing.assert_allclose(rc, P.T @ r, rtol=1e-12, atol=1e-12)

    zc = rng.standard_normal(16 * cs.n_agg)
    zf = np.asarray(prolong_planes_linear(
        cs, jnp.asarray(zc), nbp, nb, jnp.asarray(w))).reshape(4, nbp)
    ref = P @ zc
    for c in range(4):
        np.testing.assert_allclose(zf[c, :nb], ref[c::4],
                                   rtol=1e-12, atol=1e-12)
    assert not np.any(zf[:, nb:]), "padding rows must stay zero"


def test_linear_weights_orthonormal():
    """Nondegenerate aggregates carry orthonormal mode columns; padding
    rows carry zero weight."""
    disc, op, dia, cs, w = _setup(8)
    w3 = w.reshape(4, cs.n_agg, cs.agg_size)
    nb = disc.mesh.nv
    for g in range(cs.n_agg):
        q = w3[:, g, :].T                    # (agg, 4)
        live = [m for m in range(4) if np.any(q[:, m])]
        gram = q[:, live].T @ q[:, live]
        np.testing.assert_allclose(gram, np.eye(len(live)), atol=1e-12)
    flat_pad = w.reshape(4, cs.nb_pad)[:, nb:]
    assert not np.any(flat_pad)


def _cfg(krylov):
    return NSConfig(
        dt=0.01, t_final=0.03, reynolds=100.0, delta=0.1, dtype="float64",
        krylov=krylov,
        stokes_krylov=dataclasses.replace(krylov, rtol=1e-13),
    )


def test_linear_two_level_matches_block_jacobi():
    """End-to-end: linear-basis two_level reaches the block-Jacobi state."""
    mesh = channel_mesh(3, 2, 2, length=2.0)
    kr_lin = SolverConfig(rtol=1e-12, atol=1e-13, maxiter=4000,
                          preconditioner="two_level", coarse_agg=8,
                          coarse_basis="linear", spmv="plane")
    kr_bj = SolverConfig(rtol=1e-12, atol=1e-13, maxiter=4000,
                         neumann_order=2)
    s_lin = NavierStokesSolver(mesh, _cfg(kr_lin))
    s_bj = NavierStokesSolver(mesh, _cfg(kr_bj))
    u0 = s_bj.stokes_init()
    u_lin, _, st_lin = s_lin.step(u0, u0, jnp.zeros_like(u0))
    u_bj, _, st_bj = s_bj.step(u0, u0, jnp.zeros_like(u0))
    assert bool(st_lin.converged) and bool(st_bj.converged)
    err = np.linalg.norm(np.asarray(u_lin) - np.asarray(u_bj)) / (
        np.linalg.norm(np.asarray(u_bj))
    )
    assert err < 1e-8, f"linear two_level disagreement {err}"


def test_linear_requires_plane():
    """coarse_basis='linear' without spmv='plane' is rejected clearly."""
    mesh = channel_mesh(3, 2, 2, length=2.0)
    kr = SolverConfig(rtol=1e-12, atol=1e-13, maxiter=4000,
                      preconditioner="two_level", coarse_agg=8,
                      coarse_basis="linear", spmv="auto")
    s = NavierStokesSolver(mesh, _cfg(kr))
    with pytest.raises(ValueError, match="coarse_basis='linear'"):
        s.stokes_init()
