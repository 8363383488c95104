"""Smoothed-aggregation coarse space (SolverConfig.coarse_smooth_omega).

The smoothed prolongator P = (I - omega*D^{-1}A) P0 is applied on the fly
(model._prep_operators) and its Petrov-Galerkin coarse matrix is built on
host by strided diagonal accumulation (solvers.coarse.smoothed_coarse_
dense_matrix).  These tests pin both against explicit dense algebra and
the end-to-end solver against the plain block-Jacobi path.
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
from navierstokes_tpu.ops.block import block4_inverse
from navierstokes_tpu.solvers.coarse import (
    build_aggregates,
    smoothed_coarse_dense_matrix,
)
from navierstokes_tpu.sparse.dia import (
    dia_from_bcsr,
    diag_blocks_from_dia,
)


def _dense_p0(nb: int, agg: int):
    """Explicit piecewise-constant-per-component prolongator (ndof, nc)."""
    n_agg = (nb + agg - 1) // agg
    P0 = np.zeros((4 * nb, 4 * n_agg))
    for i in range(nb):
        for a in range(4):
            P0[4 * i + a, 4 * (i // agg) + a] = 1.0
    return P0


@pytest.mark.parametrize("agg", [3, 5])
def test_smoothed_galerkin_matrix_vs_dense(agg):
    """Host builder == P0^T (A - omega A D^{-1} A) P0 on a real FEM band."""
    mesh = channel_mesh(4, 3, 3, length=2.0)
    disc = build_discretization(mesh, dtype=jnp.float64)
    op = assemble_operator(disc, jnp.zeros(disc.ndof), 0.01, 50.0, 0.1,
                           LINEAR_TERMS)
    dia = dia_from_bcsr(op)
    nb = disc.mesh.nv
    inv_diag = block4_inverse(
        diag_blocks_from_dia(dia.offsets, dia.data, nb),
        pivot_eps=1e-300, shift=1e-8,
    )
    cs = build_aggregates(nb, agg)
    omega, shift = 0.7, 1e-6
    ac = smoothed_coarse_dense_matrix(
        cs, dia.offsets, dia.data, inv_diag, omega=omega, shift=shift
    )

    A = np.asarray(op.to_dense())
    Dinv = np.zeros_like(A)
    idnp = np.asarray(inv_diag)
    for i in range(nb):
        Dinv[4 * i:4 * i + 4, 4 * i:4 * i + 4] = idnp[i]
    P0 = _dense_p0(nb, agg)
    ref = P0.T @ (A - omega * A @ Dinv @ A) @ P0 + shift * np.eye(cs.nc)
    np.testing.assert_allclose(ac, ref, rtol=1e-10, atol=1e-10)


def _cfg(krylov):
    return NSConfig(
        dt=0.01, t_final=0.03, reynolds=100.0, delta=0.1, dtype="float64",
        krylov=krylov,
        stokes_krylov=dataclasses.replace(krylov, rtol=1e-13),
    )


@pytest.mark.parametrize("spmv", ["auto", "plane"])
def test_sa_two_level_matches_block_jacobi(spmv):
    """End-to-end: SA-smoothed two_level reaches the block-Jacobi state."""
    mesh = channel_mesh(3, 2, 2, length=2.0)
    kr_sa = SolverConfig(rtol=1e-12, atol=1e-13, maxiter=4000,
                         preconditioner="two_level", coarse_agg=4,
                         coarse_smooth_omega=0.7, spmv=spmv)
    kr_bj = SolverConfig(rtol=1e-12, atol=1e-13, maxiter=4000,
                         neumann_order=2)
    s_sa = NavierStokesSolver(mesh, _cfg(kr_sa))
    s_bj = NavierStokesSolver(mesh, _cfg(kr_bj))
    u0 = s_bj.stokes_init()
    u_sa, _, st_sa = s_sa.step(u0, u0, jnp.zeros_like(u0))
    u_bj, _, st_bj = s_bj.step(u0, u0, jnp.zeros_like(u0))
    assert bool(st_sa.converged) and bool(st_bj.converged)
    err = np.linalg.norm(np.asarray(u_sa) - np.asarray(u_bj)) / (
        np.linalg.norm(np.asarray(u_bj))
    )
    assert err < 1e-8, f"SA two_level disagreement {err}"


def test_sa_requires_dense_coarse():
    """coarse_smooth_omega on the multilevel (sparse-coarse) path is
    rejected with a clear error instead of a Galerkin mismatch."""
    mesh = channel_mesh(3, 2, 2, length=2.0)
    kr = SolverConfig(rtol=1e-12, atol=1e-13, maxiter=4000,
                      preconditioner="two_level", coarse_agg=4,
                      coarse_dense_max=32, coarse_smooth_omega=0.7)
    s = NavierStokesSolver(mesh, _cfg(kr))
    with pytest.raises(ValueError, match="coarse_smooth_omega"):
        s.stokes_init()
