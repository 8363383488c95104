"""Krylov solvers + preconditioners on real FEM operators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.fem.assembly import (
    LINEAR_TERMS,
    assemble_operator,
    build_discretization,
)
from navierstokes_tpu.fem.dirichlet import zero_rows_bcsr
from navierstokes_tpu.ops.spmv import spmv_bell
from navierstokes_tpu.solvers import cg, gmres
from navierstokes_tpu.solvers.precond import (
    BlockJacobiPreconditioner,
    ILU0Preconditioner,
)
from navierstokes_tpu.mesh import channel_mesh
from navierstokes_tpu.sparse.bcsr import BCSR4
from navierstokes_tpu.sparse.bell import bell_from_bcsr


@pytest.fixture(scope="module")
def stokes_system():
    """Small BC-applied Stokes-like linear system (the reference's init solve)."""
    mesh = channel_mesh(3, 2, 2, length=2.0)
    disc = build_discretization(mesh, dtype=jnp.float64)
    u0 = jnp.zeros(disc.ndof)
    op = assemble_operator(disc, u0, 0.01, 50.0, 0.1, LINEAR_TERMS)
    values = zero_rows_bcsr(
        op.values, disc.row_ids, jnp.asarray(disc.indices), disc.diag_slots,
        disc.bc.row_bc,
    )
    op = BCSR4(indptr=op.indptr, indices=op.indices, values=values)
    rhs = disc.bc.value  # BC values as RHS (reference: VecSetValues then solve)
    return disc, op, rhs


def test_gmres_solves_fem_system(stokes_system):
    disc, op, rhs = stokes_system
    dense = op.to_dense()
    x_ref = np.linalg.solve(dense, np.asarray(rhs))

    ell = bell_from_bcsr(op)
    idx = jnp.asarray(ell.indices)

    def matvec(x):
        return spmv_bell(idx, ell.values, x)

    pc = BlockJacobiPreconditioner.from_bcsr(op, disc.diag_slots)
    res = gmres(matvec, rhs, precond=pc, restart=30, rtol=1e-12, atol=1e-12,
                maxiter=2000)
    assert bool(res.converged)
    err = np.linalg.norm(np.asarray(res.x) - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-8, f"relative error {err}"


def test_gmres_restart_path(stokes_system):
    """Force restarts (tiny m) and still converge to the same solution."""
    disc, op, rhs = stokes_system
    dense = op.to_dense()
    x_ref = np.linalg.solve(dense, np.asarray(rhs))
    ell = bell_from_bcsr(op)
    idx = jnp.asarray(ell.indices)
    pc = BlockJacobiPreconditioner.from_bcsr(op, disc.diag_slots)
    res = gmres(
        lambda x: spmv_bell(idx, ell.values, x), rhs, precond=pc,
        restart=8, rtol=1e-12, atol=1e-12, maxiter=5000,
    )
    assert bool(res.converged)
    assert res.iters > 8  # actually restarted
    err = np.linalg.norm(np.asarray(res.x) - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-7


def test_ilu0_beats_jacobi_iterations(stokes_system):
    """ILU(0) oracle converges in fewer iterations; same solution either way
    (the solver-level ILU-parity criterion of SURVEY.md §7)."""
    disc, op, rhs = stokes_system
    ell = bell_from_bcsr(op)
    idx = jnp.asarray(ell.indices)

    def matvec(x):
        return spmv_bell(idx, ell.values, x)

    pc_j = BlockJacobiPreconditioner.from_bcsr(op, disc.diag_slots)
    res_j = gmres(matvec, rhs, precond=pc_j, restart=30, rtol=1e-10, atol=1e-12)

    ilu = ILU0Preconditioner(op)
    # ILU apply is host-side; run an eager (non-jitted) GMRES with it.
    res_i = gmres(matvec, rhs, precond=ilu, restart=30, rtol=1e-10, atol=1e-12)

    assert bool(res_j.converged) and bool(res_i.converged)
    assert int(res_i.iters) <= int(res_j.iters)
    np.testing.assert_allclose(
        np.asarray(res_i.x), np.asarray(res_j.x), rtol=0, atol=1e-6
    )


def test_neumann_boost_reduces_iterations(stokes_system):
    disc, op, rhs = stokes_system
    ell = bell_from_bcsr(op)
    idx = jnp.asarray(ell.indices)

    def matvec(x):
        return spmv_bell(idx, ell.values, x)

    res0 = gmres(
        matvec, rhs,
        precond=BlockJacobiPreconditioner.from_bcsr(op, disc.diag_slots),
        restart=30, rtol=1e-10, atol=1e-12,
    )
    res2 = gmres(
        matvec, rhs,
        precond=BlockJacobiPreconditioner.from_bcsr(
            op, disc.diag_slots, matvec=matvec, order=2
        ),
        restart=30, rtol=1e-10, atol=1e-12,
    )
    assert int(res2.iters) < int(res0.iters)


def test_cg_on_spd_pressure_poisson(stokes_system):
    """CG on the SPD pressure-stabilization (Poisson-like) block."""
    disc, op, rhs = stokes_system
    # Extract the scalar pressure-pressure sub-operator: D + small shift
    dense = np.asarray(op.to_dense())
    p_idx = np.arange(3, dense.shape[0], 4)
    Dp = dense[np.ix_(p_idx, p_idx)] + 0.1 * np.eye(len(p_idx))
    Dp = 0.5 * (Dp + Dp.T)
    b = np.random.default_rng(0).standard_normal(len(p_idx))
    Dpj, bj = jnp.asarray(Dp), jnp.asarray(b)
    res = cg(lambda x: Dpj @ x, bj, rtol=1e-12, atol=1e-14, maxiter=2000)
    assert bool(res.converged)
    x_ref = np.linalg.solve(Dp, b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6, atol=1e-9)


def test_gmres_under_jit(stokes_system):
    """The whole solve must be jittable with operator values as traced args."""
    disc, op, rhs = stokes_system
    ell = bell_from_bcsr(op)
    idx = jnp.asarray(ell.indices)
    diag_slots = disc.diag_slots

    @jax.jit
    def solve(values_bcsr, ell_values, b):
        from navierstokes_tpu.ops.block import block4_inverse, block4_apply

        inv_diag = block4_inverse(values_bcsr[diag_slots], pivot_eps=1e-300)

        def matvec(x):
            return spmv_bell(idx, ell_values, x)

        def pc(r):
            return block4_apply(inv_diag, r)

        res = gmres(matvec, b, precond=pc, restart=30, rtol=1e-10, atol=1e-12)
        return res.x, res.iters, res.converged

    x, iters, conv = solve(op.values, ell.values, rhs)
    assert bool(conv)
    dense = op.to_dense()
    x_ref = np.linalg.solve(dense, np.asarray(rhs))
    err = np.linalg.norm(np.asarray(x) - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-7


def test_ilu_transpose_solve(stokes_system):
    """(LU)^{-T} r: the transposed block triangular solves.

    Parity target: the reference's MatSolveTranspose kernel
    (`src/kernels/baij4_factor_avx2.c:399-498`).  Validated by densifying the
    stored L/U factors and solving the transposed system directly."""
    _, op, _ = stokes_system
    ilu = ILU0Preconditioner(op)
    nb = ilu.nb
    n = 4 * nb
    L = np.eye(n)
    U = np.zeros((n, n))
    for i in range(nb):
        for s in range(ilu.indptr[i], ilu.indptr[i + 1]):
            j = int(ilu.indices[s])
            blk = ilu.vals[s]
            if j < i:
                L[4 * i:4 * i + 4, 4 * j:4 * j + 4] = blk
            elif j == i:
                # diagonal stored inverted
                U[4 * i:4 * i + 4, 4 * j:4 * j + 4] = np.linalg.inv(blk)
            else:
                U[4 * i:4 * i + 4, 4 * j:4 * j + 4] = blk
    rng = np.random.default_rng(3)
    r = rng.standard_normal(n)
    x = ilu.solve_host_transpose(r)
    x_ref = np.linalg.solve((L @ U).T, r)
    np.testing.assert_allclose(x, x_ref, rtol=1e-10, atol=1e-10)
    # and the forward solve against the same densified factors
    np.testing.assert_allclose(
        ilu.solve_host(r), np.linalg.solve(L @ U, r), rtol=1e-10, atol=1e-10
    )


def test_gmres_singular_operator_no_false_convergence():
    """A numerically singular Hessenberg (invariant Krylov subspace that
    does not contain b) must NOT report convergence.  Regression: the old
    absolute 1e-300 breakdown test missed denom=1.4e-17 on a rank-1 64x64
    system and declared resnorm=2.8e-14 while the true residual was 63.5;
    the relative R[k,k]-vs-column-norm test catches it, the solver exits
    via the breakdown stall (bounded, finite x, converged=False)."""
    n = 64
    A = np.zeros((n, n))
    A[0, 0] = 1.0  # rank-1: range(A) = span{e0}, b = ones not reachable
    b = jnp.ones(n, jnp.float64)

    def matvec(x):
        return jnp.asarray(A) @ x

    res = gmres(matvec, b, rtol=1e-10, atol=1e-12, maxiter=50, restart=10)
    x = np.asarray(res.x)
    assert not bool(np.asarray(res.converged))
    assert np.all(np.isfinite(x))
    # The reported residual must be honest: no smaller than the true
    # least-squares optimum sqrt(63) over any Krylov subspace.
    assert float(res.resnorm) > 1.0
    # And the stall guard must have bounded the work (not cycled to
    # maxiter one breakdown-iteration at a time).
    assert int(res.iters) < 10
