"""Global assembly vs dense reference assembly (global_matrix-style)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.fem import elements as el
from navierstokes_tpu.fem.assembly import (
    FULL_JACOBIAN_TERMS,
    LINEAR_TERMS,
    STOKES_TERMS,
    assemble_operator,
    assemble_residual,
    build_discretization,
    local_fields,
)
from navierstokes_tpu.fem.dirichlet import zero_rows_bcsr
from navierstokes_tpu.mesh import channel_mesh
from navierstokes_tpu.sparse.bell import bell_from_bcsr

DT, RE, DELTA = 0.01, 50.0, 0.1


def dense_reference(mesh, u, dt, Re, delta, terms):
    """Dense assembly using the (golden-validated) element functions, with the
    reference's blocked layout (`assemble_jacobian_optimized`,
    `src/solve_newton.c:479-512`)."""
    nv = mesh.nv
    ndof = 4 * nv
    A = np.zeros((ndof, ndof))
    u4 = np.asarray(u).reshape(nv, 4)
    for t in np.asarray(mesh.tets):
        a = jnp.asarray(mesh.coords[t])
        vol = el.tet_volume(a)
        grad = el.tet_gradients(a)
        h = el.tet_diameter(a)
        UL = jnp.asarray(u4[t, :3].T)
        blocks = np.asarray(
            el.element_node_blocks(grad, vol, h, UL, dt, Re, delta, terms=terms)
        )
        for i in range(4):
            for j in range(4):
                A[4 * t[i] : 4 * t[i] + 4, 4 * t[j] : 4 * t[j] + 4] += blocks[i, j]
    return A


@pytest.fixture(scope="module")
def small_problem():
    mesh = channel_mesh(3, 2, 2, length=2.0)
    disc = build_discretization(mesh, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal(disc.ndof))
    return mesh, disc, u


@pytest.mark.parametrize("terms", [STOKES_TERMS, LINEAR_TERMS, FULL_JACOBIAN_TERMS])
def test_assembled_operator_matches_dense(small_problem, terms):
    mesh, disc, u = small_problem
    op = assemble_operator(disc, u, DT, RE, DELTA, terms)
    ref = dense_reference(mesh, u, DT, RE, DELTA, terms)
    np.testing.assert_allclose(op.to_dense(), ref, rtol=1e-11, atol=1e-12)

    ell = bell_from_bcsr(op)
    np.testing.assert_allclose(ell.to_dense(), ref, rtol=1e-11, atol=1e-12)


def test_residual_matches_matrix_action(small_problem):
    """F(u) == (A0 + M/dt + A1 + A2) u - (M/dt) u_old + [B^T; -B; D] terms,
    verified against the dense operator (convection cancellation included)."""
    mesh, disc, u = small_problem
    rng = np.random.default_rng(6)
    u_old = jnp.asarray(rng.standard_normal(disc.ndof))

    F = assemble_residual(
        disc.tets, disc.vol, disc.grad, disc.h, u, u_old, DT, RE, DELTA,
        ndof=disc.ndof,
    )

    # Dense check: full operator (with convection at u) applied to u, minus
    # mass/dt applied to u_old. Note (A1+A2)u == 0 (reference quirk), so the
    # convection part of the dense operator contributes nothing.
    terms = frozenset({"mass_dt", "diffusion", "convection"})
    A = dense_reference(mesh, u, DT, RE, DELTA, terms)
    # u_old correction built directly: only velocity mass couples to u_old.
    Fd = A @ np.asarray(u)
    nv = mesh.nv
    u4_old = np.asarray(u_old).reshape(nv, 4)
    corr = np.zeros(disc.ndof)
    for t in np.asarray(mesh.tets):
        a = jnp.asarray(mesh.coords[t])
        vol = el.tet_volume(a)
        m4 = np.asarray(el.mass_matrix_scalar(vol))
        mterm = m4 @ u4_old[t, :3] / DT  # (4 nodes, 3 comps)
        for i in range(4):
            corr[4 * t[i] : 4 * t[i] + 3] += mterm[i]
    np.testing.assert_allclose(np.asarray(F), Fd - corr, rtol=1e-10, atol=1e-11)


def test_empty_terms_blocks_are_zero(small_problem):
    mesh, disc, u = small_problem
    op = assemble_operator(disc, u, DT, RE, DELTA, frozenset())
    np.testing.assert_allclose(np.asarray(op.values), 0.0)


def test_linear_plus_nonlinear_equals_full(small_problem):
    """J = J_linear + nonlinear(u) (`src/solve_newton.c:1245-1246`)."""
    mesh, disc, u = small_problem
    J_lin = assemble_operator(disc, u, DT, RE, DELTA, LINEAR_TERMS)
    J_nl = assemble_operator(
        disc, u, DT, RE, DELTA, frozenset({"convection", "convection_jacobian"})
    )
    J_full = assemble_operator(disc, u, DT, RE, DELTA, FULL_JACOBIAN_TERMS)
    np.testing.assert_allclose(
        np.asarray(J_lin.values + J_nl.values),
        np.asarray(J_full.values),
        rtol=1e-11,
        atol=1e-12,
    )


def test_zero_rows_bcsr(small_problem):
    mesh, disc, u = small_problem
    op = assemble_operator(disc, u, DT, RE, DELTA, LINEAR_TERMS)
    values = zero_rows_bcsr(
        op.values, disc.row_ids, jnp.asarray(disc.indices), disc.diag_slots,
        disc.bc.row_bc,
    )
    dense = type(op)(indptr=op.indptr, indices=op.indices, values=values).to_dense()
    is_bc = np.asarray(disc.bc.is_bc)
    # BC rows: exactly 1.0 on the diagonal, 0 elsewhere
    for d in np.flatnonzero(is_bc)[:50]:
        row = dense[d].copy()
        assert row[d] == 1.0
        row[d] = 0.0
        np.testing.assert_allclose(row, 0.0)
    # non-BC rows untouched
    ref = op.to_dense()
    free = ~is_bc
    np.testing.assert_allclose(dense[free], ref[free])


def test_local_fields(small_problem):
    mesh, disc, u = small_problem
    UL, PL = local_fields(disc.tets, u)
    u4 = np.asarray(u).reshape(-1, 4)
    t0 = np.asarray(mesh.tets)[0]
    np.testing.assert_allclose(np.asarray(UL)[0], u4[t0, :3].T)
    np.testing.assert_allclose(np.asarray(PL)[0], u4[t0, 3])
