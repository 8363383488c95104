"""Pressure-Schur (SIMPLE-style) block preconditioner (solvers/schur.py).

Algebra: `build_schur_dia` must equal the densely computed
S_hat = A_pp - A_pu diag(F)^{-1} A_up on a real BC-applied operator.
End-to-end: preconditioner='schur' reaches the same Newton state as the
two_level path (a preconditioner changes the Krylov path, not the answer).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.config import NSConfig, SolverConfig
from navierstokes_tpu.mesh import channel_mesh
from navierstokes_tpu.model import NavierStokesSolver

CFG = NSConfig(
    dt=0.01,
    t_final=0.03,
    reynolds=100.0,
    delta=0.1,
    dtype="float64",
    krylov=SolverConfig(rtol=1e-12, atol=1e-13, maxiter=4000,
                        preconditioner="two_level", coarse_agg=4),
    stokes_krylov=SolverConfig(rtol=1e-13, atol=1e-13, maxiter=4000,
                               preconditioner="two_level", coarse_agg=4),
)


@pytest.fixture(scope="module")
def problem():
    return channel_mesh(3, 2, 2, length=2.0)


def _dia_to_dense(offsets, data, n):
    a = np.zeros((n, n))
    for k, d in enumerate(offsets):
        lo, hi = max(0, -d), n - max(0, d)
        rows = np.arange(lo, hi)
        a[rows, rows + d] = data[k, lo:hi]
    return a


def test_schur_complement_algebra(problem):
    """S_hat DIA == dense A_pp - A_pu diag(F)^{-1} A_up on the real
    BC-applied exact-Jacobian operator."""
    from navierstokes_tpu.ops.plane_dia import node_offsets_from_scalar
    from navierstokes_tpu.solvers import schur as sch

    mesh = problem
    s = NavierStokesSolver(mesh, CFG)
    s._ensure_prepared()
    offsets = s.disc.dia_pattern.offsets
    dd = np.asarray(s._jlin_bc_dia)
    nb = mesh.nv

    noffs = node_offsets_from_scalar(offsets)
    a_blk = sch.split_blocks(offsets, dd, nb, noffs)
    fd_inv = sch.diag_f_inverse(a_blk, noffs)
    s_offs, s_np = sch.build_schur_dia(a_blk, noffs, nb, fd_inv)

    a = _dia_to_dense(offsets, dd, 4 * nb)
    iu = np.concatenate([4 * np.arange(nb) + c for c in range(3)])
    iu.sort()                      # velocity dofs in interleaved order
    ip = 4 * np.arange(nb) + 3
    f_full = a[np.ix_(iu, iu)]
    a_pu = a[np.ix_(ip, iu)]
    a_up = a[np.ix_(iu, ip)]
    a_pp = a[np.ix_(ip, ip)]
    fd_full = np.zeros_like(f_full)
    for i in range(nb):
        fd_full[3 * i:3 * i + 3, 3 * i:3 * i + 3] = fd_inv[i]
    s_ref = a_pp - a_pu @ fd_full @ a_up

    s_dense = _dia_to_dense(s_offs, s_np, nb)
    err = np.abs(s_dense - s_ref).max() / np.abs(s_ref).max()
    assert err < 1e-12, f"Schur algebra mismatch {err}"


def test_schur_coarse_builders(problem):
    """Dense velocity/pressure coarse matrices == R A P computed densely."""
    from navierstokes_tpu.ops.plane_dia import node_offsets_from_scalar
    from navierstokes_tpu.solvers import schur as sch
    from navierstokes_tpu.solvers.coarse import build_aggregates

    mesh = problem
    s = NavierStokesSolver(mesh, CFG)
    s._ensure_prepared()
    offsets = s.disc.dia_pattern.offsets
    dd = np.asarray(s._jlin_bc_dia)
    nb = mesh.nv
    noffs = node_offsets_from_scalar(offsets)
    a_blk = sch.split_blocks(offsets, dd, nb, noffs)
    cs = build_aggregates(nb, 4)

    # velocity: P[3i+a, 3g+a] = 1 for g = i//agg
    a = _dia_to_dense(offsets, dd, 4 * nb)
    iu = np.sort(np.concatenate([4 * np.arange(nb) + c for c in range(3)]))
    f_full = a[np.ix_(iu, iu)]
    p_v = np.zeros((3 * nb, 3 * cs.n_agg))
    for i in range(nb):
        for c in range(3):
            p_v[3 * i + c, 3 * (i // cs.agg_size) + c] = 1.0
    ac_ref = p_v.T @ f_full @ p_v
    ac_inv = sch.velocity_coarse_inverse(cs, a_blk, noffs)
    err = np.abs(np.linalg.inv(ac_inv) - ac_ref).max() / np.abs(ac_ref).max()
    assert err < 1e-10, f"velocity coarse mismatch {err}"

    # pressure: scalar aggregation of S_hat
    fd_inv = sch.diag_f_inverse(a_blk, noffs)
    s_offs, s_np = sch.build_schur_dia(a_blk, noffs, nb, fd_inv)
    s_dense = _dia_to_dense(s_offs, s_np, nb)
    p_s = np.zeros((nb, cs.n_agg))
    p_s[np.arange(nb), np.arange(nb) // cs.agg_size] = 1.0
    sc_ref = p_s.T @ s_dense @ p_s
    sc_inv = sch.scalar_coarse_inverse(cs, s_offs, s_np)
    err = np.abs(np.linalg.inv(sc_inv) - sc_ref).max() / np.abs(sc_ref).max()
    assert err < 1e-10, f"pressure coarse mismatch {err}"


def test_schur_e2e_matches_two_level(problem):
    """One Newton time step under the schur preconditioner (lower and full
    shapes, with/without Chebyshev smoothing) converges to the two_level
    solution: stokes init + step, relative error <= 1e-8."""
    mesh = problem

    s0 = NavierStokesSolver(mesh, CFG)
    u0 = s0.stokes_init()
    u_ref, _, st_ref = s0.step(u0, u0, jnp.zeros_like(u0))
    assert bool(st_ref.converged)

    for extra in (
        {"schur_cheby": 0},
        {"schur_cheby": 2},
        {"schur_cheby": 2, "schur_v_cheby": 2},
        {"schur_cheby": 2, "schur_shape": "full"},
    ):
        kr = dataclasses.replace(
            CFG.krylov, preconditioner="schur", spmv="plane", **extra)
        cfg = dataclasses.replace(
            CFG, krylov=kr,
            stokes_krylov=dataclasses.replace(kr, rtol=1e-13))
        s = NavierStokesSolver(mesh, cfg)
        u0s = s.stokes_init()
        u, _, st = s.step(u0s, u0s, jnp.zeros_like(u0s))
        assert bool(st.converged), f"schur did not converge ({extra})"
        err = np.linalg.norm(np.asarray(u) - np.asarray(u_ref)) / (
            np.linalg.norm(np.asarray(u_ref)))
        assert err < 1e-8, f"schur disagreement {err} ({extra})"


def test_schur_validation(problem):
    mesh = problem
    kr = dataclasses.replace(CFG.krylov, preconditioner="schur")
    with pytest.raises(ValueError, match="plane"):
        NavierStokesSolver(mesh, dataclasses.replace(CFG, krylov=kr))
    kr2 = dataclasses.replace(CFG.krylov, preconditioner="schur",
                              spmv="plane", schur_shape="bogus")
    with pytest.raises(ValueError, match="schur_shape"):
        NavierStokesSolver(mesh, dataclasses.replace(CFG, krylov=kr2))
    kr3 = dataclasses.replace(CFG.krylov, preconditioner="schur",
                              spmv="plane")
    with pytest.raises(ValueError, match="exact"):
        NavierStokesSolver(mesh, dataclasses.replace(
            CFG, krylov=kr3, jacobian="reference"))


def test_schur_distributed_raises(problem):
    import jax

    from navierstokes_tpu.parallel.distributed import (
        DistributedNavierStokesSolver,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    kr = dataclasses.replace(CFG.krylov, preconditioner="schur",
                             spmv="plane")
    with pytest.raises(ValueError, match="single-chip"):
        DistributedNavierStokesSolver(
            problem, dataclasses.replace(CFG, krylov=kr),
            devices=jax.devices()[:2])
