"""Checkpoint/resume and ILU(k) level tests."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.config import NSConfig, SolverConfig
from navierstokes_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from navierstokes_tpu.mesh import channel_mesh
from navierstokes_tpu.model import NavierStokesSolver

CFG = NSConfig(
    dt=0.01, t_final=0.04, reynolds=100.0, delta=0.1, dtype="float64",
    krylov=SolverConfig(rtol=1e-12, atol=1e-13, maxiter=4000),
    stokes_krylov=SolverConfig(rtol=1e-13, atol=1e-13, maxiter=4000),
)


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ck.npz")
    u = np.random.default_rng(0).standard_normal(20)
    save_checkpoint(path, cfg=CFG, step=7, u=u, u_old=u * 2, delta_u=u * 3)
    step, u2, u_old2, du2 = load_checkpoint(path, cfg=CFG)
    assert step == 7
    np.testing.assert_allclose(u2, u)
    np.testing.assert_allclose(u_old2, u * 2)
    np.testing.assert_allclose(du2, u * 3)


def test_checkpoint_fingerprint_mismatch(tmp_path):
    path = str(tmp_path / "ck.npz")
    u = np.zeros(8)
    save_checkpoint(path, cfg=CFG, step=1, u=u, u_old=u)
    other = dataclasses.replace(CFG, reynolds=999.0)
    with pytest.raises(ValueError, match="fingerprint"):
        load_checkpoint(path, cfg=other)


def test_resume_equals_uninterrupted(tmp_path):
    """Run 4 steps straight == run 2, checkpoint, resume, run 2 more."""
    mesh = channel_mesh(3, 2, 2, length=2.0)
    solver = NavierStokesSolver(mesh, CFG)
    u0 = solver.stokes_init()

    u_straight = solver.run(4, u0=u0, monitor=False)

    # interrupted run
    path = str(tmp_path / "ck.npz")
    u_half = solver.run(
        2, u0=u0, monitor=False, checkpoint_path=path, checkpoint_every=2
    )
    step, u, u_old, delta_u = load_checkpoint(path, cfg=CFG)
    assert step == 2
    np.testing.assert_allclose(np.asarray(u_half), u)

    # resume: note run() sets u_old = u0 internally, so feed state manually
    uj = jnp.asarray(u)
    du = jnp.asarray(delta_u)
    u_old_j = jnp.asarray(u_old)
    for _ in range(2):
        uj_new, du, _ = solver.step(uj, u_old_j, du)
        u_old_j = uj_new
        uj = uj_new

    err = np.linalg.norm(np.asarray(uj) - np.asarray(u_straight)) / (
        np.linalg.norm(np.asarray(u_straight))
    )
    assert err < 1e-12, f"resume drift {err}"


@pytest.mark.slow
def test_resume_cli_new_process(tmp_path):
    """`run.py --resume` accepts a checkpoint its own run() wrote — in a NEW
    process, with the default (coarse_agg=None) config family.  This is the
    exact path round 4 shipped broken (fingerprint of resolved vs unresolved
    config); it also pins global step numbering + delta_u warm start on
    resume: the resumed trajectory must match the uninterrupted one."""
    import os
    import subprocess
    import sys

    from navierstokes_tpu.io.dat import read_petsc_vec

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    base = [sys.executable, "-m", "navierstokes_tpu.run", "--cpu",
            "--nx", "3", "--ny", "2", "--nz", "2",
            "--dt", "0.01", "--re", "100.0"]

    def run(extra):
        r = subprocess.run(base + extra, capture_output=True, text=True,
                           timeout=900, cwd=repo, env=env)
        assert r.returncode == 0, r.stderr[-3000:] + r.stdout[-1000:]
        return r

    straight = str(tmp_path / "straight")
    resumed = str(tmp_path / "resumed")
    ck = str(tmp_path / "ck.npz")
    run(["--steps", "4", "--save", "--save-dir", straight])
    run(["--steps", "2", "--checkpoint", ck, "--checkpoint-every", "2"])
    r = run(["--steps", "4", "--resume", ck, "--save", "--save-dir", resumed])
    assert "resumed from step 2" in r.stdout
    # Global step numbering continues: the resumed run writes steps 3 and 4.
    assert not os.path.exists(os.path.join(resumed, "solution_step0002.dat"))
    a = read_petsc_vec(os.path.join(straight, "solution_step0004.dat"))
    b = read_petsc_vec(os.path.join(resumed, "solution_step0004.dat"))
    np.testing.assert_allclose(b, a, rtol=0, atol=1e-13)


def test_ilu_levels_reduce_iterations():
    """ILU(k) with higher k converges GMRES in fewer iterations (the
    PCFactorSetLevels behavior the reference relies on)."""
    from navierstokes_tpu.fem.assembly import (
        LINEAR_TERMS, assemble_operator, build_discretization,
    )
    from navierstokes_tpu.fem.dirichlet import zero_rows_bcsr
    from navierstokes_tpu.solvers import gmres
    from navierstokes_tpu.solvers.precond import ILUPreconditioner
    from navierstokes_tpu.sparse.bcsr import BCSR4
    from navierstokes_tpu.sparse.dia import dia_from_bcsr
    from navierstokes_tpu.ops.spmv import spmv_dia

    mesh = channel_mesh(3, 2, 2, length=2.0)
    disc = build_discretization(mesh, dtype=jnp.float64)
    op = assemble_operator(disc, jnp.zeros(disc.ndof), 0.01, 50.0, 0.1,
                           LINEAR_TERMS)
    vals = zero_rows_bcsr(op.values, disc.row_ids, jnp.asarray(disc.indices),
                          disc.diag_slots, disc.bc.row_bc)
    op = BCSR4(indptr=op.indptr, indices=op.indices, values=vals)
    dia = dia_from_bcsr(op)
    rhs = disc.bc.value

    def matvec(x):
        return spmv_dia(dia.offsets, dia.data, x)

    iters = {}
    for level in (0, 2):
        pc = ILUPreconditioner(op, level=level)
        res = gmres(matvec, rhs, precond=pc, restart=30, rtol=1e-10,
                    atol=1e-12, maxiter=2000)
        assert bool(res.converged)
        iters[level] = int(res.iters)
    assert iters[2] <= iters[0]
    # more fill in the factor
    pc2 = ILUPreconditioner(op, level=2)
    pc0 = ILUPreconditioner(op, level=0)
    assert len(pc2.indices) > len(pc0.indices)
