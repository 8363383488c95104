"""End-to-end transient solve vs an independent dense-numpy implementation.

The dense reference below re-implements the reference solver's exact
semantics (`src/solve_newton.c:1203-1297`) with numpy dense linear algebra and
direct solves — an independent code path sharing only the (golden-validated)
element formulas.  Matching it validates assembly, BC handling, GMRES, and
the Newton/time loop together.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.config import NewtonConfig, NSConfig, SolverConfig
from navierstokes_tpu.fem import elements as el
from navierstokes_tpu.mesh import channel_mesh
from navierstokes_tpu.model import NavierStokesSolver

CFG = NSConfig(
    dt=0.01,
    t_final=0.03,
    reynolds=100.0,
    delta=0.1,
    dtype="float64",
    krylov=SolverConfig(rtol=1e-12, atol=1e-13, maxiter=4000, neumann_order=2),
    stokes_krylov=SolverConfig(rtol=1e-13, atol=1e-13, maxiter=4000, neumann_order=2),
)


def dense_element_matrices(mesh, Re, dt, delta):
    """Per-element dense matrices via the golden-validated element functions."""
    mats = []
    for t in np.asarray(mesh.tets):
        a = jnp.asarray(mesh.coords[t])
        vol = el.tet_volume(a)
        grad = el.tet_gradients(a)
        h = el.tet_diameter(a)
        M = np.asarray(el.mass_matrix(vol))
        A0 = np.asarray(el.diffusion_matrix(grad, vol, Re))
        B = np.asarray(el.divergence_matrix(grad, vol))
        D = np.asarray(el.pressure_stabilization_matrix(grad, vol, h, delta))
        mats.append((t, np.asarray(grad), float(vol), M, A0, B, D))
    return mats


class DenseNewtonReference:
    """Independent numpy implementation of the reference Newton time loop."""

    def __init__(self, mesh, cfg: NSConfig):
        self.mesh, self.cfg = mesh, cfg
        nv = mesh.nv
        self.ndof = 4 * nv
        # BC table (`src/solve_newton.c:995-1035`)
        rows, values = [], []
        for node in range(nv):
            tag = mesh.node_tags[node]
            if tag in (1, 2):
                y, z = mesh.coords[node, 1], mesh.coords[node, 2]
                ux = (1 - y * y) * (1 - z * z) if tag == 2 else 0.0
                for d2 in range(3):
                    rows.append(4 * node + d2)
                    values.append(ux if d2 == 0 else 0.0)
            elif tag in (4, 5):
                rows.append(4 * node + 1)
                values.append(0.0)
            elif tag in (6, 7):
                rows.append(4 * node + 2)
                values.append(0.0)
        self.bc_rows = np.asarray(rows, dtype=np.int64)
        self.bc_values = np.asarray(values)
        self.mats = dense_element_matrices(mesh, cfg.reynolds, cfg.dt, cfg.delta)
        self.mats_stokes = dense_element_matrices(
            mesh, cfg.stokes_reynolds, cfg.dt, cfg.delta
        )

    def _vdofs(self, t):
        return np.concatenate([[4 * n, 4 * n + 1, 4 * n + 2] for n in t])

    def _pdofs(self, t):
        return 4 * np.asarray(t) + 3

    def assemble(self, u, mats, include_mass, include_convection):
        A = np.zeros((self.ndof, self.ndof))
        u4 = u.reshape(-1, 4)
        for (t, grad, vol, M, A0, B, D) in mats:
            vd, pd = self._vdofs(t), self._pdofs(t)
            vv = A0.copy()
            if include_mass:
                vv += M / self.cfg.dt
            if include_convection:
                UL = jnp.asarray(u4[t, :3].T)
                g = jnp.asarray(grad)
                vv += np.asarray(el.convection_matrix_linearized(UL, g, vol))
                vv += np.asarray(el.convection_matrix_nonlinear(UL, g, vol))
                a1j, a2j = el.convection_jacobian(UL, g, vol)
                vv += np.asarray(a1j) + np.asarray(a2j)
            A[np.ix_(vd, vd)] += vv
            A[np.ix_(vd, pd)] += B.T
            A[np.ix_(pd, vd)] -= B
            A[np.ix_(pd, pd)] += D
        return A

    def residual(self, u, u_old):
        F = np.zeros(self.ndof)
        u4, uo4 = u.reshape(-1, 4), u_old.reshape(-1, 4)
        dt = self.cfg.dt
        for (t, grad, vol, M, A0, B, D) in self.mats:
            vd, pd = self._vdofs(t), self._pdofs(t)
            ul = u4[t, :3].reshape(-1)      # u[3j+c] layout
            ulo = uo4[t, :3].reshape(-1)
            pl = u4[t, 3]
            UL = jnp.asarray(u4[t, :3].T)
            g = jnp.asarray(grad)
            A1 = np.asarray(el.convection_matrix_linearized(UL, g, vol))
            A2 = np.asarray(el.convection_matrix_nonlinear(UL, g, vol))
            F[vd] += (A0 + M / dt) @ ul - (M / dt) @ ulo + (A1 + A2) @ ul + B.T @ pl
            F[pd] += -B @ ul + D @ pl
        return F

    def zero_rows(self, A):
        A = A.copy()
        A[self.bc_rows, :] = 0.0
        A[self.bc_rows, self.bc_rows] = 1.0
        return A

    def stokes_init(self):
        S = self.assemble(np.zeros(self.ndof), self.mats_stokes, False, False)
        S = self.zero_rows(S)
        rhs = np.zeros(self.ndof)
        rhs[self.bc_rows] = self.bc_values
        return np.linalg.solve(S, rhs)

    def run(self, n_steps):
        cfg = self.cfg
        u = self.stokes_init()
        u_old = u.copy()
        delta_u = np.zeros(self.ndof)
        nw = cfg.newton
        for _ in range(n_steps):
            res0 = None
            for it in range(nw.max_iter):
                u[self.bc_rows] = self.bc_values
                F = self.residual(u, u_old)
                F[self.bc_rows] = 0.0
                res = np.linalg.norm(F)
                if it == 0:
                    res0 = res
                du = np.linalg.norm(delta_u)
                if ((res < nw.rtol * res0) or (res < nw.atol)) and du < nw.atol:
                    break
                J = self.assemble(u, self.mats, True, True)
                J = self.zero_rows(J)
                delta_u = np.linalg.solve(J, -F)
                u = u + delta_u
                if it > 5 and du < nw.stol:
                    break
            u_old = u.copy()
        return u


@pytest.fixture(scope="module")
def problem():
    mesh = channel_mesh(3, 2, 2, length=2.0)
    return mesh


def test_stokes_init_matches_dense(problem):
    mesh = problem
    solver = NavierStokesSolver(mesh, CFG)
    ref = DenseNewtonReference(mesh, CFG)
    u0 = np.asarray(solver.stokes_init())
    u0_ref = ref.stokes_init()
    err = np.linalg.norm(u0 - u0_ref) / np.linalg.norm(u0_ref)
    assert err < 1e-8, f"stokes relative error {err}"


def test_transient_matches_dense(problem):
    mesh = problem
    solver = NavierStokesSolver(mesh, CFG)
    ref = DenseNewtonReference(mesh, CFG)

    u_ref = ref.run(3)
    u = solver.run(3, monitor=False)
    err = np.linalg.norm(np.asarray(u) - u_ref) / np.linalg.norm(u_ref)
    assert err < 1e-6, f"transient relative L2 error {err}"


def test_newton_converges_and_reports(problem):
    mesh = problem
    solver = NavierStokesSolver(mesh, CFG)
    u0 = solver.stokes_init()
    u, delta_u, stats = solver.step(u0, u0, jnp.zeros_like(u0))
    assert bool(stats.converged)
    assert int(stats.iters) <= CFG.newton.max_iter
    res_h = np.asarray(stats.res_hist)
    valid = res_h[~np.isnan(res_h)]
    assert len(valid) == int(stats.iters)
    # residual decreases from first Newton iterate to the last
    if len(valid) > 1:
        assert valid[-1] < valid[0]


def test_exact_and_reference_jacobian_agree(problem):
    """Both Jacobian modes converge to the same state (the residual's root);
    'exact' needs far fewer Newton iterations."""
    import dataclasses

    mesh = problem
    cfg_exact = dataclasses.replace(CFG, jacobian="exact")
    cfg_ref = dataclasses.replace(CFG, jacobian="reference")
    s_e = NavierStokesSolver(mesh, cfg_exact)
    s_r = NavierStokesSolver(mesh, cfg_ref)
    u0 = s_e.stokes_init()

    u_e, _, st_e = s_e.step(u0, u0, jnp.zeros_like(u0))
    u_r, _, st_r = s_r.step(u0, u0, jnp.zeros_like(u0))
    assert bool(st_e.converged) and bool(st_r.converged)
    assert int(st_e.iters) <= int(st_r.iters)
    err = np.linalg.norm(np.asarray(u_e) - np.asarray(u_r)) / np.linalg.norm(
        np.asarray(u_r)
    )
    assert err < 1e-8, f"mode disagreement {err}"


def test_residual_modes_agree(problem):
    """Operator-form residual == elementwise residual to roundoff."""
    import dataclasses

    mesh = problem
    cfg_op = dataclasses.replace(CFG, residual="operator")
    cfg_el = dataclasses.replace(CFG, residual="elementwise")
    s_op = NavierStokesSolver(mesh, cfg_op)
    s_el = NavierStokesSolver(mesh, cfg_el)
    u0 = s_op.stokes_init()
    u_op, _, _ = s_op.step(u0, u0, jnp.zeros_like(u0))
    u_el, _, _ = s_el.step(u0, u0, jnp.zeros_like(u0))
    err = np.linalg.norm(np.asarray(u_op) - np.asarray(u_el)) / np.linalg.norm(
        np.asarray(u_el)
    )
    assert err < 1e-10, f"residual-mode disagreement {err}"


def test_two_level_multilevel_coarse(problem):
    """two_level with the coarse level too large for a dense inverse
    (coarse_dense_max forces the sparse-DIA + second-level path) reaches the
    same state as the plain block-Jacobi path."""
    import dataclasses

    mesh = problem
    kr_ml = SolverConfig(rtol=1e-12, atol=1e-13, maxiter=4000,
                         preconditioner="two_level", coarse_agg=4,
                         coarse_dense_max=32)
    cfg_ml = dataclasses.replace(CFG, krylov=kr_ml,
                                 stokes_krylov=dataclasses.replace(
                                     kr_ml, rtol=1e-13))
    s_ml = NavierStokesSolver(mesh, cfg_ml)
    # the guard actually chose the multilevel path
    assert s_ml._exact_prep[6][0] == "ml"
    s_bj = NavierStokesSolver(mesh, CFG)
    u0 = s_bj.stokes_init()
    u_ml, _, st_ml = s_ml.step(u0, u0, jnp.zeros_like(u0))
    u_bj, _, st_bj = s_bj.step(u0, u0, jnp.zeros_like(u0))
    assert bool(st_ml.converged) and bool(st_bj.converged)
    err = np.linalg.norm(np.asarray(u_ml) - np.asarray(u_bj)) / (
        np.linalg.norm(np.asarray(u_bj))
    )
    assert err < 1e-8, f"multilevel two_level disagreement {err}"


def test_ca_gmres_method_in_model(problem):
    """method='ca_gmres' reaches the same state as standard GMRES."""
    import dataclasses

    mesh = problem
    cfg_ca = dataclasses.replace(
        CFG,
        krylov=dataclasses.replace(CFG.krylov, method="ca_gmres", rtol=1e-10),
        stokes_krylov=dataclasses.replace(CFG.stokes_krylov,
                                          method="ca_gmres", rtol=1e-10),
    )
    s_std = NavierStokesSolver(mesh, CFG)
    s_ca = NavierStokesSolver(mesh, cfg_ca)
    u0 = s_std.stokes_init()
    u_std, _, st1 = s_std.step(u0, u0, jnp.zeros_like(u0))
    u_ca, _, st2 = s_ca.step(u0, u0, jnp.zeros_like(u0))
    assert bool(st1.converged) and bool(st2.converged)
    err = np.linalg.norm(np.asarray(u_ca) - np.asarray(u_std)) / (
        np.linalg.norm(np.asarray(u_std))
    )
    assert err < 1e-6, f"ca_gmres model disagreement {err}"


def test_bf16_matvec_mode(problem):
    """bfloat16 operator storage converges at loose tolerances and lands
    near the full-precision solution."""
    import dataclasses

    mesh = problem
    cfg32 = dataclasses.replace(
        CFG,
        dtype="float32",
        krylov=SolverConfig(rtol=1e-4, atol=1e-5, maxiter=3000,
                            neumann_order=1),
        stokes_krylov=SolverConfig(rtol=1e-4, atol=1e-5, maxiter=3000,
                                   neumann_order=1),
        newton=NewtonConfig(rtol=1e-3, atol=1e-4, du_tol=float("inf")),
    )
    cfg16 = dataclasses.replace(
        cfg32,
        krylov=dataclasses.replace(cfg32.krylov, matvec_dtype="bfloat16"),
        stokes_krylov=dataclasses.replace(cfg32.stokes_krylov,
                                          matvec_dtype="bfloat16"),
    )
    s32 = NavierStokesSolver(mesh, cfg32)
    s16 = NavierStokesSolver(mesh, cfg16)
    u0 = s32.stokes_init()
    u32, _, st32 = s32.step(u0, u0, jnp.zeros_like(u0))
    u16, _, st16 = s16.step(u0, u0, jnp.zeros_like(u0))
    assert bool(st32.converged) and bool(st16.converged)
    rel = np.linalg.norm(np.asarray(u16) - np.asarray(u32)) / np.linalg.norm(
        np.asarray(u32)
    )
    assert rel < 5e-2, f"bf16 solution drift {rel}"


def test_save_outputs(problem, tmp_path):
    from navierstokes_tpu.io.dat import read_petsc_vec

    mesh = problem
    solver = NavierStokesSolver(mesh, CFG)
    out = str(tmp_path)
    u = solver.run(
        2, save_dir=out, save_every=1, write_vtu_files=True, monitor=False
    )
    dat = tmp_path / "solution_step0002.dat"
    assert dat.exists()
    with open(dat) as f:
        head = f.read().split("\n")[:2]
    assert head == ["Vec Object: 1 MPI process", "  type: seq"]
    back = read_petsc_vec(str(dat))
    # %g has 6 significant digits
    np.testing.assert_allclose(back, np.asarray(u), rtol=1e-4, atol=1e-6)
    assert (tmp_path / "time_series.pvd").exists()
    assert (tmp_path / "solution_0001.vtu").exists()


def test_release_assembly_buffers_preserves_stepping():
    """After `release_assembly_buffers` (the huge-mesh memory lever) the
    exact/operator transient continues bit-identically: the step traces only
    the prepared operators, never the assembly arrays."""
    import jax.numpy as jnp

    from navierstokes_tpu.config import NSConfig, SolverConfig
    from navierstokes_tpu.mesh import channel_mesh
    from navierstokes_tpu.model import NavierStokesSolver

    cfg = NSConfig(
        dt=0.01, reynolds=100.0, delta=0.1, dtype="float64",
        krylov=SolverConfig(rtol=1e-12, atol=1e-13, maxiter=2000),
        stokes_krylov=SolverConfig(rtol=1e-12, atol=1e-13, maxiter=2000),
    )
    mesh = channel_mesh(6, 3, 3, length=3.0)

    ref = NavierStokesSolver(mesh, cfg)
    u0 = ref.stokes_init()
    z = jnp.zeros_like(u0)
    u_ref, _, _ = ref.step(u0, u0, z)

    rel = NavierStokesSolver(mesh, cfg)
    u0b = rel.stokes_init()
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u0b))
    rel.release_assembly_buffers()
    assert rel.disc.dia_elem_map is None and "elem_map" not in rel._consts
    u_rel, _, stats = rel.step(u0b, u0b, z)
    assert bool(stats.converged)
    np.testing.assert_array_equal(np.asarray(u_ref), np.asarray(u_rel))


def test_f64_slow_convergence_not_truncated():
    """The f32 no-progress exit (res >= 0.9*prev at it>2) must NOT fire in
    f64: in jacobian="reference" mode Newton is a fixed-point iteration (the
    assembled convection Jacobian is not the true Jacobian of the linear
    residual) whose per-iteration contraction legitimately exceeds 0.9 while
    still converging.  At dt=1.4/Re=1400 the step converges in ~36 iterations
    with ~23 ratios >= 0.9 — the ungated exit would truncate it at iteration
    ~6 with converged=False (round-4 verdict weak #7)."""
    mesh = channel_mesh(4, 2, 2)
    cfg = NSConfig(
        dt=1.4, t_final=5.6, reynolds=1400.0, delta=0.1, dtype="float64",
        jacobian="reference", residual="reference",
        newton=NewtonConfig(rtol=1e-4, atol=1e-12, max_iter=100,
                            du_tol=float("inf")),
        krylov=SolverConfig(rtol=1e-12, atol=1e-14, maxiter=4000),
        stokes_krylov=SolverConfig(rtol=1e-12, atol=1e-13, maxiter=4000),
    )
    s = NavierStokesSolver(mesh, cfg)
    u0 = jnp.asarray(s.stokes_init())
    u, du, stats = s.step(u0, u0, jnp.zeros_like(u0))
    it = int(stats.iters)
    rh = np.asarray(stats.res_hist)
    ratios = rh[1:it] / rh[:it - 1]
    assert bool(stats.converged), f"truncated at it={it}, ratios={ratios[:8]}"
    # The adversarial condition was actually exercised: slow (>0.9) progress
    # occurred after it=2, where the f32 exit would have fired.
    assert (ratios[2:] >= 0.9).sum() >= 5
    assert it > 20


def test_coarse_cheby_smoother(problem):
    """two_level with a degree-2 Chebyshev post-smoother (coarse_cheby=2)
    reaches the same state as the plain (damped-Jacobi-smoothed) two_level
    path, on both the scalar-DIA ('tl') and component-plane ('tlp') layouts,
    and the prep tuple carries the static (theta, delta, degree) interval."""
    import dataclasses

    mesh = problem
    base_kr = SolverConfig(rtol=1e-12, atol=1e-13, maxiter=4000,
                           preconditioner="two_level", coarse_agg=4)

    def mk(kr):
        return dataclasses.replace(
            CFG, krylov=kr,
            stokes_krylov=dataclasses.replace(kr, rtol=1e-13))

    s0 = NavierStokesSolver(mesh, mk(base_kr))
    u0 = s0.stokes_init()
    u_ref, _, st_ref = s0.step(u0, u0, jnp.zeros_like(u0))
    assert bool(st_ref.converged)

    for extra in ({}, {"spmv": "plane"}):
        kr = dataclasses.replace(base_kr, coarse_cheby=2, **extra)
        s = NavierStokesSolver(mesh, mk(kr))
        cheby = s._exact_prep[-1]
        assert isinstance(cheby, tuple) and len(cheby) == 3
        theta, delta, deg = cheby
        assert deg == 2 and delta > 0 and theta > delta  # interval > 0
        u, _, st = s.step(u0, u0, jnp.zeros_like(u0))
        assert bool(st.converged)
        err = np.linalg.norm(np.asarray(u) - np.asarray(u_ref)) / (
            np.linalg.norm(np.asarray(u_ref)))
        assert err < 1e-8, f"cheby disagreement {err} ({extra})"


def test_coarse_cheby_validation(problem):
    """coarse_cheby demands two_level; bad fractions are rejected."""
    import dataclasses

    mesh = problem
    kr = SolverConfig(coarse_cheby=2)  # default preconditioner != two_level
    with pytest.raises(ValueError, match="two_level"):
        NavierStokesSolver(mesh, dataclasses.replace(CFG, krylov=kr))
    kr2 = SolverConfig(preconditioner="two_level", coarse_agg=4,
                       coarse_cheby=2, coarse_cheby_fraction=1.5)
    with pytest.raises(ValueError, match="fraction"):
        NavierStokesSolver(mesh, dataclasses.replace(
            CFG, krylov=kr2,
            stokes_krylov=dataclasses.replace(kr2, rtol=1e-13)))
