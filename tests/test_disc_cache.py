"""Round-trip test for the discretization disk cache.

The host-side pattern build dominates large-mesh setup (~10-20 min
single-core at 2.35M rows); `save_discretization`/`load_discretization`
persist it.  This pins the round-trip: a solver built from the loaded
cache must produce the same step as one built from scratch.
"""

import numpy as np
import jax.numpy as jnp

from navierstokes_tpu.fem.assembly import (
    build_discretization,
    load_discretization,
    save_discretization,
)
from navierstokes_tpu.mesh.box import scaling_series_mesh
from navierstokes_tpu.model import NavierStokesSolver
from navierstokes_tpu.config import NewtonConfig, NSConfig, SolverConfig


def _cfg():
    kv = SolverConfig(rtol=1e-5, atol=1e-6, maxiter=500, neumann_order=0,
                      preconditioner="two_level", coarse_agg=8)
    return NSConfig(dtype="float32",
                    newton=NewtonConfig(rtol=1e-4, atol=1e-5, stol=1e-6,
                                        du_tol=float("inf")),
                    krylov=kv, stokes_krylov=kv)


def test_disc_cache_roundtrip(tmp_path):
    mesh = scaling_series_mesh(1)
    disc = build_discretization(mesh, dtype=jnp.float32)
    save_discretization(disc, str(tmp_path / "d"))
    disc2 = load_discretization(str(tmp_path / "d"), dtype=jnp.float32)

    assert disc2.ndof == disc.ndof
    np.testing.assert_array_equal(np.asarray(disc2.tets), np.asarray(disc.tets))
    np.testing.assert_allclose(np.asarray(disc2.grad), np.asarray(disc.grad),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(disc2.indptr, disc.indptr)
    np.testing.assert_array_equal(
        np.asarray(disc2.dia_elem_map), np.asarray(disc.dia_elem_map))
    np.testing.assert_array_equal(
        np.asarray(disc2.bc.is_bc), np.asarray(disc.bc.is_bc))

    s1 = NavierStokesSolver(mesh, _cfg())
    s2 = NavierStokesSolver(disc2.mesh, _cfg(), disc=disc2)
    u1 = np.asarray(s1.stokes_init())
    u2 = np.asarray(s2.stokes_init())
    np.testing.assert_allclose(u1, u2, rtol=0, atol=1e-6)
    un1, _, st1 = s1.step(jnp.asarray(u1), jnp.asarray(u1),
                          jnp.zeros(s1.disc.ndof, jnp.float32))
    un2, _, st2 = s2.step(jnp.asarray(u2), jnp.asarray(u2),
                          jnp.zeros(s2.disc.ndof, jnp.float32))
    assert int(st1.iters) == int(st2.iters)
    np.testing.assert_allclose(np.asarray(un1), np.asarray(un2),
                               rtol=0, atol=1e-5)


def test_coarse_ml_damp_converges():
    """Damped level-1 smoothing must converge and match the undamped
    solution (the smoothing only changes the preconditioner)."""
    mesh = scaling_series_mesh(2)
    import dataclasses

    cfg0 = _cfg()
    sols = []
    for damp in (1.0, 0.5):
        kv = dataclasses.replace(
            cfg0.krylov, coarse_dense_max=32, coarse_ml_smooth=1,
            coarse_ml_damp=damp)
        cfg = dataclasses.replace(cfg0, krylov=kv, stokes_krylov=kv)
        s = NavierStokesSolver(mesh, cfg)
        u0 = s.stokes_init()
        un, _, st = s.step(u0, u0, jnp.zeros_like(u0))
        assert bool(st.converged)
        sols.append(np.asarray(un))
    d = np.linalg.norm(sols[0] - sols[1]) / np.linalg.norm(sols[1])
    assert d < 1e-3
