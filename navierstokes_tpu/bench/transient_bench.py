"""End-to-end transient step benchmark over the scaling-series meshes.

The solver-level analog of `spmv_bench`: per-step wall time of the jitted
Newton step with the run.py f32 defaults (or any knob overridden on the
command line), with per-phase setup timing.  Feeds
`benchlogs/transient_scaling.txt` — the reference's corresponding artifact
is the completed mmesh run behind `res/solution_step*.dat` plus the
per-phase `-log_view` output (`src/solve_newton.c:1290-1310`).

Usage:
    python -m navierstokes_tpu.bench.transient_bench --matrix-id 8 \
        [--steps 5] [--coarse-agg 48] [--coarse-ml-smooth 2] \
        [--coarse-ml-cycles 1] [--preconditioner two_level] [--restart 30]

Prints one summary line per run:
    TRANSIENT id=8 ndof=511024 setup_s=... stokes_s=... compile_s=... \
        step_ms=... newton=N lin=M cfg=...
"""

from __future__ import annotations

import argparse
import sys
import time


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def run_one(matrix_id: int, steps: int, overrides: dict) -> dict:
    import jax.numpy as jnp

    from navierstokes_tpu.config import NewtonConfig, NSConfig, SolverConfig
    from navierstokes_tpu.mesh.box import scaling_series_mesh
    from navierstokes_tpu.model import NavierStokesSolver

    krylov = SolverConfig(rtol=1e-5, atol=1e-6, maxiter=1000,
                          neumann_order=0, preconditioner="two_level",
                          coarse_agg=48)
    import dataclasses
    if overrides:
        krylov = dataclasses.replace(krylov, **overrides)
    cfg = NSConfig(
        dt=1e-3, reynolds=300.0, delta=0.05, dtype="float32",
        newton=NewtonConfig(rtol=1e-4, atol=1e-5, stol=1e-6,
                            du_tol=float("inf")),
        krylov=krylov, stokes_krylov=krylov,
    )

    mesh = scaling_series_mesh(matrix_id)
    t0 = time.perf_counter()
    solver = NavierStokesSolver(mesh, cfg)
    solver._ensure_prepared()
    setup_s = time.perf_counter() - t0
    log(f"id={matrix_id} ndof={solver.disc.ndof} setup {setup_s:.1f} s")

    t0 = time.perf_counter()
    u = solver.stokes_init()
    u.block_until_ready()
    stokes_s = time.perf_counter() - t0
    log(f"stokes init {stokes_s:.1f} s (incl compile)")

    u_old, du = u, jnp.zeros_like(u)
    t0 = time.perf_counter()
    u1, du1, stats = solver.step(u, u_old, du)
    u1.block_until_ready()
    compile_s = time.perf_counter() - t0
    log(f"step 1 (incl compile) {compile_s:.1f} s "
        f"newton={int(stats.iters)} lin={int(stats.lin_iters)}")

    u_prev, u_cur, du_cur = u, u1, du1
    t0 = time.perf_counter()
    for _ in range(steps):
        u_next, du_cur, stats = solver.step(u_cur, u_prev, du_cur)
        u_prev, u_cur = u_cur, u_next
    u_cur.block_until_ready()
    step_ms = (time.perf_counter() - t0) / steps * 1e3
    import numpy as np

    assert np.all(np.isfinite(np.asarray(u_cur))), "non-finite state"
    result = {
        "id": matrix_id, "ndof": solver.disc.ndof,
        "setup_s": round(setup_s, 1), "stokes_s": round(stokes_s, 1),
        "compile_s": round(compile_s, 1), "step_ms": round(step_ms, 1),
        "newton": int(stats.iters), "lin": int(stats.lin_iters),
    }
    cfg_str = ",".join(f"{k}={v}" for k, v in sorted(overrides.items())) or \
        "defaults"
    print("TRANSIENT " +
          " ".join(f"{k}={v}" for k, v in result.items()) +
          f" cfg={cfg_str}", flush=True)
    return result


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--matrix-id", type=int, required=True)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--preconditioner", default=None)
    p.add_argument("--coarse-agg", type=int, default=None)
    p.add_argument("--coarse-ml-smooth", type=int, default=None)
    p.add_argument("--coarse-ml-cycles", type=int, default=None)
    p.add_argument("--coarse-dense-max", type=int, default=None)
    p.add_argument("--restart", type=int, default=None)
    p.add_argument("--neumann-order", type=int, default=None)
    args = p.parse_args(argv)
    overrides = {
        k: v for k, v in (
            ("preconditioner", args.preconditioner),
            ("coarse_agg", args.coarse_agg),
            ("coarse_ml_smooth", args.coarse_ml_smooth),
            ("coarse_ml_cycles", args.coarse_ml_cycles),
            ("coarse_dense_max", args.coarse_dense_max),
            ("restart", args.restart),
            ("neumann_order", args.neumann_order),
        ) if v is not None
    }
    run_one(args.matrix_id, args.steps, overrides)


if __name__ == "__main__":
    main()
