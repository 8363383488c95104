"""Benchmark: block-sparse SpMV on the mmesh-class NS operator, real TPU.

Reproduces the reference's headline benchmark (`mpk/log/log_SPMV.txt`,
`src/benchmark_spmv.c`): y = A x on the 121k-row Navier–Stokes BAIJ-4x4
operator, GFLOP/s = 2*nnz/t (the reference's own formula,
`src/benchmark_spmv.c:234`).  Baseline to beat: 3.85 GFLOP/s (3.457 ms) for
the hand-written AVX2 BCSR4 kernel on one x86 core (BASELINE.md).

Prints ONE JSON line; extra detail goes to stderr.
"""

import json
import sys
import time

import numpy as np

BASELINE_GFLOPS = 3.85  # BCSR4 AVX2, matrix 6 (121,480 rows), BASELINE.md


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def best_time_chained(step_fn, x0, reps=50, best_of=5):
    """Best-of-N wall time per iteration of a DATA-DEPENDENT chain.

    Each iteration feeds its (cheaply normalized) output into the next so the
    runtime cannot overlap iterations — honest per-op latency, unlike timing
    independent same-input dispatches.  Mirrors the reference's best-of-5
    methodology (`src/main.c:127-137`).
    """
    import jax
    import jax.numpy as jnp

    def body(_, v):
        y = step_fn(v)
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)

    chain = jax.jit(lambda v: jax.lax.fori_loop(0, reps, body, v))
    jax.block_until_ready(chain(x0))  # warmup / compile
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(x0))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from navierstokes_tpu.fem.assembly import (
        LINEAR_TERMS,
        assemble_operator,
        build_discretization,
    )
    from navierstokes_tpu.mesh.box import channel_mesh
    from navierstokes_tpu.ops.spmv import spmv_bell
    from navierstokes_tpu.sparse.bell import bell_from_bcsr

    backend = jax.default_backend()
    dtype = jnp.float32
    log(f"backend={backend} devices={jax.devices()}")

    # mmesh-class: ~30k nodes -> ~121k rows (reference matrix 6: 30,370 nodes)
    mesh = channel_mesh(46, 24, 24, length=4.0, obstacle=True)
    log(f"mesh: {mesh.nv} nodes ({4 * mesh.nv} rows), {mesh.ne} tets")

    disc = build_discretization(mesh, dtype=dtype)
    op = assemble_operator(
        disc, jnp.zeros(disc.ndof, dtype), 0.001, 300.0, 0.05, LINEAR_TERMS
    )
    ell = bell_from_bcsr(op)
    nnz = ell.nnz
    log(f"operator: {ell.nnzb} blocks, nnz={nnz}, slots={ell.slots}")

    idx = jnp.asarray(ell.indices)
    vals = ell.values
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(disc.ndof), dtype=dtype
    )

    t = best_time_chained(lambda v: spmv_bell(idx, vals, v), x)
    gflops = 2.0 * nnz / t / 1e9
    log(f"spmv_bell: {t * 1e3:.3f} ms -> {gflops:.2f} GFLOP/s "
        f"({t * 1e3 / 3.457:.2f}x of reference AVX2 time on same-class matrix)")

    print(json.dumps({
        "metric": "spmv_gflops_121k_ns_matrix",
        "value": round(gflops, 3),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / BASELINE_GFLOPS, 3),
    }))


if __name__ == "__main__":
    main()
