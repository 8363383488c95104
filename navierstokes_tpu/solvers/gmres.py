"""Restarted GMRES(m) as a jitted `lax.while_loop` — the KSPGMRES equivalent.

Semantics match the reference's solver configuration
(`src/solve_newton.c:1154-1163`): left preconditioning, CGS2 (twice-iterated
classical Gram–Schmidt) Arnoldi — numerically as robust as the reference's
modified Gram–Schmidt but expressed as four fused GEMVs instead of a
sequential dot/axpy chain — Givens-rotation least squares (vectorized via an
associative scan over the rotation recurrence), convergence when the preconditioned
residual norm drops below max(rtol * ||r0||_pre, atol) (PETSc
`KSPConvergedDefault`), restart length m, total-iteration cap.

Everything is static-shaped: the Krylov basis is a fixed (m+1, n) buffer and
the Hessenberg/Givens state fixed (m+1, m) — no recompilation across calls.
"""

from __future__ import annotations


from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class GMRESResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray         # total inner iterations performed
    resnorm: jnp.ndarray       # final preconditioned residual norm
    converged: jnp.ndarray     # bool


def _identity(x):
    return x

def gmres(
    matvec: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    precond: Optional[Callable] = None,
    restart: int = 30,
    rtol: float = 1e-10,
    atol: float = 1e-12,
    maxiter: int = 2000,
    cgs2_kernel: bool = False,
    cgs2_tile: int = 4096,
    cgs2_compensated: bool = False,
) -> GMRESResult:
    """NOTE: deliberately not jitted here — `matvec`/`precond` typically close
    over traced operator values, so callers jit the enclosing step function
    (e.g. the whole Newton iteration) and this trace inlines into it.

    cgs2_kernel=True routes the orthogonalization through the fused Pallas
    projection (`ops.cgs2_pallas.cgs2_project`: 3 sweeps over the live rows
    only, vs 4 full-buffer XLA GEMVs) when the layout permits (n a
    `cgs2_tile` multiple — the flagship plane/pretiled layouts guarantee
    it); silently falls back to the XLA path otherwise (static decision)."""
    n = b.shape[0]
    dtype = b.dtype
    m = restart
    M = precond or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0

    use_kernel = bool(cgs2_kernel) and n % cgs2_tile == 0
    # Kernel path: pad the basis buffer rows to the f32 sublane tile (8) so
    # the kernel's dynamic row-block offsets are provably aligned.  The
    # extra rows stay identically zero (never written: k < m).  The buffer
    # is kept TILED (grid, m1p, tile) so each kernel window DMA is one
    # contiguous block (row-major windows are R strided segments, measured
    # ~490 GB/s effective vs ~680 streaming — benchlogs/
    # gmres_decomposition.txt round 4); row reads/writes against the tiled
    # buffer are tiny (one (n,)-vector each) dynamic slices on axis 1.
    m1p = -(-(m + 1) // 8) * 8 if use_kernel else m + 1
    vgrid = n // cgs2_tile

    def pre_residual(x):
        return M(b - matvec(x))

    r0 = pre_residual(x0)
    beta0 = jnp.linalg.norm(r0)
    tol = jnp.maximum(rtol * beta0, atol)

    # Outer state: (x, total_iters, resnorm, converged, stalled)
    def outer_cond(state):
        _, iters, resnorm, converged, stalled = state
        return (~converged) & (~stalled) & (iters < maxiter) & (resnorm > 0.0)

    def outer_body(state):
        x, iters, prev_resnorm, _, _ = state
        r = pre_residual(x)
        beta = jnp.linalg.norm(r)

        v0 = r / jnp.where(beta > 0, beta, 1.0)
        if use_kernel:
            V = jnp.zeros((vgrid, m1p, cgs2_tile), dtype=dtype)
            V = V.at[:, 0, :].set(v0.reshape(vgrid, cgs2_tile))
        else:
            V = jnp.zeros((m1p, n), dtype=dtype)
            V = V.at[0].set(v0)
        R = jnp.zeros((m, m), dtype=dtype)         # triangularized Hessenberg
        cs = jnp.zeros(m, dtype=dtype)
        sn = jnp.zeros(m, dtype=dtype)
        g = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)

        # Inner state: (V, R, cs, sn, g, k, done, brk)
        def inner_cond(istate):
            _, _, _, _, _, k, done, _ = istate
            return (k < m) & (~done)

        def inner_body(istate):
            V, R, cs, sn, g, k, _, _ = istate
            if use_kernel:
                z = jnp.int32(0)
                vk = jax.lax.dynamic_slice(
                    V, (z, k, z), (vgrid, 1, cgs2_tile)
                ).reshape(n)
            else:
                vk = V[k]
            w = M(matvec(vk))

            # CGS2 (classical Gram-Schmidt, twice) against v_0..v_k: each
            # pass is two fused GEMVs over the whole basis instead of a
            # sequential chain of m dots/axpys — the TPU-friendly
            # orthogonalization (rows > k of V are zero, mask for safety).
            # precision=HIGHEST: the MXU default rounds operands to bf16,
            # silently orthogonalizing against a truncated basis and
            # reconstructing dx from truncated V (measured to cost extra
            # iterations AND Newton steps on v5e — solvers.coarse.restrict
            # has the numbers).  These GEMVs are HBM-bandwidth-bound
            # (~726 GB/s measured), so exact f32 passes cost nothing.
            #
            # NOTE on active-row skipping (tried, LOST, reverted): CGS2's
            # four GEMVs read the whole zero-padded (m+1, n) buffer every
            # iteration even though only k+1 rows are live.  Skipping the
            # dead rows via lax.cond was measured on v5e at 117k rows and
            # lost BOTH ways: 8-row chunks (16 conds/iter) 17.4 ms/step,
            # half-basis split (4 conds/iter) 14.8 ms/step, vs 11.8 ms for
            # the plain full-buffer GEMVs — each cond is a fusion boundary
            # whose fixed cost exceeds the ~35%/25% HBM-traffic saving at
            # this size.  A Pallas GEMV with a scalar-prefetched row bound
            # is the remaining option if CGS2 ever dominates again.
            if use_kernel:
                # Fused Pallas projection: identical algebra (h = h1 + h2,
                # both passes against rows 0..k), ~0.38x the HBM traffic —
                # the "Pallas GEMV with a scalar-prefetched row bound"
                # promised above, landed as ops.cgs2_pallas.
                from navierstokes_tpu.ops.cgs2_pallas import cgs2_project

                w, hf = cgs2_project(V, w, k, tile=cgs2_tile,
                                     compensated=cgs2_compensated)
                h = hf[: m + 1]
            else:
                hp = jax.lax.Precision.HIGHEST
                active = (jnp.arange(m + 1) <= k).astype(dtype)
                h1 = jnp.matmul(V, w, precision=hp) * active
                w = w - jnp.matmul(V.T, h1, precision=hp)
                h2 = jnp.matmul(V, w, precision=hp) * active
                w = w - jnp.matmul(V.T, h2, precision=hp)
                h = h1 + h2
            hk1 = jnp.linalg.norm(w)
            # One dynamic-update-slice on the loop-carried buffer; written
            # unconditionally (on breakdown the row is never read: k does
            # not advance, y is zero past k_end, and the next restart
            # rebuilds V) so XLA updates V in place — a conditional
            # jnp.where(keep, V_next, V) would force a full (m+1, n) copy
            # plus a 3-buffer select every iteration.
            vnew = w / jnp.where(hk1 > 0, hk1, 1.0)
            if use_kernel:
                z = jnp.int32(0)
                V = jax.lax.dynamic_update_slice(
                    V, vnew.reshape(vgrid, 1, cgs2_tile), (z, k + 1, z)
                )
            else:
                V = V.at[k + 1].set(vnew)

            # Apply accumulated rotations 0..k-1 to the new column h[0..k].
            # The pairwise updates form the first-order linear recurrence
            #   c_{i+1} = -sn_i c_i + cs_i h_{i+1},  c_0 = h_0
            # (c_i = value at position i when rotation i arrives), solved in
            # O(log m) vector steps by associative_scan instead of an m-trip
            # sequential fori_loop of dynamic scalar updates.
            idx = jnp.arange(m)
            lt = idx < k
            a = jnp.where(lt, -sn, 1.0)
            b = jnp.where(lt, cs * h[1:], 0.0)

            def compose(first, second):
                a1, b1 = first
                a2, b2 = second
                return a2 * a1, a2 * b1 + b2

            P, Q = jax.lax.associative_scan(compose, (a, b))
            c = jnp.concatenate([h[:1], P * h[0] + Q])          # (m+1,)
            # Rotated column: positions < k rotated, k carries c_k, > k keep
            # h (zero there — the active mask zeroed rows beyond k).
            col = jnp.where(
                lt, cs * c[:m] + sn * h[1:],
                jnp.where(idx == k, c[:m], h[:m]),
            )

            # New Givens zeroing the subdiagonal entry hk1.
            a_ = c[k]
            denom = jnp.sqrt(a_ * a_ + hk1 * hk1)
            # Hard breakdown: the prospective R[k,k] is numerically zero
            # RELATIVE to the new Hessenberg column (rotations are
            # orthogonal, so ||(h, hk1)|| is the rotation-invariant column
            # scale).  This is the numerically-singular-H case (invariant
            # Krylov subspace that does not contain b, e.g. a singular
            # operator): the rotation built from the O(eps) remainder would
            # report a ~0 least-squares residual while R is singular and x
            # garbage.  An absolute 1e-300 test provably misses it — a
            # rank-1 64x64 system measured denom=1.4e-17 against colnorm=1
            # and "converged" at resnorm 2.8e-14 with true residual 63.5.
            # State is written anyway (those slots are never read once k
            # stops advancing) but k must NOT advance.
            colnorm = jnp.sqrt(jnp.sum(h * h) + hk1 * hk1)
            eps4 = jnp.asarray(4.0, dtype) * jnp.finfo(dtype).eps
            breakdown = denom <= colnorm * eps4
            c_new = jnp.where(breakdown, 1.0, a_ / denom)
            s_new = jnp.where(breakdown, 0.0, hk1 / denom)
            cs = cs.at[k].set(c_new)
            sn = sn.at[k].set(s_new)
            R = R.at[:, k].set(col.at[k].set(denom))

            gk = g[k]
            g = g.at[k].set(c_new * gk).at[k + 1].set(-s_new * gk)
            res_est = jnp.abs(g[k + 1])
            # Happy breakdown (hk1 == 0 but column useful) still advances once.
            done = (res_est <= tol) | (hk1 <= 1e-300) | breakdown
            return (V, R, cs, sn, g, jnp.where(breakdown, k, k + 1), done,
                    breakdown)

        V, R, cs, sn, g, k_end, _, brk = jax.lax.while_loop(
            inner_cond,
            inner_body,
            (V, R, cs, sn, g, jnp.int32(0), beta <= tol,
             jnp.asarray(False)),
        )

        # Solve R[0:k_end, 0:k_end] y = g[0:k_end] on the padded system:
        # pad unused diagonal with 1 and unused rhs with 0.
        col_ids = jnp.arange(m)
        active = col_ids < k_end
        Rp = jnp.where(
            active[None, :] & active[:, None],
            R,
            jnp.eye(m, dtype=dtype),
        )
        gp = jnp.where(active, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rp, gp, lower=False)
        hp = jax.lax.Precision.HIGHEST
        if use_kernel:
            dx = jnp.einsum(
                "gmt,m->gt", V[:, :m, :], y, precision=hp
            ).reshape(n)
        else:
            dx = jnp.matmul(V[:m].T, y, precision=hp)
        x_new = x + dx

        resnorm = jnp.abs(g[k_end])
        # Stalled: the cycle made no progress at all (immediate breakdown),
        # or it hit a hard breakdown AND shrank the residual by <1% — the
        # invariant-subspace case recurs identically every restart, so
        # cycling to maxiter would only burn matvecs.  A breakdown cycle
        # that still made progress restarts normally (preconditioned solves
        # can recover from an isolated rank deficiency).
        stalled = (k_end == 0) | (
            brk & (resnorm >= 0.99 * prev_resnorm)
        )
        return (
            x_new,
            iters + k_end,
            resnorm,
            resnorm <= tol,
            stalled,
        )

    init = (x0, jnp.int32(0), beta0, beta0 <= tol, jnp.asarray(False))
    x, iters, resnorm, converged, _ = jax.lax.while_loop(
        outer_cond, outer_body, init
    )
    return GMRESResult(x=x, iters=iters, resnorm=resnorm, converged=converged)
