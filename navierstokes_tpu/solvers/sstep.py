"""s-step (communication-avoiding) GMRES built on the matrix-powers kernel.

The completed form of the reference's `sstepgmres.c` scaffold (SURVEY.md §2.1
#19 — a KSPSHELL whose solve callback was a placeholder, intended to sit on
`BuildKrylovBasis_AVX2` + `MatMatMult_SeqBAIJ_4_AVX2`).

Algorithm per restart cycle (Walker/Hoemmen-style, monomial basis):
  1. r0 = M^{-1}(b - A x),  V = [r0, (M^{-1}A) r0, ..., (M^{-1}A)^m r0]
     with per-column normalization recorded in the recurrence matrix S:
     (M^{-1}A) V[:, i] = alpha_i V[:, i+1]  =>  S[i+1, i] = alpha_i.
     On a device mesh this is ONE communication phase (the k-deep-halo
     `partitioned_spmv_power`); on a single chip it is one fused dispatch.
  2. Tall-skinny QR: V = Q R.
  3. Arnoldi projection without inner products against A:
     H = R S R_m^{-1}  (exact algebraic identity,  H (m+1, m)).
  4. Least squares min ||R[:, 0] - H y||  (r0 = V e1 = Q R[:, 0]).
  5. x += Q_m y;  restart until converged.

Tradeoff vs standard GMRES: the monomial basis conditions like kappa(A)^m,
so the usable basis length m is smaller (~8-16 with normalization); in
exchange, the dots/AXPYs of modified Gram-Schmidt collapse into one QR and
the s SpMVs into one matrix-powers sweep — the communication-avoiding axis
the reference explores (BASELINE.md "SpM2V / 2SpMV" configs).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from navierstokes_tpu.solvers.gmres import GMRESResult


def _identity(x):
    return x


def ca_gmres(
    matvec: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    precond: Optional[Callable] = None,
    basis: int = 12,
    rtol: float = 1e-10,
    atol: float = 1e-12,
    maxiter: int = 2000,
    powers_fn: Optional[Callable] = None,
) -> GMRESResult:
    """Restarted s-step GMRES with basis length `basis` (= s = m per cycle).

    `powers_fn(v, s) -> (n, s)` optionally supplies the raw power stack
    [A v, ..., A^s v] in one call — on a device mesh this is the one-deep-
    halo-exchange `partitioned_spmv_dia_power(..., return_all=True)`, making
    the whole cycle's SpMV communication a single exchange.  Normalized
    columns and recurrence coefficients are reconstructed from the raw
    column norms (v_{i+1} = raw_{i+1}/|raw_{i+1}|, alpha_i =
    |raw_{i+1}|/|raw_i|).  Only valid with precond=None (fold the
    preconditioner into the operator first — see model._prepare_operator).

    Same call/convergence semantics as `solvers.gmres.gmres`; not jitted here
    for the same closure reasons.
    """
    if powers_fn is not None and precond is not None:
        raise ValueError("powers_fn requires the preconditioner folded into A")
    n = b.shape[0]
    dtype = b.dtype
    m = basis
    M = precond or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0

    def pre_residual(x):
        return M(b - matvec(x))

    beta0 = jnp.linalg.norm(pre_residual(x0))
    tol = jnp.maximum(rtol * beta0, atol)
    eps_floor = jnp.asarray(1e-300, dtype)

    def cycle(x):
        r = pre_residual(x)

        # 1. Normalized monomial basis + recurrence coefficients.
        v0norm = jnp.linalg.norm(r)
        v0 = r / jnp.maximum(v0norm, eps_floor)
        if powers_fn is not None:
            raw = powers_fn(v0, m)                             # (n, m)
            norms = jnp.linalg.norm(raw, axis=0)               # (m,)
            safe = jnp.maximum(norms, eps_floor)
            Vs = raw / safe[None, :]
            prev = jnp.concatenate([jnp.ones((1,), dtype), norms[:-1]])
            alphas = norms / jnp.maximum(prev, eps_floor)
            V = jnp.concatenate([v0[:, None], Vs], axis=1)     # (n, m+1)
        else:
            def step(carry, _):
                v = carry
                w = M(matvec(v))
                alpha = jnp.linalg.norm(w)
                v_next = w / jnp.maximum(alpha, eps_floor)
                return v_next, (v_next, alpha)

            _, (vs, alphas) = jax.lax.scan(step, v0, None, length=m)
            V = jnp.concatenate([v0[None], vs], axis=0).T      # (n, m+1)

        # 2. Tall-skinny QR.
        Q, R = jnp.linalg.qr(V)                                # (n,m+1),(m+1,m+1)

        # 3. H = R S R_m^{-1}; S[i+1, i] = alphas[i].
        S = jnp.zeros((m + 1, m), dtype=dtype)
        S = S.at[jnp.arange(1, m + 1), jnp.arange(m)].set(alphas)
        # HIGHEST: MXU default bf16 operand rounding would truncate the
        # Krylov recurrence / reconstruction (see solvers.gmres CGS2 note).
        hp = jax.lax.Precision.HIGHEST
        RS = jnp.matmul(R, S, precision=hp)                    # (m+1, m)
        Rm = R[:m, :m]
        H = jax.scipy.linalg.solve_triangular(
            Rm.T, RS.T, lower=True
        ).T                                                    # (m+1, m)

        # 4. Small least squares via QR of H.
        g = v0norm * R[:, 0]                                   # r0 = V e1
        Qh, Rh = jnp.linalg.qr(H, mode="complete")             # (m+1,m+1)
        gh = jnp.matmul(Qh.T, g, precision=hp)
        y = jax.scipy.linalg.solve_triangular(Rh[:m], gh[:m], lower=False)
        resnorm = jnp.abs(gh[m])

        x_new = x + jnp.matmul(Q[:, :m], y, precision=hp)
        return x_new, resnorm

    def cond(state):
        _, iters, resnorm, converged, stalled = state
        return (~converged) & (~stalled) & (iters < maxiter)

    def body(state):
        x, iters, prev_res, _, _ = state
        x_new, resnorm = cycle(x)
        # true preconditioned residual for the convergence decision
        true_res = jnp.linalg.norm(pre_residual(x_new))
        stalled = ~(true_res < prev_res * (1 - 1e-12)) & (true_res > tol)
        return x_new, iters + m, true_res, true_res <= tol, stalled

    init = (x0, jnp.int32(0), beta0, beta0 <= tol, jnp.asarray(False))
    x, iters, resnorm, converged, _ = jax.lax.while_loop(cond, body, init)
    return GMRESResult(x=x, iters=iters, resnorm=resnorm, converged=converged)
