"""Matrix-powers kernels: A^k x and s-step Krylov basis construction.

The TPU re-expression of the reference's communication-avoiding mpk suite
(SURVEY.md §2.2 #25-27): `Generate1stlayer`/`Generate2ndlayer`/... build
ragged dependency-pointer tables so SpM2V/SpM3V/SpM4V compute A^2x/A^3x/A^4x
in one sweep over the matrix (`mpk/SpM2V.cpp`, `mpk/SpMVmulti0.cpp`).

On TPU the same idea splits across two levels:

- **within a chip** there is no cache hierarchy to avoid — HBM streaming is
  the cost — so `matrix_power` chains the DIA fast path inside one jitted
  computation (one dispatch, XLA-scheduled); `ops.mpk_pallas.spm2v_dia_pallas`
  is the fused single-sweep A^2x variant (ghost-overlap tiling: each tile
  computes the intermediate y on a halo-extended window in VMEM, reading A
  once plus halo overlap instead of twice — the `SpM2V.cpp` analog),
- **across chips** the communication-avoiding structure is real:
  `parallel.partitioned.partitioned_spmv_power` exchanges a k-deep ghost
  layer ONCE and runs k local sweeps — one ICI round instead of k.

`krylov_basis` is the `BuildKrylovBasis_AVX2` equivalent
(`src/kernels/spmm_avx2.c:112-168`): builds [v, Av, A^2 v, ..., A^s v]
column-major for the s-step GMRES of `solvers/sstep.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from navierstokes_tpu.ops.spmv import spmv_dia


def matrix_power(offsets, data, x, k: int):
    """A^k x by k chained DIA SpMVs in one jitted computation."""
    y = x
    for _ in range(k):
        y = spmv_dia(offsets, data, y)
    return y


def matrix_powers_all(offsets, data, x, k: int):
    """[A x, A^2 x, ..., A^k x] stacked along axis 1: (ndof, k)."""
    ys = []
    y = x
    for _ in range(k):
        y = spmv_dia(offsets, data, y)
        ys.append(y)
    return jnp.stack(ys, axis=1)


def krylov_basis(offsets, data, v, s: int, *, normalize: bool = False):
    """Monomial Krylov basis [v, Av, ..., A^s v]: (ndof, s+1).

    With normalize=True each column is scaled to unit norm as it is produced
    (mitigates the monomial basis' conditioning, cf. the orthogonalization
    hooks in `mpk/2SpMV.cpp:3-28`).
    """
    cols = [v]
    y = v
    for _ in range(s):
        y = spmv_dia(offsets, data, y)
        if normalize:
            y = y / jnp.linalg.norm(y)
        cols.append(y)
    return jnp.stack(cols, axis=1)
