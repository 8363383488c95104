"""Two-level (coarse-grid corrected) preconditioning.

Block-Jacobi kills only local error; the global (low-frequency) error on a
121k-DoF channel makes GMRES iterate hundreds of times.  The classic cure is
a coarse space: aggregate nodes (contiguous index ranges — spatially local
after band ordering), build the Galerkin coarse operator A_c = R A P with
piecewise-constant-per-component prolongation, invert it DENSELY once (a few
thousand DoF — one small MXU-friendly matmul per apply), and combine
multiplicatively with block-Jacobi:

    z  = P A_c^{-1} R r                      (coarse correction)
    z += D^{-1} (r - A z)                    (local smoothing)

This is a TPU-first replacement for the reference's ILU(k) strength: the
sequential triangular solves become one dense (nc x nc) matvec + one SpMV,
both batched/regular.  No analog exists in the reference (single-level ILU).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class CoarseSpace:
    """Static aggregation data (host + device).

    Aggregates are CONTIGUOUS equal-size index ranges (band-ordered mesh =>
    spatial blocks), so restriction/prolongation are pure reshape-reduce /
    broadcast — no gathers or segment sums on the TPU hot path.
    """

    agg_of_node: np.ndarray      # (nb,) aggregate id per node
    n_agg: int
    agg_size: int
    nb: int
    agg_dev: jnp.ndarray         # device copy (for the Galerkin scatter)

    @property
    def nc(self) -> int:
        return 4 * self.n_agg

    @property
    def nb_pad(self) -> int:
        return self.n_agg * self.agg_size


def build_aggregates(nb: int, agg_size: int = 64) -> CoarseSpace:
    agg = (np.arange(nb) // agg_size).astype(np.int32)
    return CoarseSpace(
        agg_of_node=agg,
        n_agg=int(agg[-1]) + 1 if nb else 0,
        agg_size=agg_size,
        nb=nb,
        agg_dev=jnp.asarray(agg),
    )


def _mix_matrix(agg: int, dtype):
    """(4*agg, 4) 0/1 matrix: column c picks the stride-4 residue c.

    Lets restrict/prolong run as (n_agg, 4*agg) matmuls on FLAT lane-major
    data.  The naive reshape formulation creates (nb, 4)/(n_agg, agg, 4)
    intermediates whose minor dim XLA tile-pads (8, 128) -> 32x HBM
    inflation; inside the triple-nested solver loops that inflation
    multiplied across ~130 live loop temps and hit 37 GB of HLO temp at
    2.35M rows (compile-time OOM).  Here the only 4-minor array is the
    (n_agg, 4) coarse product — coarse-sized, negligible."""
    m = np.zeros((4 * agg, 4), dtype)
    m[np.arange(4 * agg), np.arange(4 * agg) % 4] = 1.0
    return jnp.asarray(m)


def restrict(cs: CoarseSpace, r):
    """R r: per-component sum over each aggregate. (4*nb,) -> (nc,).

    precision=HIGHEST is load-bearing: the TPU MXU default rounds BOTH
    matmul operands to bf16, i.e. the residual values are truncated to 8
    mantissa bits BEFORE the aggregate sums.  Measured on v5e at m6: the
    damaged coarse correction costs 2.6x linear iterations and an extra
    Newton iteration per step (181 vs 69 lin iters — see
    benchlogs/transient_scaling.txt round-3 precision note).  These are
    bandwidth-bound tall-skinny GEMVs; exact f32 passes are free."""
    r2 = jnp.pad(r, (0, 4 * (cs.nb_pad - cs.nb))).reshape(
        cs.n_agg, 4 * cs.agg_size
    )
    return jnp.matmul(
        r2, _mix_matrix(cs.agg_size, r.dtype),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(-1)


def prolong(cs: CoarseSpace, rc):
    """P rc = R^T rc: inject aggregate values back. (nc,) -> (4*nb,).

    precision=HIGHEST for the same reason as `restrict` (bf16 operand
    rounding would truncate the coarse correction to 8 mantissa bits)."""
    out = jnp.matmul(
        rc.reshape(cs.n_agg, 4), _mix_matrix(cs.agg_size, rc.dtype).T,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(-1)[: 4 * cs.nb]


def restrict_planes(cs: CoarseSpace, rp, nbp: int):
    """R r on a plane-major padded fine vector -> interleaved coarse (nc,).

    Plane layout makes restriction a pure reshape-sum per plane; the
    component-interleave happens on the COARSE vector (nc <= ~16k), where a
    transpose costs nothing — this replaces two O(n) fine-vector layout
    conversions per preconditioner apply that measured ~52 us at 117k rows
    (benchlogs/gmres_decomposition.txt round-3 plane rows)."""
    assert cs.nb_pad <= nbp, (cs.nb_pad, nbp)
    r2 = rp.reshape(4, nbp)[:, :cs.nb_pad]
    # (rows past nb are zero by construction throughout the plane solve)
    rc = r2.reshape(4, cs.n_agg, cs.agg_size).sum(-1)     # (4, n_agg)
    return rc.T.reshape(-1)                               # interleaved (nc,)


def prolong_planes(cs: CoarseSpace, zc, nbp: int, nb: int, dtype=None):
    """P zc: interleaved coarse (nc,) -> plane-major padded fine vector."""
    z2 = zc.reshape(cs.n_agg, 4).T                        # (4, n_agg)
    zf = jnp.broadcast_to(
        z2[:, :, None], (4, cs.n_agg, cs.agg_size)
    ).reshape(4, cs.nb_pad)
    zf = jnp.pad(zf, ((0, 0), (0, nbp - cs.nb_pad)))
    # zero the kernel-padding rows (nb..nbp) the broadcast just filled
    mask = (jnp.arange(nbp) < nb)[None, :]
    return jnp.where(mask, zf, jnp.zeros((), zf.dtype)).reshape(-1)


def coarse_dia_offsets(offsets: tuple, agg: int) -> tuple:
    """Static coarse-level DIA offsets produced by contiguous aggregation.

    The scalar index map ic = 4*((i//4)//agg) + i%4 is exactly periodic in i
    with period L = 4*agg (shifting i by L shifts ic by 4), so enumerating
    one interior period yields every offset jc - ic a valid fine entry can
    produce; boundary rows are residue classes of the same period.
    """
    L = 4 * agg
    h = max(abs(d) for d in offsets)
    base = (h // L + 1) * L                    # interior: j = i + d >= 0
    out = set()
    for r in range(L):
        i = base + r
        ic = 4 * ((i // 4) // agg) + i % 4
        for d in offsets:
            j = i + d
            jc = 4 * ((j // 4) // agg) + j % 4
            out.add(jc - ic)
    return tuple(sorted(out))


def coarse_operator_dia(
    cs: CoarseSpace, offsets: tuple, data, coarse_offsets: tuple,
    *, shift: float = 0.0
):
    """Sparse Galerkin coarse operator A_c = R A P in scalar-DIA form.

    The scalable alternative to `coarse_operator_inverse_dia` when nc is too
    large to invert densely: contiguous aggregation of a banded operator is
    itself banded, with Kc = len(coarse_offsets) diagonals.  One (ndof,)
    scatter per fine diagonal (jittable; pattern static)."""
    K, ndof = data.shape
    nc = cs.nc
    agg = cs.agg_size
    kc_n = len(coarse_offsets)
    co = jnp.asarray(coarse_offsets)
    i = jnp.arange(ndof)
    ic = 4 * ((i // 4) // agg) + (i % 4)
    flat = jnp.zeros(kc_n * nc, dtype=data.dtype)
    for k, d in enumerate(offsets):
        j = i + d
        valid = (j >= 0) & (j < ndof)
        j_cl = jnp.clip(j, 0, ndof - 1)
        jc = 4 * ((j_cl // 4) // agg) + (j_cl % 4)
        kc = jnp.searchsorted(co, jc - ic)
        # invalid entries contribute 0 wherever their (clipped) slot lands
        flat = flat.at[kc * nc + ic].add(jnp.where(valid, data[k], 0.0))
    ac = flat.reshape(kc_n, nc)
    if shift:
        k0 = coarse_offsets.index(0)
        ac = ac.at[k0].add(shift)
    return ac


def coarse_dense_matrix(
    cs: CoarseSpace, offsets: tuple, data, *, shift: float = 0.0
):
    """Dense A_c = R A P built from scalar-DIA data (jittable).

    One (ndof,)-sized scatter per diagonal — the scalable path (no
    block-form arrays)."""
    K, ndof = data.shape
    nc = cs.nc
    agg = cs.agg_size
    i = jnp.arange(ndof)
    ic = 4 * ((i // 4) // agg) + (i % 4)
    ac_flat = jnp.zeros(nc * nc, dtype=data.dtype)
    for k, d in enumerate(offsets):
        j = i + d
        valid = (j >= 0) & (j < ndof)
        j_cl = jnp.clip(j, 0, ndof - 1)
        jc = 4 * ((j_cl // 4) // agg) + (j_cl % 4)
        ac_flat = ac_flat.at[ic * nc + jc].add(
            jnp.where(valid, data[k], 0.0)
        )
    ac = ac_flat.reshape(nc, nc)
    if shift:
        ac = ac + shift * jnp.eye(nc, dtype=ac.dtype)
    return ac


def coarse_operator_inverse_dia(
    cs: CoarseSpace, offsets: tuple, data, *, shift: float = 0.0
):
    """Dense inverse of A_c = R A P built from scalar-DIA data.

    Whenever `data` is concrete (the prep runs eagerly — the default since
    the eager-stokes restructure), the inverse is computed on the HOST in
    f64, for two reasons:
      * accuracy: the saddle-point coarse matrix is ill-conditioned and the
        on-chip f32 LU inverse carries O(cond * eps_f32) error — measured on
        v5e at m6 (nc=2448) as a preconditioner-quality lottery: separately
        compiled preps produced inverses differing by ~0.26%, and GMRES
        counts of 182 vs 69 iters/step for the SAME system (see
        benchlogs/transient_scaling.txt round-3 coarse-inverse note);
      * memory: XLA's on-chip LU inverse pipeline materializes O(nc/128)
        blocked triangular-solve temps — ~18 GB of HLO temp at nc=10648
        (measured compile OOM at 511k rows, agg=48).
    Under jit there is no host escape on this backend (no pure_callback), so
    traced calls fall back to the on-chip f32 inverse."""
    ac = coarse_dense_matrix(cs, offsets, data, shift=shift)
    try:
        ac_host = np.asarray(ac, dtype=np.float64)
    except jax.errors.ConcretizationTypeError:
        ac_host = None
    if ac_host is not None:
        return jnp.asarray(np.linalg.inv(ac_host), dtype=ac.dtype)
    return jnp.linalg.inv(ac)


def coarse_operator_inverse(
    cs: CoarseSpace, bcsr_values, row_ids, col_indices, *, shift: float = 0.0
):
    """Dense inverse of A_c = R A P (jittable; built once per operator).

    bcsr_values: (nnzb, 4, 4); row_ids/col_indices: (nnzb,) block coords.
    `shift` regularizes the (possibly singular) coarse pressure block.
    """
    nc = cs.nc
    AI = cs.agg_dev[row_ids]
    AJ = cs.agg_dev[col_indices]
    a4 = jnp.arange(4)
    rows_sc = (4 * AI)[:, None, None] + a4[None, :, None]     # (nnzb, 4, 1)
    cols_sc = (4 * AJ)[:, None, None] + a4[None, None, :]     # (nnzb, 1, 4)
    flat_idx = (rows_sc * nc + cols_sc).reshape(-1)
    Ac = (
        jnp.zeros(nc * nc, dtype=bcsr_values.dtype)
        .at[flat_idx]
        .add(bcsr_values.reshape(-1))
        .reshape(nc, nc)
    )
    if shift:
        Ac = Ac + shift * jnp.eye(nc, dtype=Ac.dtype)
    # Dense inverse in float32 can be fragile; invert in f64 off-TPU dtypes
    # is not available on-chip, so solve against identity via LU (jnp.linalg
    # uses LAPACK-on-CPU / custom-call-on-TPU, both fine at this size).
    return jnp.linalg.inv(Ac)
