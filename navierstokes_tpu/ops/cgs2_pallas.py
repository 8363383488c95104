"""Fused CGS2 projection kernels — the GMRES orthogonalization at < half
the HBM traffic.

Round-3 finding (benchlogs/gmres_decomposition.txt): after the matvec
reached the HBM roofline, CGS2 became ~3/4 of the per-iteration budget at
117k rows — four XLA GEMVs, each streaming the full zero-padded (m+1, n)
Krylov buffer even though only k+1 rows are live, and the middle two
passes reading V twice for one projection.  This module restructures the
projection as THREE Pallas sweeps with a *dynamic active-row bound*:

    sweep 1:  h1 = V w                      (reads rows 0..k only)
    sweep 2:  w1 = w - V^T h1;  h2 = V w1   (ONE read of V serves both)
    sweep 3:  w2 = w1 - V^T h2              (reads rows 0..k only)

Traffic: 3 * ceil((k+1)/8)/(m+1) of the XLA path's 4 full-buffer reads —
at m=30, k~15 that is ~0.38x.  The row bound is the "Pallas GEMV with a
scalar-prefetched row bound" called out in solvers/gmres.py (the lax.cond
row-skipping alternative was measured and LOST — each cond is a fusion
boundary; a kernel-internal bound has no such cost).

Mechanics: V stays in HBM (pl.ANY); each grid step manually DMAs the
active (8, tile) row blocks of its column window into a double-buffered
VMEM scratch (8-row blocks: the f32 sublane tile, so dynamic sublane
offsets are provably aligned), masked rows > k kill any stale lanes.  The
reduction outputs are (m1p, 1) per-tile partials summed by XLA (tiny).
Requires n % tile == 0 (the flagship plane/pretiled layouts guarantee it;
the wrapper falls back to XLA otherwise) and V padded to m1p = ceil((m+1)/8)*8
rows (solvers.gmres sizes the buffer accordingly when the kernel is on).

Reference match: the reference's own obsession with the per-iteration
kernel budget (`src/benchmark_spmv.c:218-236`); CGS2 itself replaces its
sequential MGS (`src/solve_newton.c:1154-1163` KSP default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8  # row-block = f32 sublane tile: dynamic sublane offsets stay aligned


def _masked(Vw, k, acc):
    """Rows 0..k of the window in `acc` precision, dead rows EXACTLY zero.
    jnp.where (not a multiplicative mask): row blocks beyond the active
    bound are never DMA'd, so their VMEM scratch is uninitialized and may
    hold NaN/Inf bit patterns — 0 * NaN would leak them into the sum."""
    rows = jax.lax.broadcasted_iota(jnp.int32, Vw.shape, 0)
    return jnp.where(rows <= k, Vw.astype(acc), 0)


def _dma_window(V_hbm, vwin, sem, i, slot, j, tile, m1p):
    """Copy row-block j of tile i's V window into scratch slot `slot`.

    V_hbm is either the row-major (m1p, n) buffer — each (R, tile) window
    is R STRIDED 16 KB segments (measured ~490 GB/s effective at m6) — or
    the tiled (grid, m1p, tile) layout, where the window is one contiguous
    R*tile*4-byte block (the operator-pretiling trick applied to the
    Krylov basis; solvers.gmres keeps V tiled when the kernel is on)."""
    if len(V_hbm.shape) == 3:
        src = V_hbm.at[i, pl.ds(j * R, R), :]
    else:
        src = V_hbm.at[pl.ds(j * R, R), pl.ds(i * tile, tile)]
    return pltpu.make_async_copy(
        src,
        vwin.at[pl.ds(pl.multiple_of(slot * m1p + j * R, R), R), :],
        sem.at[slot, j],
    )


def _window_ops(k_ref, V_hbm, vwin, sem, tile, m1p, rbtot):
    """Shared DMA choreography: double-buffered active-row-block windows."""
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    slot = i % 2
    nxt = 1 - slot
    nact = (k_ref[0] + R) // R          # ceil((k+1)/R) active row blocks

    @pl.when(i == 0)
    def _():
        for j in range(rbtot):
            @pl.when(j < nact)
            def _():
                _dma_window(V_hbm, vwin, sem, 0, 0, j, tile, m1p).start()

    @pl.when(i + 1 < nprog)
    def _():
        for j in range(rbtot):
            @pl.when(j < nact)
            def _():
                _dma_window(V_hbm, vwin, sem, i + 1, nxt, j, tile, m1p).start()

    for j in range(rbtot):
        @pl.when(j < nact)
        def _():
            _dma_window(V_hbm, vwin, sem, i, slot, j, tile, m1p).wait()

    return vwin[pl.ds(pl.multiple_of(slot * m1p, R), m1p), :]   # (m1p, tile)


def _lane_fold(prod, compensated=False):
    """(m1p, tile) -> (m1p, 128) partial sums by folding 128-lane slices.

    The in-kernel reduction stops at the lane width: a (m1p, 1) output
    block is rejected by the Mosaic lowering (last block dim must be
    128-divisible or equal to the array dim), so each grid step emits a
    (m1p, 128) partial and XLA finishes the tiny cross-lane sum outside.

    compensated=True runs the fold as Kahan summation (the TPU-native
    mixed-precision CGS2: f64 is not executed natively on the chip, but
    compensated f32 kills the summation-depth error term, leaving only the
    one-rounding-per-product floor).  ~4x the VPU adds of the plain fold —
    negligible against the HBM-bound window reads."""
    acc = prod[:, :128]
    if not compensated:
        for j in range(1, prod.shape[1] // 128):
            acc = acc + prod[:, j * 128:(j + 1) * 128]
        return acc
    c = jnp.zeros_like(acc)
    for j in range(1, prod.shape[1] // 128):
        y = prod[:, j * 128:(j + 1) * 128] - c
        t = acc + y
        c = (t - acc) - y
        acc = t
    return acc - c


def _s1_kernel(tile, m1p, rbtot, comp, k_ref, V_hbm, w_ref, out_ref,
               vwin, sem):
    Vw = _window_ops(k_ref, V_hbm, vwin, sem, tile, m1p, rbtot)
    acc = jnp.promote_types(out_ref.dtype, jnp.float32)
    prod = _masked(Vw, k_ref[0], acc) * w_ref[...].astype(acc)  # (m1p, tile)
    out_ref[...] = _lane_fold(prod, comp).astype(out_ref.dtype)


def _s2_kernel(tile, m1p, rbtot, comp, k_ref, V_hbm, w_ref, h1_ref,
               w1_ref, out_ref, vwin, sem):
    Vw = _window_ops(k_ref, V_hbm, vwin, sem, tile, m1p, rbtot)
    acc = jnp.promote_types(out_ref.dtype, jnp.float32)
    Vm = _masked(Vw, k_ref[0], acc)
    # w1 = w - V^T h1 (rows masked), computed 2-D to avoid 1-D<->2-D reshapes
    w1 = w_ref[...].astype(acc) - jnp.sum(
        Vm * h1_ref[...].astype(acc), axis=0, keepdims=True
    )                                                        # (1, tile)
    w1_ref[...] = w1.astype(w1_ref.dtype)
    # h2 partials from the SAME window read
    out_ref[...] = _lane_fold(Vm * w1, comp).astype(out_ref.dtype)


def _s3_kernel(tile, m1p, rbtot, k_ref, V_hbm, w_ref, h2_ref,
               w2_ref, vwin, sem):
    Vw = _window_ops(k_ref, V_hbm, vwin, sem, tile, m1p, rbtot)
    acc = jnp.promote_types(w2_ref.dtype, jnp.float32)
    w2 = w_ref[...].astype(acc) - jnp.sum(
        _masked(Vw, k_ref[0], acc) * h2_ref[...].astype(acc),
        axis=0, keepdims=True,
    )
    w2_ref[...] = w2.astype(w2_ref.dtype)


def _common(V, tile, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if V.ndim == 3:                       # tiled (grid, m1p, tile) layout
        grid, m1p, tile_v = V.shape
        assert tile_v == tile, f"tiled V has tile {tile_v}, expected {tile}"
        n = grid * tile
    else:
        m1p, n = V.shape
        assert n % tile == 0, f"n={n} must be a tile multiple (pad the layout)"
        grid = n // tile
    assert m1p % R == 0, f"V rows {m1p} must be padded to a multiple of {R}"
    rbtot = m1p // R
    scratch = [
        pltpu.VMEM((2 * m1p, tile), V.dtype),
        pltpu.SemaphoreType.DMA((2, rbtot)),
    ]
    return interpret, m1p, n, grid, rbtot, scratch


@functools.partial(
    jax.jit, static_argnames=("tile", "interpret", "compensated")
)
def cgs2_project(V, w, k, *, tile: int = 4096, interpret=None,
                 compensated: bool = False):
    """One full CGS2 projection against rows 0..k of V.

    V: the basis with zero rows beyond k, either row-major (m1p, n) or
    tiled (n//tile, m1p, tile) — the tiled layout makes every window DMA
    one contiguous block and is what solvers.gmres keeps when the kernel
    is enabled (row-major windows measured ~490 GB/s effective vs ~680
    streaming).  w: (n,); k: traced int32 row bound.  Returns (w_out, h)
    with h = h1 + h2 of length m1p (zero beyond row k) — algebraically
    identical to the four-GEMV XLA path in solvers.gmres, at ~0.38x its
    HBM traffic.
    """
    interpret, m1p, n, grid, rbtot, scratch = _common(V, tile, interpret)
    kk = jnp.asarray(k, jnp.int32).reshape(1)
    w2d = w.reshape(1, n)

    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    vspec = pl.BlockSpec(memory_space=pl.ANY)
    wspec = pl.BlockSpec((1, tile), lambda i: (0, i))
    hspec = pl.BlockSpec((m1p, 1), lambda i: (0, 0))
    part_spec = pl.BlockSpec((m1p, 128), lambda i: (0, i))

    h1_parts = pl.pallas_call(
        functools.partial(_s1_kernel, tile, m1p, rbtot, compensated),
        out_shape=jax.ShapeDtypeStruct((m1p, 128 * grid), V.dtype),
        grid=(grid,),
        in_specs=[sspec, vspec, wspec],
        out_specs=part_spec,
        scratch_shapes=scratch,
        interpret=interpret,
    )(kk, V, w2d)
    h1 = jnp.sum(h1_parts, axis=1, keepdims=True)            # (m1p, 1)

    w1, h2_parts = pl.pallas_call(
        functools.partial(_s2_kernel, tile, m1p, rbtot, compensated),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), V.dtype),
            jax.ShapeDtypeStruct((m1p, 128 * grid), V.dtype),
        ),
        grid=(grid,),
        in_specs=[sspec, vspec, wspec, hspec],
        out_specs=(wspec, part_spec),
        scratch_shapes=scratch,
        interpret=interpret,
    )(kk, V, w2d, h1)
    h2 = jnp.sum(h2_parts, axis=1, keepdims=True)

    w2 = pl.pallas_call(
        functools.partial(_s3_kernel, tile, m1p, rbtot),
        out_shape=jax.ShapeDtypeStruct((1, n), V.dtype),
        grid=(grid,),
        in_specs=[sspec, vspec, wspec, hspec],
        out_specs=wspec,
        scratch_shapes=scratch,
        interpret=interpret,
    )(kk, V, w1, h2)

    return w2.reshape(n), (h1 + h2).reshape(m1p)
