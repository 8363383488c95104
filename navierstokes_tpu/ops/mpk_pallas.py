"""Fused single-sweep A^2 x Pallas kernel (ghost-overlap tiling).

The TPU re-expression of the reference's fused SpM2V
(`mpk/SpM2V.cpp:80-801`): there the per-nonzero `ptrowend1` dependency
pointers (`Generate1stlayer`, `mpk/SpM2V.cpp:5-26`) let one sweep over A
compute z = A(Ax) by producing each needed row of y = Ax on first touch.

On TPU the cache-blocking analog is ghost-overlap tiling over the scalar-DIA
layout: for each row tile [iT, iT+T) the kernel

  1. DMAs one x window covering [iT - 2h, iT + T + 2h) into VMEM
     (double-buffered across the grid, h = max |diagonal offset|),
  2. computes the intermediate y on the halo-extended range
     [iT - h, iT + T + h) entirely in VMEM (never written to HBM),
  3. computes z = A y for the tile's own rows.

The operator is pre-tiled WITH OVERLAP (`pretile_dia_overlap`): tile i's
block holds diagonal data for rows [iT - h, iT + T + h), so one sweep reads
(T + 2h)/T passes of A instead of the 2 passes two chained SpMVs need.
Fusion therefore wins iff the matrix bandwidth h is small against the tile —
the same crossover the reference measured on CPU cache sizes
(`mpk/log/log_SPM2V.txt`: fused wins at 268 rows, loses at 2.3M).

Validated against two chained `spmv_dia` applications (tests/test_mpk.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def overlap_ratio(n: int, offsets, *, tile: int = 8192) -> float:
    """HBM passes over A for fused A^2x: (T + 2h)/T, vs 2.0 for chained."""
    h = max(max(abs(d) for d in offsets), 1)
    return (tile + 2 * h) / tile


def pretile_dia_overlap(data, n, *, tile: int = 8192, halo: int = None,
                        offsets=None):
    """(K, n) DIA data -> (grid, K, E) overlap-tiled layout.

    Block i holds data[k, i*tile - halo + j] for j in [0, E), zero outside
    [0, n) — the rows tile i needs to build its halo-extended intermediate.
    E = tile + 2*halo rounded up to the 128-lane tiling.
    """
    if halo is None:
        halo = max(max(abs(d) for d in offsets), 1)
    k, _ = data.shape
    grid = -(-n // tile)
    e = tile + 2 * halo
    e_pad = -(-e // 128) * 128
    # dp[:, i*tile + j] == data[:, i*tile - halo + j] (zero outside [0, n))
    tail = (grid - 1) * tile + e_pad - (n + halo)
    dp = jnp.pad(data, ((0, 0), (halo, max(tail, 0))))

    def one(i):
        return jax.lax.dynamic_slice(dp, (0, i * tile), (k, e_pad))

    return jax.vmap(one)(jnp.arange(grid))


def _spm2v_kernel(offsets, tile, halo, e_pad, win, granule, xp_ref, data_ref,
                  out_ref, xwin, sem):
    """One grid step: y on [iT-h, iT+T+h) in registers, then z on [iT, iT+T).

    Same double-buffered flat-1-D x window discipline as
    `pallas_dia._dia_kernel_windowed` (Mosaic: matching 1-D DMA tilings,
    granule-aligned dynamic loads + static remainder slices)."""
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    slot = i % 2
    nxt = 1 - slot

    def window_copy(j, s):
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(j * tile, win)],
            xwin.at[pl.ds(pl.multiple_of(s * win, granule), win)],
            sem.at[s],
        )

    @pl.when(i == 0)
    def _():
        window_copy(0, 0).start()

    @pl.when(i + 1 < nprog)
    def _():
        window_copy(i + 1, nxt).start()

    window_copy(i, slot).wait()

    base = pl.multiple_of(slot * win, granule)
    # f32 accumulation for low-precision inputs; full width for f64 (the
    # CPU/interpret validation path).
    acc_dtype = jnp.promote_types(out_ref.dtype, jnp.float32)

    # Sweep 1: y_ext[j] = y[iT - h + j], j in [0, e_pad) — entries beyond
    # tile + 2h are garbage (rows past the halo) but are never read by
    # sweep 2.  x[iT - h + j + d] sits at xwin position j + (h + d) (the
    # window starts at x[iT - 2h]); h + d >= 0 for every diagonal.
    acc_y = jnp.zeros((e_pad,), dtype=acc_dtype)
    for k, d in enumerate(offsets):
        q, r = divmod(halo + d, granule)
        seg = xwin[pl.ds(base + granule * q, e_pad + granule)]
        xs = jax.lax.slice_in_dim(seg, r, r + e_pad, axis=0)
        acc_y = acc_y + (
            data_ref[0, k, :].astype(acc_dtype) * xs.astype(acc_dtype)
        )

    # Sweep 2: z[t] = sum_k A[k, iT + t] * y[iT + t + d_k]
    #        = sum_k data[k, h + t] * y_ext[t + h + d_k],  t in [0, tile).
    # Both slices are static — pure vector rotates, no HBM traffic.
    acc_z = jnp.zeros((tile,), dtype=acc_dtype)
    for k, d in enumerate(offsets):
        row = data_ref[0, k, :].astype(acc_dtype)
        center = jax.lax.slice_in_dim(row, halo, halo + tile, axis=0)
        ys = jax.lax.slice_in_dim(acc_y, halo + d, halo + d + tile, axis=0)
        acc_z = acc_z + center * ys
    out_ref[...] = acc_z.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("offsets", "n", "tile", "interpret")
)
def spm2v_dia_pallas(offsets, data_overlap, x, *, n, tile: int = 8192,
                     interpret=None):
    """z = A^2 x in ONE sweep over the overlap-pretiled operator.

    offsets: static tuple (scalar DIA); data_overlap: (grid, K, E) from
    `pretile_dia_overlap` built with the SAME `tile`; x: (n,). The
    intermediate y never touches HBM.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid, k, e_pad = data_overlap.shape
    h = max(max(abs(d) for d in offsets), 1)
    assert k == len(offsets)
    assert grid == -(-n // tile), (grid, n, tile)
    assert e_pad == -(-(tile + 2 * h) // 128) * 128, (e_pad, tile, h)
    e = tile + 2 * h
    n_pad = grid * tile

    del e
    granule = max(4096 // x.dtype.itemsize, 128)
    # Aligned-load overshoot room: dynamic starts are floor((h+d)/granule)
    # granules (<= 2h), reads of e_pad + granule elements.
    win = 2 * h + e_pad + granule
    win = -(-win // granule) * granule
    # Window for tile i starts at x[iT - 2h] -> xp[iT] with a 2h left pad.
    xp = jnp.pad(x, (2 * h, max(win + (grid - 1) * tile - (n + 2 * h), 0)))
    out = pl.pallas_call(
        functools.partial(_spm2v_kernel, offsets, tile, h, e_pad, win, granule),
        out_shape=jax.ShapeDtypeStruct((n_pad,), x.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # x stays in HBM
            pl.BlockSpec((1, k, e_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * win,), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, data_overlap)
    return out[:n]
