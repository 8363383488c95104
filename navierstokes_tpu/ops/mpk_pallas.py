"""Fused single-sweep A^p x Pallas kernels (ghost-overlap tiling), p = 2..4.

The TPU re-expression of the reference's fused SpM2V/SpM3V/SpM4V
(`mpk/SpM2V.cpp:80-801`, `mpk/SpMVmulti0.cpp:132-155,191-221`): there the
per-nonzero `ptrowend1` dependency pointers (`Generate1stlayer`,
`mpk/SpM2V.cpp:5-26`) let one sweep over A compute z = A(Ax) by producing
each needed row of y = Ax on first touch.

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


def overlap_ratio(n: int, offsets, *, tile: int = 8192,
                  power: int = 2) -> float:
    """HBM passes over A for fused A^p x: (T + 2(p-1)h)/T, vs p chained."""
    h = max(max(abs(d) for d in offsets), 1)
    return (tile + 2 * (power - 1) * h) / tile


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


def _spmpv_kernel(offsets, power, tile, h, H, e_pad, win, granule, xp_ref,
                  data_ref, out_ref, xwin, sem):
    """One grid step of z = A^p x: intermediates y_j = A^j x live entirely
    in registers/VMEM values (never HBM), each valid on the shrinking range
    [iT - (p-j)h, iT + T + (p-j)h).

    Frames: the data block covers rows [iT - H, iT + T + H), H = (p-1)h;
    the x window starts at x[iT - ph] (= iT - H - h).  Sweep 1 produces y_1
    on the full data frame [0, e_pad); sweeps 2..p-1 read the previous
    intermediate through an h-padded buffer so every slice offset h + d is
    static and in range; the final sweep emits only the tile's own rows.
    Entries outside a sweep's valid range are garbage built from zero data
    (never NaN) and are never read by any later valid position.

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

    # Sweep 1: y[j] = (A x)[iT - H + j], j in [0, e_pad).  x[iT - H + j + d]
    # sits at xwin position j + (h + d) (the window starts at x[iT - H - h]);
    # h + d >= 0 for every diagonal.
    acc_y = jnp.zeros((e_pad,), dtype=acc_dtype)
    for k, d in enumerate(offsets):
        q, r = divmod(h + d, granule)
        seg = xwin[pl.ds(base + granule * q, e_pad + granule)]
        xs = jax.lax.slice_in_dim(seg, r, r + e_pad, axis=0)
        acc_y = acc_y + (
            data_ref[0, k, :].astype(acc_dtype) * xs.astype(acc_dtype)
        )

    # Sweeps 2..p-1 on SHRINKING frames: b_j[v] = y_j[iT - (p-j)h + v],
    # v in [0, L_j), L_j = T + 2(p-j)h — each sweep needs y only h closer
    # to the tile than the previous, so the frame insets by h per sweep and
    # every read is a STATIC IN-BOUNDS slice of a value:
    #   data index  = (j-1)h + v            ((j-1)h + L_j <= e_pad)
    #   prev index  = v + h + d_k           (within L_{j-1} = L_j + 2h)
    # No pad/concat/rotate: Mosaic rejects unaligned 1-D concatenates
    # ("Input offsets outside of the first tile") and tpu.dynamic_rotate
    # does not support 1-D shapes; arbitrary static slices it compiles.
    prev = acc_y                       # j=1 frame: inset 0, L_1 <= e_pad
    for j in range(2, power):
        L = tile + 2 * (power - j) * h
        ins = (j - 1) * h
        acc = jnp.zeros((L,), dtype=acc_dtype)
        for k, d in enumerate(offsets):
            row = jax.lax.slice_in_dim(
                data_ref[0, k, :].astype(acc_dtype), ins, ins + L, axis=0
            )
            ys = jax.lax.slice_in_dim(prev, h + d, h + d + L, axis=0)
            acc = acc + row * ys
        prev = acc

    # Final sweep: z[t] = sum_k data[k, H + t] * y_{p-1}[iT + t + d_k].
    # prev's frame starts at iT - h for every p (inset (p-2)h for p >= 3,
    # and the full data frame iT - H = iT - h itself for p = 2), so the
    # read index is t + d + h — statically in bounds (L_{p-1} = T + 2h,
    # except p = 2 where prev is the larger e_pad frame and H == h).
    acc_z = jnp.zeros((tile,), dtype=acc_dtype)
    for k, d in enumerate(offsets):
        row = data_ref[0, k, :].astype(acc_dtype)
        center = jax.lax.slice_in_dim(row, H, H + tile, axis=0)
        ys = jax.lax.slice_in_dim(prev, h + d, h + d + tile, axis=0)
        acc_z = acc_z + center * ys
    out_ref[...] = acc_z.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("offsets", "n", "tile", "power", "interpret")
)
def spmpv_dia_pallas(offsets, data_overlap, x, *, n, power: int,
                     tile: int = 8192, interpret=None):
    """z = A^power x in ONE sweep over the overlap-pretiled operator,
    power in {2, 3, 4} (the reference's SpM2V/SpM3V/SpM4V family).

    offsets: static tuple (scalar DIA); data_overlap: (grid, K, E) from
    `pretile_dia_overlap` built with the SAME `tile` and
    halo = (power-1) * max|offset|; x: (n,).  No intermediate ever touches
    HBM: one read of the overlap-tiled A ((T + 2(power-1)h)/T passes of the
    row-major bytes) + one read of x + one write of z.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert power >= 2, "use spmv_dia_pallas for power=1"
    grid, k, e_pad = data_overlap.shape
    h = max(max(abs(d) for d in offsets), 1)
    H = (power - 1) * h
    assert k == len(offsets)
    assert grid == -(-n // tile), (grid, n, tile)
    assert e_pad == -(-(tile + 2 * H) // 128) * 128, (e_pad, tile, H)
    n_pad = grid * tile

    granule = max(4096 // x.dtype.itemsize, 128)
    # Sweep 1 reads xwin positions up to e_pad - 1 + 2h, from dynamic
    # starts of floor((h+d)/granule) granules + e_pad + granule reads.
    win = 2 * h + e_pad + granule
    win = -(-win // granule) * granule
    # Window for tile i starts at x[iT - H - h] -> xp[iT] with an (H + h)
    # left pad.
    lp = H + h
    xp = jnp.pad(x, (lp, max(win + (grid - 1) * tile - (n + lp), 0)))
    out = pl.pallas_call(
        functools.partial(_spmpv_kernel, offsets, power, tile, h, H, e_pad,
                          win, granule),
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


def spm2v_dia_pallas(offsets, data_overlap, x, *, n, tile: int = 8192,
                     interpret=None):
    """z = A^2 x in one sweep (the power=2 case of `spmpv_dia_pallas`,
    kept as the named entry point the benches/tests use)."""
    return spmpv_dia_pallas(offsets, data_overlap, x, n=n, power=2,
                            tile=tile, interpret=interpret)
