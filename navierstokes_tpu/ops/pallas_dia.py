"""Pallas TPU kernel for the scalar-DIA SpMV.

Same math as `ops.spmv.spmv_dia` (the XLA formulation), expressed as an
explicit row-tiled kernel: the padded x vector lives wholly in VMEM (a DoF
vector is ~0.5 MB for the mmesh class), diagonal data streams tile-by-tile
HBM -> VMEM through the pallas pipeline, and each tile performs K unrolled
multiply-adds with statically-offset slices of the VMEM window.

Measured on the 121k-row NS operator (one v5e chip): 58 us / 230 GFLOP/s at
tile=4096, bit-identical to the XLA path and within ~7% of its 246 GF/s —
the XLA lowering of spmv_dia is already near HBM bandwidth, so this kernel
is (a) the explicit-control variant for the benchmark table (the analog of
the reference keeping `_OPT`/`_FMA`/`_AVX2` flavors side by side), and
(b) the foundation for fused multi-sweep variants where XLA cannot
restructure the dataflow.

Mosaic notes (hard-won): dynamic lane offsets must be provably 128-aligned —
each static diagonal offset is split into an aligned dynamic load start plus
a static lane-remainder slice; 1-D->2-D vector reshapes are unsupported, so
the kernel works on 1-D blocks throughout.

Falls back to interpret mode off-TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dia_kernel(offsets, tile, halo, xp_ref, data_ref, out_ref):
    i = pl.program_id(0)
    base = pl.multiple_of(i * tile, 128)
    acc = jnp.zeros((tile,), dtype=jnp.float32)
    for k, d in enumerate(offsets):
        # Mosaic requires provably-128-aligned dynamic lane offsets: split
        # the static halo+d into an aligned part (dynamic load start) and a
        # static lane remainder (static slice of the loaded vector).
        q, r = divmod(halo + d, 128)
        seg = xp_ref[0, pl.ds(base + 128 * q, tile + 128)]
        xs = jax.lax.slice_in_dim(seg, r, r + tile, axis=0)
        acc = acc + data_ref[k, :].astype(jnp.float32) * xs
    out_ref[...] = acc.astype(out_ref.dtype)


def _dia_kernel_windowed(offsets, tile, halo, win, xp_ref, data_ref, out_ref,
                         xwin, sem):
    """Large-n variant: x stays in HBM; each tile DMAs its (tile + 2*halo)
    window into VMEM once and reuses it for all K diagonals — unlike the XLA
    lowering, which rereads x from HBM per diagonal once it outgrows VMEM."""
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        xp_ref.at[pl.ds(i * tile, win)], xwin, sem
    )
    cp.start()
    cp.wait()
    acc = jnp.zeros((tile,), dtype=jnp.float32)
    for k, d in enumerate(offsets):
        xs = xwin[halo + d : halo + d + tile]     # static in-VMEM slice
        acc = acc + data_ref[k, :].astype(jnp.float32) * xs
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("offsets", "tile", "interpret", "windowed")
)
def spmv_dia_pallas(
    offsets, data, x, *, tile: int = 4096, interpret=None, windowed=None
):
    """y = A x for ScalarDIA (offsets, data); x: (ndof,).

    offsets must be a static tuple.  ndof is padded to a tile multiple
    internally.  Set interpret=True off-TPU (defaults to auto-detect).
    windowed=None auto-selects: the whole padded x lives in VMEM when it
    fits (< 4 MB), otherwise it stays in HBM and each tile DMAs its window.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k, n = data.shape
    h = max(max(abs(d) for d in offsets), 1)
    n_pad = -(-n // tile) * tile
    grid = n_pad // tile
    if windowed is None:
        windowed = (n_pad + 2 * h) * data.dtype.itemsize > 4 * 1024 * 1024

    data_p = jnp.pad(data, ((0, 0), (0, n_pad - n)))

    if windowed:
        # Mosaic requires matching 1-D DMA tilings: round the window to a
        # full (8, 128) tile multiple (1024 f32 elements).
        win = tile + 2 * h
        win = -(-win // 1024) * 1024
        # xp index of x[j] is j + h; window for tile i covers [i*tile, +win).
        # 1-D on purpose: the DMA source must share the 1-D scratch tiling.
        xp = jnp.pad(x.astype(data.dtype), (h, h + (n_pad - n) + win))
        out = pl.pallas_call(
            functools.partial(_dia_kernel_windowed, offsets, tile, h, win),
            out_shape=jax.ShapeDtypeStruct((n_pad,), x.dtype),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),       # x stays in HBM
                pl.BlockSpec((k, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((win,), data.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(xp, data_p)
        return out[:n]

    # x padded with halo on both sides, to the padded length, plus room for
    # the aligned-load overshoot (128-aligned start + tile + 128 window).
    xp = jnp.pad(x.astype(data.dtype), (h, h + (n_pad - n) + 256))[None, :]
    out = pl.pallas_call(
        functools.partial(_dia_kernel, offsets, tile, h),
        out_shape=jax.ShapeDtypeStruct((n_pad,), x.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole padded x (~0.5 MB)
            pl.BlockSpec((k, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, data_p)
    return out[:n]
