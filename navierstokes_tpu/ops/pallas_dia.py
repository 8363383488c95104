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
    # f32 accumulation for low-precision inputs; full width for f64 (the
    # CPU/interpret validation path).
    acc_dtype = jnp.promote_types(out_ref.dtype, jnp.float32)
    acc = jnp.zeros((tile,), dtype=acc_dtype)
    for k, d in enumerate(offsets):
        # Mosaic requires provably-128-aligned dynamic lane offsets: split
        # the static halo+d into an aligned part (dynamic load start) and a
        # static lane remainder (static slice of the loaded vector).
        q, r = divmod(halo + d, 128)
        seg = xp_ref[0, pl.ds(base + 128 * q, tile + 128)]
        xs = jax.lax.slice_in_dim(seg, r, r + tile, axis=0)
        acc = acc + data_ref[k, :].astype(acc_dtype) * xs.astype(acc_dtype)
    out_ref[...] = acc.astype(out_ref.dtype)


def _dia_kernel_windowed(offsets, tile, halo, win, granule, xp_ref, data_ref,
                         out_ref, xwin, sem):
    """Large-n variant: x stays in HBM; each tile DMAs its (tile + 2*halo)
    window into VMEM once and reuses it for all K diagonals — unlike the XLA
    lowering, which rereads x from HBM per diagonal once it outgrows VMEM.

    Double-buffered: `xwin` is one flat (2*win,) scratch holding two slots
    (flat 1-D so DMA source/target tilings match — Mosaic constraint); the
    DMA for tile i+1's window is issued before tile i's compute, overlapping
    the x-window fetch with the K multiply-adds.  The diagonal data stream
    (data_ref) is already double-buffered by the pallas grid pipeline."""
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
    acc_dtype = jnp.promote_types(out_ref.dtype, jnp.float32)
    acc = jnp.zeros((tile,), dtype=acc_dtype)
    pretiled = data_ref.ndim == 3
    for k, d in enumerate(offsets):
        # Flat 1-D VMEM arrays are tiled in 4 KB granules (1024 f32 / 2048
        # bf16), so dynamic load offsets must be provably granule-aligned
        # (vs 128 lanes for 2-D): split halo+d into an aligned dynamic start
        # and a static remainder slice.
        q, r = divmod(halo + d, granule)
        seg = xwin[pl.ds(base + granule * q, tile + granule)]
        xs = jax.lax.slice_in_dim(seg, r, r + tile, axis=0)
        row = data_ref[0, k, :] if pretiled else data_ref[k, :]
        acc = acc + row.astype(acc_dtype) * xs.astype(acc_dtype)
    out_ref[...] = acc.astype(out_ref.dtype)


def pretile_dia(data, n, *, tile: int = 4096):
    """(K, n) DIA data -> (grid, K, tile) tile-major layout.

    In the row-major (K, n) layout each tile's HBM fetch is K strided strips
    of tile*itemsize bytes spaced n*itemsize apart; beyond ~500k rows the
    stride defeats HBM page locality and the stream plateaus near 210 GB/s.
    Tile-major storage makes each grid step's operator block one contiguous
    DMA.  Do this ONCE at operator-preparation time (it is a full copy),
    then pass the 3-D result to `spmv_dia_pallas`."""
    k = data.shape[0]
    n_pad = -(-n // tile) * tile
    data_p = jnp.pad(data, ((0, 0), (0, n_pad - n)))
    return data_p.reshape(k, n_pad // tile, tile).transpose(1, 0, 2)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "tile", "interpret", "windowed", "n",
                     "x_prehalo"),
)
def spmv_dia_pallas(
    offsets, data, x, *, tile: int = 4096, interpret=None, windowed=None,
    n=None, x_prehalo: bool = False,
):
    """y = A x for ScalarDIA (offsets, data); x: (ndof,).

    offsets must be a static tuple.  ndof is padded to a tile multiple
    internally.  Set interpret=True off-TPU (defaults to auto-detect).
    windowed=None auto-selects: the whole padded x lives in VMEM when it
    fits (< 4 MB), otherwise it stays in HBM and each tile DMAs its window.
    data may be 2-D (K, n) row-major, or 3-D (grid, K, tile) tile-major from
    `pretile_dia` (windowed path only; pass n=len(x) explicitly).

    x_prehalo=True (pretiled path only): x already carries `halo` ghost
    values on BOTH ends (length n + 2*halo) — the distributed per-shard
    case, where the halo was filled by a `ppermute` exchange instead of
    zero padding (parallel.partitioned_spmv_dia_pretiled).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pretiled = data.ndim == 3
    if pretiled:
        grid_, k, tile = data.shape
        h = max(max(abs(d) for d in offsets), 1)
        n = n if n is not None else (
            x.shape[0] - 2 * h if x_prehalo else x.shape[0]
        )
        n_pad = grid_ * tile
        # >= (not ==): the distributed layout pads rows further so every
        # device gets whole tiles (padding columns carry zero data).
        assert n_pad >= -(-n // tile) * tile
        grid = grid_
        windowed = True
        data_p = data
    else:
        assert not x_prehalo, "x_prehalo requires pretiled (3-D) data"
        k, n = data.shape
        h = max(max(abs(d) for d in offsets), 1)
        n_pad = -(-n // tile) * tile
        grid = n_pad // tile
        if windowed is None:
            windowed = (n_pad + 2 * h) * data.dtype.itemsize > 4 * 1024 * 1024
        data_p = jnp.pad(data, ((0, 0), (0, n_pad - n)))

    if windowed:
        # Mosaic requires matching 1-D DMA tilings: round the window to a
        # full 4 KB granule (1024 f32 / 2048 bf16 elements).  +granule leaves
        # room for the aligned-load overshoot.  x keeps ITS OWN dtype (the
        # operator may be bf16 while x stays f32 — better accuracy, and the
        # granule follows the x-window tiling).
        granule = max(4096 // x.dtype.itemsize, 128)
        win = tile + 2 * h + granule
        win = -(-win // granule) * granule
        # xp index of x[j] is j + h; window for tile i covers [i*tile, +win).
        # 1-D on purpose: the DMA source must share the 1-D scratch tiling.
        if x_prehalo:
            # x = [ghost_left(h), own(n), ghost_right(h)] — already in the
            # xp layout; only the tile-padding tail is missing.
            assert x.shape[0] == n + 2 * h
            xp = jnp.pad(x, (0, (n_pad - n) + win - h))
        else:
            xp = jnp.pad(x, (h, h + (n_pad - n) + win))
        data_spec = (
            pl.BlockSpec((1, k, tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            if pretiled
            else pl.BlockSpec((k, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        )
        out = pl.pallas_call(
            functools.partial(
                _dia_kernel_windowed, offsets, tile, h, win, granule
            ),
            out_shape=jax.ShapeDtypeStruct((n_pad,), x.dtype),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
                data_spec,
            ],
            out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2 * win,), x.dtype),      # two x-window slots
                pltpu.SemaphoreType.DMA((2,)),
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
