"""Component-plane DIA SpMV (ops/plane_dia.py) vs dense ground truth.

The block-structure-aware second layout (the reference's BAIJ8 question,
`src/kernels/baij8_avx512.c`, answered the bandwidth way — see
benchlogs/layout_census.txt).  Runs the Pallas kernel in interpret mode.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.ops.plane_dia import (
    extract_planes,
    from_planes,
    node_offsets_from_scalar,
    plane_terms,
    pretile_planes,
    spmv_plane_pallas,
    to_planes,
)

NODE_OFFS = (-7, -5, -1, 0, 1, 2, 6)


def _random_block_band(nb, node_offs, rng, dtype=np.float32):
    """Dense (4nb, 4nb) matrix with dense 4x4 blocks on the node offsets,
    plus its scalar-DIA (offsets, data)."""
    n = 4 * nb
    dense = np.zeros((n, n), dtype)
    for d in node_offs:
        lo, hi = max(0, -d), min(nb, nb - d)
        blocks = rng.standard_normal((hi - lo, 4, 4)).astype(dtype)
        for i in range(lo, hi):
            dense[4 * i:4 * i + 4, 4 * (i + d):4 * (i + d) + 4] = blocks[i - lo]
    offsets = tuple(sorted({4 * d + e for d in node_offs
                            for e in range(-3, 4)}))
    data = np.zeros((len(offsets), n), dtype)
    for k, off in enumerate(offsets):
        for i in range(max(0, -off), min(n, n - off)):
            data[k, i] = dense[i, i + off]
    return dense, offsets, jnp.asarray(data)


def test_node_offsets_from_scalar():
    offsets = tuple(sorted({4 * d + e for d in NODE_OFFS
                            for e in range(-3, 4)}))
    assert node_offsets_from_scalar(offsets) == tuple(sorted(NODE_OFFS))


def test_plane_roundtrip():
    rng = np.random.default_rng(3)
    nb, nbp = 37, 64
    x = jnp.asarray(rng.standard_normal(4 * nb), jnp.float32)
    assert np.allclose(from_planes(to_planes(x, nb, nbp), nb, nbp), x)


@pytest.mark.parametrize("nb", [300, 2500])
def test_plane_spmv_matches_dense(nb):
    rng = np.random.default_rng(nb)
    dense, offsets, data = _random_block_band(nb, NODE_OFFS, rng)
    node_offs = node_offsets_from_scalar(offsets)
    planes = extract_planes(offsets, data, nb, node_offsets=node_offs)
    assert planes.shape == (4, len(plane_terms(node_offs)), nb)
    tile = 1024
    tiled = pretile_planes(planes, nb, tile=tile)
    nbp = tiled.shape[0] * tile

    x = jnp.asarray(rng.standard_normal(4 * nb), jnp.float32)
    xp = to_planes(x, nb, nbp)
    yp = spmv_plane_pallas(node_offs, tiled, xp, nb=nb, interpret=True)
    y = from_planes(yp, nb, nbp)
    ref = dense @ np.asarray(x)
    err = np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref)
    assert err < 1e-5, err


def test_extract_planes_values():
    """planes[a, j=(b, D)][i] == A[4i+a, 4(i+D)+b] exactly."""
    rng = np.random.default_rng(7)
    nb = 50
    dense, offsets, data = _random_block_band(nb, (-2, 0, 1), rng)
    node_offs = node_offsets_from_scalar(offsets)
    planes = np.asarray(extract_planes(offsets, data, nb,
                                       node_offsets=node_offs))
    terms = plane_terms(node_offs)
    for a in range(4):
        for j, (b, d) in enumerate(terms):
            for i in (0, 1, nb // 2, nb - 2, nb - 1):
                if 0 <= i + d < nb:
                    assert planes[a, j, i] == dense[4 * i + a,
                                                    4 * (i + d) + b]


def test_plane_mode_solver_matches_scalar():
    """spmv='plane' end-to-end (stokes + one Newton step) == scalar path.

    The whole Krylov space runs in component-plane layout; conversions
    happen only at the solve boundary, so agreement to f64 GMRES tolerance
    validates the plane operator, the plane D^{-1}, the coarse round-trip,
    and the plane-native residual at once."""
    import dataclasses

    from navierstokes_tpu.config import NSConfig, SolverConfig
    from navierstokes_tpu.mesh import channel_mesh
    from navierstokes_tpu.model import NavierStokesSolver

    mesh = channel_mesh(6, 3, 3, length=3.0, obstacle=True)
    kr = SolverConfig(rtol=1e-12, atol=1e-13, maxiter=4000,
                      preconditioner="two_level", coarse_agg=4)
    cfg = NSConfig(dt=0.01, t_final=0.02, reynolds=100.0, delta=0.1,
                   dtype="float64", krylov=kr, stokes_krylov=kr)
    krp = dataclasses.replace(kr, spmv="plane")
    cfg_p = dataclasses.replace(cfg, krylov=krp, stokes_krylov=krp)

    s = NavierStokesSolver(mesh, cfg)
    sp = NavierStokesSolver(mesh, cfg_p, disc=s.disc)
    assert sp._exact_prep[0] == "tlp"
    assert sp._res_A.ndim == 4 and sp._res_M.ndim == 4   # shared plane ops

    u0 = s.stokes_init()
    u0p = sp.stokes_init()
    err0 = np.linalg.norm(np.asarray(u0p) - np.asarray(u0)) / max(
        np.linalg.norm(np.asarray(u0)), 1e-30)
    assert err0 < 1e-8, f"stokes disagreement {err0}"

    du = jnp.zeros_like(u0)
    u1, _, st = s.step(u0, u0, du)
    u1p, _, stp = sp.step(u0, u0, du)
    assert bool(st.converged) and bool(stp.converged)
    err = np.linalg.norm(np.asarray(u1p) - np.asarray(u1)) / np.linalg.norm(
        np.asarray(u1))
    assert err < 1e-8, f"plane-mode step disagreement {err}"
