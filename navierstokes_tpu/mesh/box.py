"""Synthetic structured tetrahedral meshes.

The reference's bundled mesh (`mmesh`) is a stripped large blob, so the
framework ships generators that reproduce the same *class* of problem: a
rectangular channel with cross-section [-1,1]^2 (matching the reference's
Poiseuille inlet profile `u_x = (1-y^2)(1-z^2)`, `src/solve_newton.c:1007`)
with an optional interior ellipsoidal obstacle, at any refinement — including
the 10-matrix scaling series sizes of `mpk/log/log_SPMV.txt`.

Each hexahedral cell is split into 6 tetrahedra (Kuhn subdivision), all with
positive orientation under the reference's volume convention
(`det(a1-a0, a2-a0, a3-a0)/6`, `src/integration.c:7-15`).
"""

from __future__ import annotations

import itertools

import numpy as np

from navierstokes_tpu.mesh.core import Mesh

_AXIS_VEC = {0: (1, 0, 0), 1: (0, 1, 0), 2: (0, 0, 1)}


def _kuhn_tets():
    """The 6 Kuhn tets of the unit cube as corner-bit tuples, positively oriented."""
    tets = []
    for perm in itertools.permutations((0, 1, 2)):
        c = [(0, 0, 0)]
        cur = (0, 0, 0)
        for ax in perm:
            v = _AXIS_VEC[ax]
            cur = (cur[0] + v[0], cur[1] + v[1], cur[2] + v[2])
            c.append(cur)
        # Permutation parity decides orientation; swap last two for odd perms.
        parity = sum(
            1
            for i in range(3)
            for j in range(i + 1, 3)
            if perm[i] > perm[j]
        )
        if parity % 2 == 1:
            c[2], c[3] = c[3], c[2]
        tets.append(tuple(c))
    return tets


_KUHN = _kuhn_tets()


def box_mesh(nx: int, ny: int, nz: int, bounds=((0.0, 1.0), (0.0, 1.0), (0.0, 1.0))):
    """Structured tet mesh of a box: (nx, ny, nz) cells, (nx+1)(ny+1)(nz+1) nodes.

    Returns coords (nv, 3) and tets (ne, 4) without tags.
    """
    (x0, x1), (y0, y1), (z0, z1) = bounds
    xs = np.linspace(x0, x1, nx + 1)
    ys = np.linspace(y0, y1, ny + 1)
    zs = np.linspace(z0, z1, nz + 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    coords = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    def nid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    # Vectorized cell-corner index grid.
    ci, cj, ck = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    ci, cj, ck = ci.ravel(), cj.ravel(), ck.ravel()
    tets = np.empty((len(ci) * 6, 4), dtype=np.int32)
    for t, corners in enumerate(_KUHN):
        for v, (di, dj, dk) in enumerate(corners):
            tets[t::6, v] = nid(ci + di, cj + dj, ck + dk)
    return coords, tets


def channel_mesh(
    nx: int,
    ny: int,
    nz: int,
    length: float = 4.0,
    obstacle: bool = False,
    obstacle_center=(1.0, 0.0, 0.0),
    obstacle_radii=(0.3, 0.4, 0.4),
) -> Mesh:
    """Channel [0, length] x [-1, 1] x [-1, 1] with reference-compatible tags.

    Tags (see `src/solve_newton.c:995-1035`):
      x = 0      -> 2 (inlet, Poiseuille)
      x = length -> 3 (free outlet; not a Dirichlet boundary)
      y = -1/+1  -> 4/5 (slip: u_y = 0)
      z = -1/+1  -> 6/7 (slip: u_z = 0)
      inside the ellipsoidal obstacle -> 1 (no-slip), immersed-boundary style
      (the reference uses a body-fitted ellipsoid surface; with `mmesh`
      missing we pin the obstacle nodes instead).

    One tag per node, priority: 1 > 2 > 4/5 > 6/7 > 3.
    """
    coords, tets = box_mesh(
        nx, ny, nz, bounds=((0.0, length), (-1.0, 1.0), (-1.0, 1.0))
    )
    nv = coords.shape[0]
    tags = np.full(nv, -1, dtype=np.int32)
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    eps = 1e-12

    tags[np.abs(x - length) < eps] = 3
    tags[np.abs(z + 1.0) < eps] = 6
    tags[np.abs(z - 1.0) < eps] = 7
    tags[np.abs(y + 1.0) < eps] = 4
    tags[np.abs(y - 1.0) < eps] = 5
    tags[np.abs(x) < eps] = 2
    if obstacle:
        cx, cy, cz = obstacle_center
        rx, ry, rz = obstacle_radii
        inside = (
            ((x - cx) / rx) ** 2 + ((y - cy) / ry) ** 2 + ((z - cz) / rz) ** 2
        ) <= 1.0
        tags[inside] = 1

    return Mesh(coords=coords, tets=tets, node_tags=tags)


def scaling_series_mesh(matrix_id: int) -> Mesh:
    """Meshes approximating the reference's 10-matrix scaling series
    (`mpk/log/log_SPMV.txt`: 268 ... 2,304,376 rows; rows = 4 * nodes).

    matrix_id is 1-based like the reference's `-matrix_id`.
    """
    # Target node counts: 67, 484, 1558, 2521, 8982, 30370, 56106, 127465,
    # 248161, 576094. Choose (nx, ny, nz) with (nx+1)(ny+1)(nz+1) close.
    dims = {
        1: (6, 2, 2),       # 63 nodes
        2: (10, 5, 5),      # 396
        3: (17, 8, 8),      # 1458
        4: (20, 10, 10),    # 2541
        5: (32, 15, 15),    # 8448
        6: (46, 24, 24),    # 29375  (mmesh-class, ~121k DoF)
        7: (57, 30, 30),    # 55738
        8: (75, 40, 40),    # 127756
        9: (95, 50, 50),    # 249696
        10: (126, 67, 67),  # 587648
    }
    nx, ny, nz = dims[matrix_id]
    return channel_mesh(nx, ny, nz, length=4.0, obstacle=matrix_id >= 3)
