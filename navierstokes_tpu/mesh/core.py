"""Core mesh data model.

Structure-of-arrays tetrahedral mesh with per-node boundary surface tags,
mirroring what the reference's `read_mesh` produces
(`src/solve_newton.c:91-197`): node coordinates, tet connectivity, and a
single surface tag per boundary node (-1 for interior nodes).

Surface tag semantics (`src/solve_newton.c:995-1035`):
  1 = obstacle (no-slip, u = 0)
  2 = inlet    (no-slip walls + Poiseuille u_x = (1-y^2)(1-z^2))
  3 = outlet   (free outflow — NOT collected as a boundary node)
  4, 5 = slip walls, impose u_y = 0 only
  6, 7 = slip walls, impose u_z = 0 only
"""

from __future__ import annotations

import dataclasses

import numpy as np

TAG_OBSTACLE = 1
TAG_INLET = 2
TAG_OUTLET = 3
TAG_SLIP_Y = (4, 5)
TAG_SLIP_Z = (6, 7)

# Tags that make a node a "boundary node" in the reference reader
# (`src/solve_newton.c:166-168` — note 3 is deliberately absent).
COLLECTED_TAGS = (1, 2, 4, 5, 6, 7)


@dataclasses.dataclass
class Mesh:
    """Tetrahedral mesh in structure-of-arrays form (host-side, numpy).

    Attributes:
      coords:    (nv, 3) float64 node coordinates.
      tets:      (ne, 4) int32 tetrahedron connectivity (0-based).
      node_tags: (nv,)   int32 surface tag per node, -1 for interior/outlet.
    """

    coords: np.ndarray
    tets: np.ndarray
    node_tags: np.ndarray

    def __post_init__(self):
        self.coords = np.ascontiguousarray(self.coords, dtype=np.float64)
        self.tets = np.ascontiguousarray(self.tets, dtype=np.int32)
        self.node_tags = np.ascontiguousarray(self.node_tags, dtype=np.int32)

    @property
    def nv(self) -> int:
        return self.coords.shape[0]

    @property
    def ne(self) -> int:
        return self.tets.shape[0]

    @property
    def ndof(self) -> int:
        """Total DoF count: 4 per node (u_x, u_y, u_z, p)."""
        return 4 * self.nv

    @property
    def boundary_nodes(self) -> np.ndarray:
        """Nodes carrying a collected surface tag (sorted ascending)."""
        return np.flatnonzero(np.isin(self.node_tags, COLLECTED_TAGS)).astype(np.int32)

    def node_adjacency(self):
        """Symmetric node-to-node adjacency (incl. self) as a (rows, cols) COO pair.

        This is the block sparsity pattern of the 4x4-blocked FEM operator: one
        block per pair of nodes sharing a tet.
        """
        t = self.tets
        # All ordered pairs (i, j) of nodes within each tet, incl. i == j.
        ii = np.repeat(t, 4, axis=1).ravel()            # (ne*16,)
        jj = np.tile(t, (1, 4)).ravel()                 # (ne*16,)
        keys = ii.astype(np.int64) * self.nv + jj
        keys = np.unique(keys)
        return (keys // self.nv).astype(np.int32), (keys % self.nv).astype(np.int32)
