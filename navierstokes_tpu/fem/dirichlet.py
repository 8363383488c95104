"""Dirichlet boundary conditions from surface tags.

Builds the (rows, values) table of `src/solve_newton.c:987-1035` as dense
per-DoF masks — the functional `MatZeroRows`/`VecSetValues` equivalents:

  tag 1 (obstacle): u = 0                       (all three velocity DoF)
  tag 2 (inlet):    u_x = (1-y^2)(1-z^2), u_y = u_z = 0
  tag 4/5:          u_y = 0 only
  tag 6/7:          u_z = 0 only
  tag 3 / interior: free

Pressure DoF are never constrained.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from navierstokes_tpu.mesh.core import Mesh


@dataclasses.dataclass
class DirichletBC:
    """Dense DoF masks (device arrays).

    is_bc:  (ndof,) bool   — DoF has a Dirichlet condition.
    value:  (ndof,) float  — imposed value (0 where not constrained).
    row_bc: (nb, 4) bool   — same mask viewed per node block.
    """

    is_bc: jnp.ndarray
    value: jnp.ndarray
    row_bc: jnp.ndarray

    @property
    def count(self) -> int:
        return int(np.asarray(self.is_bc).sum())

    def apply_to_vector(self, u):
        """INSERT bc values into u (`VecSetValues(u_n, ...)`, `src/solve_newton.c:1211`)."""
        return jnp.where(self.is_bc, self.value, u)

    def zero_rows_vector(self, f):
        """Zero residual at constrained rows (`src/solve_newton.c:1220`)."""
        return jnp.where(self.is_bc, jnp.zeros((), f.dtype), f)


def build_dirichlet(mesh: Mesh, dtype=np.float64) -> DirichletBC:
    nv = mesh.nv
    tags = mesh.node_tags
    y = mesh.coords[:, 1]
    z = mesh.coords[:, 2]

    is_bc = np.zeros((nv, 4), dtype=bool)
    value = np.zeros((nv, 4), dtype=np.float64)

    noslip = (tags == 1) | (tags == 2)
    is_bc[noslip, 0:3] = True
    inlet = tags == 2
    value[inlet, 0] = (1.0 - y[inlet] ** 2) * (1.0 - z[inlet] ** 2)

    slip_y = (tags == 4) | (tags == 5)
    is_bc[slip_y, 1] = True
    slip_z = (tags == 6) | (tags == 7)
    is_bc[slip_z, 2] = True

    return DirichletBC(
        is_bc=jnp.asarray(is_bc.reshape(-1)),
        value=jnp.asarray(value.reshape(-1), dtype=dtype),
        row_bc=jnp.asarray(is_bc),
    )


def zero_rows_bcsr(values, row_ids, indices, diag_slots, row_bc):
    """Functional `MatZeroRows(J, rows, 1.0)` on BCSR block values (jittable).

    Zeroes every scalar row of the matrix whose DoF is constrained and puts
    1.0 on its diagonal entry (`src/solve_newton.c:1059,1247`).

    values:     (nnzb, 4, 4) device
    row_ids:    (nnzb,) block row of each slot (device or numpy)
    diag_slots: (nb,) slot index of each diagonal block
    row_bc:     (nb, 4) bool
    """
    mask = row_bc[row_ids]                        # (nnzb, 4)
    values = jnp.where(mask[:, :, None], jnp.zeros((), values.dtype), values)
    diag_fix = jnp.where(
        row_bc[:, :, None] & jnp.eye(4, dtype=bool)[None],
        jnp.ones((), values.dtype),
        values[diag_slots],
    )
    return values.at[diag_slots].set(diag_fix)
