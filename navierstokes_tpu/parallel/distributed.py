"""Multi-chip Navier–Stokes solver: domain decomposition over a device mesh.

Extends the single-chip `NavierStokesSolver` by routing every Krylov matvec
through the row-partitioned halo-exchange SpMV (`parallel.partitioned`).
Vectors inside the linear solves are padded to `n_devices * L` rows and
sharded over the mesh axis; dots/norms inside GMRES are partitioned by XLA
into local reductions + psum.  Assembly stays in the global view (XLA SPMD
shards the element loop automatically).

The mesh must be band-ordered (RCM) so that the block bandwidth fits the
per-device halo — `from_mesh` handles ordering and validates the fit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P

from navierstokes_tpu.config import NSConfig
from navierstokes_tpu.mesh.core import Mesh
from navierstokes_tpu.mesh.ordering import best_ordering, reorder_mesh
from navierstokes_tpu.model.navier_stokes import NavierStokesSolver
from navierstokes_tpu.ops.block import block4_apply, block4_inverse
from navierstokes_tpu.parallel.partitioned import (
    RowPartition,
    build_row_partition,
    pad_ell_values,
    pad_vector,
    partitioned_spmv,
    unpad_vector,
)
from navierstokes_tpu.solvers.gmres import GMRESResult, gmres


class DistributedNavierStokesSolver(NavierStokesSolver):
    def __init__(
        self,
        mesh: Mesh,
        cfg: Optional[NSConfig] = None,
        *,
        devices=None,
        axis: str = "x",
    ):
        devices = list(devices if devices is not None else jax.devices())
        super().__init__(mesh, cfg)
        self.axis = axis
        self.device_mesh = DeviceMesh(np.array(devices), (axis,))
        self.partition: RowPartition = build_row_partition(
            self.disc.ell_indices, len(devices)
        )
        self._delta_idx = jnp.asarray(self.partition.delta_indices)
        self._row_sharding = NamedSharding(self.device_mesh, P(axis))

    @classmethod
    def from_mesh(cls, mesh: Mesh, cfg=None, *, devices=None, axis="x"):
        """Band-order the mesh, then build the distributed solver."""
        perm = best_ordering(mesh)
        return cls(reorder_mesh(mesh, perm), cfg, devices=devices, axis=axis), perm

    def _linear_solve(self, bcsr_values, rhs, solver_cfg):
        part = self.partition
        ell_values = pad_ell_values(part, self._ell_values(bcsr_values))
        b = pad_vector(part, rhs)
        b = jax.lax.with_sharding_constraint(
            b.reshape(part.nb_pad, 4), self._row_sharding
        ).reshape(-1)

        def matvec(x):
            return partitioned_spmv(
                part, self.device_mesh, self.axis, self._delta_idx,
                ell_values, x,
            )

        # Block-Jacobi on the padded diagonal (identity blocks in pad rows).
        inv_diag = block4_inverse(
            bcsr_values[self.disc.diag_slots], pivot_eps=1e-300, shift=1e-8
        )
        n_pad = part.nb_pad - part.nb
        if n_pad:
            eye = jnp.broadcast_to(
                jnp.eye(4, dtype=inv_diag.dtype), (n_pad, 4, 4)
            )
            inv_diag = jnp.concatenate([inv_diag, eye], axis=0)
        order = self.cfg.krylov.neumann_order

        def pc(r):
            z = block4_apply(inv_diag, r)
            for _ in range(order):
                z = z + block4_apply(inv_diag, r - matvec(z))
            return z

        res = gmres(
            matvec, b, precond=pc, restart=solver_cfg.restart,
            rtol=solver_cfg.rtol, atol=solver_cfg.atol,
            maxiter=solver_cfg.maxiter,
        )
        return GMRESResult(
            x=unpad_vector(part, res.x),
            iters=res.iters,
            resnorm=res.resnorm,
            converged=res.converged,
        )

    def _exact_solve(self, rhs, solver_cfg):
        """Exact-Jacobian mode routed through the partitioned matvec."""
        return self._linear_solve(self._jlin_bc_values, rhs, solver_cfg)
