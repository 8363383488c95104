from navierstokes_tpu.solvers.gmres import gmres
from navierstokes_tpu.solvers.cg import cg
from navierstokes_tpu.solvers.precond import (
    BlockJacobiPreconditioner,
    ILU0Preconditioner,
    make_preconditioner,
)

__all__ = [
    "gmres",
    "cg",
    "BlockJacobiPreconditioner",
    "ILU0Preconditioner",
    "make_preconditioner",
]
