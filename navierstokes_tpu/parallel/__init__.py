from navierstokes_tpu.parallel.partitioned import (
    RowPartition,
    build_row_partition,
    partitioned_spmv,
)
from navierstokes_tpu.parallel.distributed import DistributedNavierStokesSolver

__all__ = [
    "RowPartition",
    "build_row_partition",
    "partitioned_spmv",
    "DistributedNavierStokesSolver",
]
