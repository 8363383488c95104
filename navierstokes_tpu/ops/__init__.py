from navierstokes_tpu.ops.spmv import (
    spmv_bcsr_ref,
    spmv_bell,
    spmv_bell_windowed,
)
from navierstokes_tpu.ops.block import block4_inverse

__all__ = [
    "spmv_bcsr_ref",
    "spmv_bell",
    "spmv_bell_windowed",
    "block4_inverse",
]
