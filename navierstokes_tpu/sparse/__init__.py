from navierstokes_tpu.sparse.bcsr import BCSR4, bcsr_from_coo
from navierstokes_tpu.sparse.bell import BlockELL, bell_from_bcsr

__all__ = ["BCSR4", "bcsr_from_coo", "BlockELL", "bell_from_bcsr"]
