from navierstokes_tpu.io.dat import read_petsc_vec, write_petsc_vec
from navierstokes_tpu.io.vtu import write_pvd, write_vtu
from navierstokes_tpu.io.checkpoint import load_checkpoint, save_checkpoint

__all__ = [
    "read_petsc_vec",
    "write_petsc_vec",
    "write_vtu",
    "write_pvd",
    "save_checkpoint",
    "load_checkpoint",
]
