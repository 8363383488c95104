from navierstokes_tpu.model.navier_stokes import NavierStokesSolver, NewtonStats

__all__ = ["NavierStokesSolver", "NewtonStats"]
