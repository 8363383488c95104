from navierstokes_tpu.fem import elements
from navierstokes_tpu.fem.elements import (
    tet_volume,
    tet_gradients,
    tet_diameter,
    mass_matrix_scalar,
    mass_matrix,
    diffusion_matrix,
    convection_matrix_linearized,
    convection_matrix_nonlinear,
    divergence_matrix,
    pressure_stabilization_matrix,
    convection_jacobian,
)

__all__ = [
    "elements",
    "tet_volume",
    "tet_gradients",
    "tet_diameter",
    "mass_matrix_scalar",
    "mass_matrix",
    "diffusion_matrix",
    "convection_matrix_linearized",
    "convection_matrix_nonlinear",
    "divergence_matrix",
    "pressure_stabilization_matrix",
    "convection_jacobian",
]
