from navierstokes_tpu.mesh.core import Mesh
from navierstokes_tpu.mesh.gmsh import read_gmsh
from navierstokes_tpu.mesh.box import box_mesh, channel_mesh
from navierstokes_tpu.mesh.ordering import rcm_ordering, reorder_mesh

__all__ = [
    "Mesh",
    "read_gmsh",
    "box_mesh",
    "channel_mesh",
    "rcm_ordering",
    "reorder_mesh",
]
