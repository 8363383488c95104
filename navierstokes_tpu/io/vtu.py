"""VTK XML output: per-step `.vtu` unstructured grids + a `.pvd` collection.

The reference's `res/time_series.pvd` indexes `solution_NNNN.vtu` files whose
writer is not in the repo (stripped); this module provides the missing piece:
ASCII VTU with the tet mesh, velocity as a 3-vector point field and pressure
as a scalar point field, plus the matching collection file (same format as
`res/time_series.pvd:1-8`).
"""

from __future__ import annotations

import numpy as np

from navierstokes_tpu.mesh.core import Mesh


def write_vtu(path: str, mesh: Mesh, u) -> None:
    """Write one solution snapshot. u: (4*nv,) DoF vector (block-node order)."""
    u4 = np.asarray(u).reshape(mesh.nv, 4)
    vel = u4[:, :3]
    pres = u4[:, 3]
    nv, ne = mesh.nv, mesh.ne

    def arr2txt(a, per_line=1):
        a = np.asarray(a)
        return "\n".join(
            " ".join("%.9g" % x for x in row) for row in a.reshape(a.shape[0], -1)
        )

    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write(
            '<VTKFile type="UnstructuredGrid" version="0.1" '
            'byte_order="LittleEndian">\n'
        )
        f.write("  <UnstructuredGrid>\n")
        f.write(f'    <Piece NumberOfPoints="{nv}" NumberOfCells="{ne}">\n')
        f.write("      <Points>\n")
        f.write(
            '        <DataArray type="Float64" NumberOfComponents="3" '
            'format="ascii">\n'
        )
        f.write(arr2txt(mesh.coords))
        f.write("\n        </DataArray>\n      </Points>\n")
        f.write("      <Cells>\n")
        f.write('        <DataArray type="Int32" Name="connectivity" format="ascii">\n')
        f.write(arr2txt(mesh.tets))
        f.write("\n        </DataArray>\n")
        f.write('        <DataArray type="Int32" Name="offsets" format="ascii">\n')
        f.write(arr2txt(4 * np.arange(1, ne + 1, dtype=np.int64)[:, None]))
        f.write("\n        </DataArray>\n")
        f.write('        <DataArray type="UInt8" Name="types" format="ascii">\n')
        f.write(arr2txt(np.full((ne, 1), 10, dtype=np.uint8)))  # 10 = VTK_TETRA
        f.write("\n        </DataArray>\n      </Cells>\n")
        f.write("      <PointData>\n")
        f.write(
            '        <DataArray type="Float64" Name="velocity" '
            'NumberOfComponents="3" format="ascii">\n'
        )
        f.write(arr2txt(vel))
        f.write("\n        </DataArray>\n")
        f.write('        <DataArray type="Float64" Name="pressure" format="ascii">\n')
        f.write(arr2txt(pres[:, None]))
        f.write("\n        </DataArray>\n      </PointData>\n")
        f.write("    </Piece>\n  </UnstructuredGrid>\n</VTKFile>\n")


def write_pvd(path: str, entries) -> None:
    """entries: list of (timestep, filename) — mirrors `res/time_series.pvd`."""
    with open(path, "w") as f:
        f.write("<?xml version='1.0' encoding='utf-8'?>\n")
        f.write('<VTKFile type="Collection" version="0.1">\n')
        f.write("  <Collection>\n")
        for ts, name in entries:
            f.write(
                f'    <DataSet timestep="{ts}" group="" part="0" file="{name}" />\n'
            )
        f.write("  </Collection>\n</VTKFile>\n")
