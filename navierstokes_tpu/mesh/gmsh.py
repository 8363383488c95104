"""Gmsh 2.2 ASCII `.msh` reader.

Re-implements the semantics of the reference reader `read_mesh`
(`src/solve_newton.c:91-197`):

- `$Nodes` section: node id + xyz per line (ids assumed 1..nv in order),
- `$Elements` section: element type 4 = tetrahedron (kept), types 2 (tri) /
  3 (quad) = boundary facets whose *second and later* tags are scanned for a
  collected surface tag in {1, 2, 4, 5, 6, 7}; each facet node gets that tag
  (last writer wins, as in the reference),
- all other element types are skipped.

A fast C++ parser is used when the native extension is available (see
`navierstokes_tpu/native`); this pure-Python version is the always-available
fallback and the semantic oracle.
"""

from __future__ import annotations

import numpy as np

from navierstokes_tpu.mesh.core import COLLECTED_TAGS, Mesh


def read_gmsh(path: str) -> Mesh:
    from navierstokes_tpu import native

    parsed = native.parse_gmsh_native(path)
    if parsed is not None:
        coords, tets, tags = parsed
        return Mesh(coords=coords, tets=tets, node_tags=tags)
    return _read_gmsh_py(path)


def _read_gmsh_py(path: str) -> Mesh:
    with open(path, "r") as f:
        lines = f.read().split("\n")

    nv = 0
    coords = None
    node_tags = None
    tets = []

    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if line.startswith("$Nodes"):
            nv = int(lines[i + 1].split()[0])
            coords = np.empty((nv, 3), dtype=np.float64)
            node_tags = np.full(nv, -1, dtype=np.int32)
            for k in range(nv):
                parts = lines[i + 2 + k].split()
                coords[k] = [float(parts[1]), float(parts[2]), float(parts[3])]
            i += 2 + nv
            continue
        if line.startswith("$Elements"):
            total = int(lines[i + 1].split()[0])
            for k in range(total):
                parts = lines[i + 2 + k].split()
                etype = int(parts[1])
                ntags = int(parts[2])
                tags = [int(x) for x in parts[3 : 3 + ntags]]
                verts = [int(x) - 1 for x in parts[3 + ntags :]]
                if etype == 4:  # tetrahedron
                    tets.append(verts[:4])
                elif etype in (2, 3):  # boundary tri / quad
                    # Reference scans tags[1:] for the first collected tag
                    # (`src/solve_newton.c:166-172`).
                    surface_tag = -1
                    for t in tags[1:]:
                        if t in COLLECTED_TAGS:
                            surface_tag = t
                            break
                    if surface_tag != -1:
                        nvert = 3 if etype == 2 else 4
                        for v in verts[:nvert]:
                            node_tags[v] = surface_tag
            i += 2 + total
            continue
        i += 1

    if coords is None:
        raise ValueError(f"no $Nodes section found in {path}")
    tets_arr = (
        np.asarray(tets, dtype=np.int32) if tets else np.empty((0, 4), dtype=np.int32)
    )
    return Mesh(coords=coords, tets=tets_arr, node_tags=node_tags)


def write_gmsh(mesh: Mesh, path: str) -> None:
    """Write a Gmsh 2.2 ASCII file (tets + synthesized boundary facets).

    Boundary facets are emitted as degenerate point-per-node triangles would be
    invalid Gmsh, so instead we emit the boundary triangles of the tet mesh
    whose three nodes share a collected tag.

    DOCUMENTED LIMITATION (pinned by tests/test_mesh.py::
    test_write_gmsh_roundtrip_policy): a face whose nodes carry DIFFERENT
    tags is dropped — a facet line tags all its vertices, so emitting a
    mixed face would overwrite neighboring surfaces' node tags under the
    reader's last-writer-wins semantics.  Round-tripped tags are therefore
    never wrong, but a node whose every boundary face is mixed (e.g. the
    one-node-wide z-plane interior of a 4x2x2 channel) loses its tag (-1).
    """
    faces = {}
    # Boundary faces = tet faces appearing exactly once.
    f_idx = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
    for tet in mesh.tets:
        for a, b, c in f_idx:
            key = tuple(sorted((tet[a], tet[b], tet[c])))
            faces[key] = faces.get(key, 0) + 1
    boundary_faces = [k for k, cnt in faces.items() if cnt == 1]

    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write(f"$Nodes\n{mesh.nv}\n")
        for i, (x, y, z) in enumerate(mesh.coords):
            f.write(f"{i + 1} {x:.16g} {y:.16g} {z:.16g}\n")
        f.write("$EndNodes\n")

        elems = []
        eid = 1
        for a, b, c in boundary_faces:
            # Use the (identical-or-dominant) tag of the face's nodes.
            tags = [mesh.node_tags[v] for v in (a, b, c)]
            tag = max(tags)
            if tag in COLLECTED_TAGS and min(tags) == max(tags):
                elems.append(f"{eid} 2 2 {tag} {tag} {a + 1} {b + 1} {c + 1}")
                eid += 1
        for tet in mesh.tets:
            elems.append(
                f"{eid} 4 2 0 0 {tet[0] + 1} {tet[1] + 1} {tet[2] + 1} {tet[3] + 1}"
            )
            eid += 1
        f.write(f"$Elements\n{len(elems)}\n")
        f.write("\n".join(elems))
        f.write("\n$EndElements\n")
