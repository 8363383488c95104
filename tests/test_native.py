"""Native C++ host runtime vs pure-Python fallbacks (identical semantics)."""

import numpy as np
import pytest

from navierstokes_tpu import native
from navierstokes_tpu.mesh import channel_mesh
from navierstokes_tpu.mesh.gmsh import _read_gmsh_py, write_gmsh
from navierstokes_tpu.mesh.ordering import _rcm_ordering_py, block_bandwidth, reorder_mesh
from navierstokes_tpu.sparse.bcsr import bcsr_pattern_from_coo

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_native_builds():
    assert native.available()


def test_gmsh_parser_matches_python(tmp_path):
    mesh = channel_mesh(5, 3, 3, length=2.0, obstacle=True)
    path = str(tmp_path / "m.msh")
    write_gmsh(mesh, path)
    coords, tets, tags = native.parse_gmsh_native(path)
    ref = _read_gmsh_py(path)
    np.testing.assert_allclose(coords, ref.coords)
    np.testing.assert_array_equal(tets, ref.tets)
    np.testing.assert_array_equal(tags, ref.node_tags)


def test_gmsh_parser_missing_file():
    with pytest.raises(ValueError, match="cannot open"):
        native.parse_gmsh_native("/nonexistent/path.msh")


def test_pattern_matches_numpy():
    mesh = channel_mesh(4, 3, 3, length=2.0)
    indptr, indices, slot = native.build_pattern_native(mesh.nv, mesh.tets)

    t = mesh.tets
    rows = np.repeat(t, 4, axis=1).ravel()
    cols = np.tile(t, (1, 4)).ravel()
    indptr_ref, indices_ref, slot_ref = bcsr_pattern_from_coo(rows, cols, mesh.nv)

    np.testing.assert_array_equal(indptr, indptr_ref)
    np.testing.assert_array_equal(indices, indices_ref)
    np.testing.assert_array_equal(slot, slot_ref)


def test_rcm_matches_python_bandwidth():
    mesh = channel_mesh(8, 3, 3, length=4.0)
    rng = np.random.default_rng(0)
    from navierstokes_tpu.mesh.ordering import reorder_mesh as rm

    shuffled = rm(mesh, rng.permutation(mesh.nv).astype(np.int32))

    indptr, indices, _ = native.build_pattern_native(shuffled.nv, shuffled.tets)
    perm_native = native.rcm_native(shuffled.nv, indptr, indices)
    perm_py = _rcm_ordering_py(shuffled)

    assert sorted(perm_native.tolist()) == list(range(shuffled.nv))
    bw_native = block_bandwidth(rm(shuffled, perm_native))
    bw_py = block_bandwidth(rm(shuffled, perm_py))
    # Same algorithm, same tie-breaking -> identical result expected; allow
    # equality of quality as the contract.
    assert bw_native <= bw_py * 1.1 + 2
