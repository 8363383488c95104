"""MatrixMarket coordinate-format IO.

The reference emits `.mtx` via PETSc viewers (`save_matrix_mtx`,
`src/solve_newton.c:53-60`) to feed the standalone mpk benchmark suite,
which parses them back (`mpk/SpM2V.cpp:815-852`).  Same role here: the
matrix-generator app writes the assembled NS operators as `.mtx`, and the
benchmark drivers read any MatrixMarket general real matrix.
"""

from __future__ import annotations

import numpy as np

from navierstokes_tpu.sparse.bcsr import BCSR4


def _scalar_coo(m: BCSR4):
    """Expand BCSR4 blocks to scalar COO in block-node ordering (4n+comp)."""
    rows = m.row_ids().astype(np.int64)
    cols = m.indices.astype(np.int64)
    a = np.arange(4, dtype=np.int64)
    shape = (len(rows), 4, 4)
    r = np.broadcast_to(4 * rows[:, None, None] + a[None, :, None], shape)
    c = np.broadcast_to(4 * cols[:, None, None] + a[None, None, :], shape)
    v = np.asarray(m.values).reshape(-1)
    return r.reshape(-1), c.reshape(-1), v


def _write_mtx_coo(path: str, n: int, r, c, v) -> None:
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{n} {n} {len(v)}\n")
        np.savetxt(f, np.column_stack([r + 1, c + 1, v]),
                   fmt="%d %d %.17g")


def write_mtx(path: str, m: BCSR4) -> None:
    """Write a BCSR4 as scalar MatrixMarket coordinate general real
    (block-node DoF ordering, 4*node + component — the reference's
    `matrix_aijp`/`matrix_baij4` scalar content, `src/create_mat.c:412-484`)."""
    r, c, v = _scalar_coo(m)
    _write_mtx_coo(path, 4 * m.nb, r, c, v)


def write_mtx_by_component(path: str, m: BCSR4, nv: int) -> None:
    """Write a BCSR4 in the reference's ORDER_BY_COMPONENT scalar ordering:
    all u_x rows first, then u_y, u_z, p (node + comp*nv —
    `src/create_mat.c:55-61`, output `:376-409`).  Entries are the block-node
    matrix under the permutation 4*node + comp -> node + comp*nv."""
    assert m.nb == nv
    r, c, v = _scalar_coo(m)
    pr = (r // 4) + (r % 4) * nv
    pc = (c // 4) + (c % 4) * nv
    _write_mtx_coo(path, 4 * nv, pr, pc, v)


def read_mtx(path: str):
    """Read MatrixMarket coordinate real general -> (n, rows, cols, vals) COO
    with 0-based indices, duplicates preserved."""
    with open(path, "r") as f:
        header = f.readline()
        if "coordinate" not in header:
            raise ValueError("only coordinate-format MatrixMarket supported")
        symmetric = "symmetric" in header
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        nr, nc, nnz = (int(t) for t in line.split())
        data = np.loadtxt(f, ndmin=2)
    rows = data[:, 0].astype(np.int64) - 1
    cols = data[:, 1].astype(np.int64) - 1
    vals = data[:, 2] if data.shape[1] > 2 else np.ones(len(rows))
    if symmetric:
        off = rows != cols
        r_extra, c_extra, v_extra = cols[off], rows[off], vals[off]
        rows = np.concatenate([rows, r_extra])
        cols = np.concatenate([cols, c_extra])
        vals = np.concatenate([vals, v_extra])
    return nr, rows, cols, vals


def save_bcsr_npz(path: str, m: BCSR4) -> None:
    """Binary matrix save — the PETSc-binary `save_matrix` analog
    (`src/solve_newton.c:46-51`)."""
    np.savez_compressed(
        path, indptr=m.indptr, indices=m.indices, values=np.asarray(m.values)
    )


def load_bcsr_npz(path: str, dtype=None) -> BCSR4:
    """Binary matrix load — the `MatLoad` analog (`src/main.c:58-68`)."""
    import jax.numpy as jnp

    with np.load(path) as d:
        values = jnp.asarray(
            d["values"] if dtype is None else d["values"].astype(dtype)
        )
        return BCSR4(indptr=d["indptr"], indices=d["indices"], values=values)


def coo_to_csr(n: int, rows, cols, vals):
    """COO -> CSR with duplicate summation — the `COO2CSR` equivalent
    (`mpk/utils.cpp:97-127`)."""
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    # merge duplicates
    keys = rows * n + cols
    uniq, first = np.unique(keys, return_index=True)
    summed = np.add.reduceat(vals, first)
    u_rows = (uniq // n).astype(np.int64)
    u_cols = (uniq % n).astype(np.int64)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, u_rows + 1, 1)
    indptr = np.cumsum(indptr)
    return indptr, u_cols, summed
