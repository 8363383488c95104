"""End-to-end CLI tests (subprocess, CPU)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=300):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m"] + args,
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )


@pytest.mark.slow
def test_run_cli_transient(tmp_path):
    out_dir = str(tmp_path / "res")
    r = run_cli([
        "navierstokes_tpu.run", "--nx", "3", "--ny", "2", "--nz", "2",
        "--steps", "1", "--dt", "0.01", "--re", "50", "--cpu",
        "--save", "--save-dir", out_dir, "--vtu",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Matrix size : " in r.stdout
    assert "Solving Stokes system..." in r.stdout
    assert "Total time:" in r.stdout
    assert os.path.exists(os.path.join(out_dir, "solution_step0001.dat"))
    assert os.path.exists(os.path.join(out_dir, "solution_0001.vtu"))

    from navierstokes_tpu.io.dat import read_petsc_vec

    vals = read_petsc_vec(os.path.join(out_dir, "solution_step0001.dat"))
    assert np.all(np.isfinite(vals)) and len(vals) == 4 * 3 * 3 * 4


@pytest.mark.slow
def test_run_cli_perf_knobs(tmp_path):
    """The `-matmult_variant`/`-avx2` analog: every perf knob is a flag."""
    r = run_cli([
        "navierstokes_tpu.run", "--nx", "3", "--ny", "2", "--nz", "2",
        "--steps", "1", "--dt", "0.01", "--re", "50", "--cpu",
        "--preconditioner", "two_level", "--coarse-agg", "4",
        "--coarse-ml-smooth", "2", "--coarse-ml-cycles", "1",
        "--spmv", "xla", "--neumann-order", "0", "--restart", "20",
        "--ca-gmres",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Total time:" in r.stdout


@pytest.mark.slow
def test_run_cli_coarse_basis_linear(tmp_path):
    """--coarse-basis linear drives the per-aggregate linear coarse space
    end-to-end (requires the plane layout + dense coarse)."""
    r = run_cli([
        "navierstokes_tpu.run", "--nx", "3", "--ny", "2", "--nz", "2",
        "--steps", "1", "--dt", "0.01", "--re", "50", "--cpu",
        "--preconditioner", "two_level", "--coarse-agg", "8",
        "--coarse-basis", "linear", "--spmv", "plane",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Total time:" in r.stdout


@pytest.mark.slow
def test_create_mat_cli(tmp_path):
    out_dir = str(tmp_path / "mat")
    r = run_cli([
        "navierstokes_tpu.bench.create_mat", "--matrix-id", "1",
        "--out", out_dir,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out_dir, "matrix1_baij4.mtx"))
    assert os.path.exists(os.path.join(out_dir, "matrix1_baij4.npz"))
