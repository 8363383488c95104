"""Test configuration: force CPU with 8 virtual devices and enable float64.

Tests validate numerics in float64 on the CPU backend (the reference is all
double precision); TPU performance runs use float32 via bench.py.  The 8
virtual devices let multi-chip sharding tests run without TPU hardware.
"""

import os

# Force CPU even when the ambient environment pins JAX_PLATFORMS=axon (TPU):
# tests need float64, host callbacks, and 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize imports jax before conftest runs, so the env var alone is not
# enough — set the config directly (backends are not yet initialized).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def golden_elements():
    """Golden element matrices generated from the reference `integration.c`."""
    path = os.path.join(os.path.dirname(__file__), "data_golden_elements.py")
    with open(path) as f:
        text = f.read()
    cases = {}
    chunks = text.split('case = ')[1:]
    for chunk in chunks:
        ns = {}
        exec("case = " + chunk, {}, ns)  # noqa: S102 - trusted generated data
        name = ns.pop("case")
        shapes = {
            "grad": (4, 3), "M": (12, 12), "A0": (12, 12), "A1": (12, 12),
            "A2": (12, 12), "B": (4, 12), "D": (4, 4),
        }
        parsed = {}
        for k, v in ns.items():
            arr = np.asarray(v, dtype=np.float64)
            parsed[k] = arr.reshape(shapes[k]) if k in shapes else float(arr)
        cases[name] = parsed
    return cases


# Inputs used when generating the golden data (must match /tmp/golden_driver.c)
GOLDEN_INPUTS = {
    "unit": dict(
        a=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float64),
        U=np.array([[1, 2, 3, 4], [0, -1, 0.5, 2], [-2, 1, 0, -1]], dtype=np.float64),
        Re=1.0,
        delta=0.1,
    ),
    "skew": dict(
        a=np.array(
            [[0.1, 0.2, -0.3], [1.3, 0.1, 0.2], [-0.2, 1.1, 0.4], [0.3, -0.1, 1.7]],
            dtype=np.float64,
        ),
        U=np.array(
            [[0.3, -1.2, 2.1, 0.7], [1.5, 0.4, -0.6, 0.9], [-0.8, 0.2, 1.3, -0.5]],
            dtype=np.float64,
        ),
        Re=300.0,
        delta=0.05,
    ),
}


@pytest.fixture()
def golden_inputs():
    return GOLDEN_INPUTS
