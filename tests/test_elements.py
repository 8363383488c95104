"""Element integration vs golden values from the reference `integration.c`."""

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.fem import elements as el


@pytest.mark.parametrize("case", ["unit", "skew"])
def test_geometry(golden_elements, golden_inputs, case):
    g = golden_elements[case]
    a = jnp.asarray(golden_inputs[case]["a"])
    np.testing.assert_allclose(el.tet_volume(a), g["vol"], rtol=1e-14)
    np.testing.assert_allclose(el.tet_gradients(a), g["grad"], rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(el.tet_diameter(a), g["h"], rtol=1e-14)


@pytest.mark.parametrize("case", ["unit", "skew"])
def test_mass(golden_elements, golden_inputs, case):
    g = golden_elements[case]
    a = jnp.asarray(golden_inputs[case]["a"])
    vol = el.tet_volume(a)
    np.testing.assert_allclose(el.mass_matrix(vol), g["M"], rtol=1e-14, atol=1e-18)


@pytest.mark.parametrize("case", ["unit", "skew"])
def test_diffusion(golden_elements, golden_inputs, case):
    g = golden_elements[case]
    inp = golden_inputs[case]
    a = jnp.asarray(inp["a"])
    vol = el.tet_volume(a)
    grad = el.tet_gradients(a)
    A0 = el.diffusion_matrix(grad, vol, inp["Re"])
    np.testing.assert_allclose(A0, g["A0"], rtol=1e-12, atol=1e-15)
    # symmetry
    np.testing.assert_allclose(A0, A0.T, rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("case", ["unit", "skew"])
def test_convection(golden_elements, golden_inputs, case):
    g = golden_elements[case]
    inp = golden_inputs[case]
    a = jnp.asarray(inp["a"])
    U = jnp.asarray(inp["U"])
    vol = el.tet_volume(a)
    grad = el.tet_gradients(a)
    np.testing.assert_allclose(
        el.convection_matrix_linearized(U, grad, vol), g["A1"], rtol=1e-12, atol=1e-15
    )
    np.testing.assert_allclose(
        el.convection_matrix_nonlinear(U, grad, vol), g["A2"], rtol=1e-12, atol=1e-15
    )


@pytest.mark.parametrize("case", ["unit", "skew"])
def test_divergence_and_stabilization(golden_elements, golden_inputs, case):
    g = golden_elements[case]
    inp = golden_inputs[case]
    a = jnp.asarray(inp["a"])
    vol = el.tet_volume(a)
    grad = el.tet_gradients(a)
    h = el.tet_diameter(a)
    np.testing.assert_allclose(
        el.divergence_matrix(grad, vol), g["B"], rtol=1e-12, atol=1e-16
    )
    np.testing.assert_allclose(
        el.pressure_stabilization_matrix(grad, vol, h, inp["delta"]),
        g["D"],
        rtol=1e-12,
        atol=1e-16,
    )


def test_rigid_motion_nullspace(golden_inputs):
    """Constant velocity and rigid rotation have zero strain -> A0 u = 0."""
    a = jnp.asarray(golden_inputs["skew"]["a"])
    vol = el.tet_volume(a)
    grad = el.tet_gradients(a)
    A0 = el.diffusion_matrix(grad, vol, 1.0)

    const = jnp.tile(jnp.asarray([1.0, -2.0, 0.5]), 4)
    np.testing.assert_allclose(A0 @ const, 0.0, atol=1e-13)

    omega = np.array([0.3, -0.7, 1.1])
    rot = np.concatenate([np.cross(omega, np.asarray(a)[i]) for i in range(4)])
    np.testing.assert_allclose(A0 @ jnp.asarray(rot), 0.0, atol=1e-12)


def test_gradients_sum_zero(golden_inputs):
    a = jnp.asarray(golden_inputs["skew"]["a"])
    np.testing.assert_allclose(el.tet_gradients(a).sum(axis=0), 0.0, atol=1e-14)


@pytest.mark.parametrize("case", ["unit", "skew"])
def test_element_residual_matches_matrices(golden_elements, golden_inputs, case):
    """Direct-contraction residual == matrix-based residual (two code paths)."""
    g = golden_elements[case]
    inp = golden_inputs[case]
    a = jnp.asarray(inp["a"])
    vol = el.tet_volume(a)
    grad = el.tet_gradients(a)
    h = el.tet_diameter(a)
    dt = 0.01
    Re, delta = inp["Re"], inp["delta"]

    rng = np.random.default_rng(0)
    UL = jnp.asarray(inp["U"])
    UL_old = jnp.asarray(rng.standard_normal((3, 4)))
    PL = jnp.asarray(rng.standard_normal(4))

    F_v, F_p = el.element_residual(grad, vol, h, UL, UL_old, PL, dt, Re, delta)

    # Matrix-based: flatten u with u[3j+c] = U[c, j]
    u = np.asarray(UL).T.reshape(12)
    u_old = np.asarray(UL_old).T.reshape(12)
    p = np.asarray(PL)
    M, A0, A1, A2, B, D = (
        np.asarray(g["M"]), np.asarray(g["A0"]), np.asarray(g["A1"]),
        np.asarray(g["A2"]), np.asarray(g["B"]), np.asarray(g["D"]),
    )
    Fv_ref = (A0 + M / dt) @ u - (M / dt) @ u_old + (A1 + A2) @ u + B.T @ p
    Fp_ref = -B @ u + D @ p

    np.testing.assert_allclose(
        np.asarray(F_v).reshape(4, 3).reshape(-1), Fv_ref, rtol=1e-11, atol=1e-13
    )
    np.testing.assert_allclose(np.asarray(F_p), Fp_ref, rtol=1e-11, atol=1e-13)


@pytest.mark.parametrize("case", ["unit", "skew"])
def test_element_node_blocks(golden_elements, golden_inputs, case):
    """Packed 4x4 node blocks == the reference's blocked Jacobian layout."""
    g = golden_elements[case]
    inp = golden_inputs[case]
    a = jnp.asarray(inp["a"])
    vol = el.tet_volume(a)
    grad = el.tet_gradients(a)
    h = el.tet_diameter(a)
    dt = 0.01
    Re, delta = inp["Re"], inp["delta"]
    UL = jnp.asarray(inp["U"])

    terms = frozenset({"mass_dt", "diffusion", "convection"})
    blocks = el.element_node_blocks(grad, vol, h, UL, dt, Re, delta, terms=terms)

    M, A0, A1, A2, B, D = (
        np.asarray(g["M"]), np.asarray(g["A0"]), np.asarray(g["A1"]),
        np.asarray(g["A2"]), np.asarray(g["B"]), np.asarray(g["D"]),
    )
    vv = A0 + M / dt + A1 + A2
    for i in range(4):
        for j in range(4):
            expected = np.zeros((4, 4))
            expected[:3, :3] = vv[3 * i : 3 * i + 3, 3 * j : 3 * j + 3]
            expected[:3, 3] = B[j, 3 * i : 3 * i + 3]
            expected[3, :3] = -B[i, 3 * j : 3 * j + 3]
            expected[3, 3] = D[i, j]
            np.testing.assert_allclose(
                blocks[i, j], expected, rtol=1e-11, atol=1e-13,
                err_msg=f"block ({i},{j})",
            )


@pytest.mark.parametrize("case", ["unit", "skew"])
def test_convection_cancellation_quirk(golden_inputs, case):
    """Reference quirk (preserved for parity): (A1(u) + A2(u)) u == 0.

    A2 (`convection_matrix2`, `src/integration.c:190-209`) is the exact
    algebraic negation of A1's action on the linearization point itself, so
    convection cancels out of the residual (`src/solve_newton.c:331-335`) and
    enters the solve only through the iteration matrix (A1 + A2 + A1_jac +
    A2_jac in the Jacobian).  The golden `res/` corpus was generated with this
    behavior, so we reproduce it rather than "fix" it.
    """
    inp = golden_inputs[case]
    a = jnp.asarray(inp["a"])
    vol = el.tet_volume(a)
    grad = el.tet_gradients(a)
    UL = jnp.asarray(inp["U"])
    u_flat = jnp.asarray(np.asarray(UL).T.reshape(12))
    A1c = el.convection_matrix_linearized(UL, grad, vol)
    A2c = el.convection_matrix_nonlinear(UL, grad, vol)
    np.testing.assert_allclose((A1c + A2c) @ u_flat, 0.0, atol=1e-13)
    # ...but (A1 + A2) v != 0 for generic v — the cancellation is only at u.
    v = jnp.asarray(np.random.default_rng(1).standard_normal(12))
    assert np.linalg.norm((A1c + A2c) @ v) > 1e-3
