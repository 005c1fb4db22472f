"""Dynamics-model unit tests (L0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmpc_tpu.models.unicycle import (
    discrete_dynamics,
    euler_jacobians,
    euler_step,
    rk4_step,
    stacked_unicycle_rhs,
    unicycle_rhs,
)


def test_unicycle_rhs_matches_reference_equations():
    # rhs = [v cos th, v sin th, w] (mpc_online_casadi.py:69)
    x = jnp.array([0.3, -0.2, 0.7])
    u = jnp.array([0.15, -1.2])
    out = unicycle_rhs(x, u)
    np.testing.assert_allclose(
        out, [0.15 * np.cos(0.7), 0.15 * np.sin(0.7), -1.2], rtol=1e-6
    )


def test_stacked_rhs_is_blockwise():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (9,))
    u = jax.random.normal(key, (6,))
    full = stacked_unicycle_rhs(x, u)
    for i in range(3):
        np.testing.assert_allclose(
            full[3 * i : 3 * i + 3], unicycle_rhs(x[3 * i : 3 * i + 3], u[2 * i : 2 * i + 2]),
            rtol=1e-6,
        )


def test_euler_step_explicit():
    x = jnp.array([1.0, 2.0, 0.5])
    u = jnp.array([0.2, 0.3])
    np.testing.assert_allclose(
        euler_step(x, u, 0.1), x + 0.1 * unicycle_rhs(x, u), rtol=1e-6
    )


def test_rk4_more_accurate_than_euler():
    x = jnp.array([0.0, 0.0, 0.0])
    u = jnp.array([0.2, 2.0])
    dt = 0.5
    # exact unicycle arc solution for constant (v, w)
    v, w = 0.2, 2.0
    exact = jnp.array([v / w * np.sin(w * dt), v / w * (1 - np.cos(w * dt)), w * dt])
    err_euler = jnp.linalg.norm(euler_step(x, u, dt) - exact)
    err_rk4 = jnp.linalg.norm(rk4_step(x, u, dt) - exact)
    assert err_rk4 < err_euler / 50


@pytest.mark.parametrize("m", [1, 2, 6])
def test_analytic_jacobians_match_ad(m):
    key = jax.random.PRNGKey(m)
    x = jax.random.normal(key, (3 * m,))
    u = jax.random.normal(jax.random.PRNGKey(m + 1), (2 * m,))
    dt = 0.2
    A, B = euler_jacobians(x, u, dt)
    A_ad = jax.jacfwd(lambda xx: discrete_dynamics(xx, u, dt, "euler"))(x)
    B_ad = jax.jacfwd(lambda uu: discrete_dynamics(x, uu, dt, "euler"))(u)
    np.testing.assert_allclose(A, A_ad, atol=1e-6)
    np.testing.assert_allclose(B, B_ad, atol=1e-6)


def test_se2_roundtrip():
    from nmpc_tpu.sim.frames import se2_global_to_local, se2_local_to_global

    origin = jnp.array([1.0, -2.0, 0.7])
    pose = jnp.array([0.3, 0.5, 1.2])
    glob = se2_local_to_global(pose, origin)
    back = se2_global_to_local(glob, origin)
    np.testing.assert_allclose(back, pose, atol=1e-6)
