"""OCP construction tests (L2): costs, constraints, transcription parity."""

import jax.numpy as jnp
import numpy as np

from nmpc_tpu.ocp import problem as P
from nmpc_tpu.ocp.problem import pair_indices
from nmpc_tpu.scenarios import REGISTRY, get


def test_pair_ordering_matches_reference():
    # d12, d13, ..., d1m, d23, ... (six-robot file :218-236)
    ii, jj = pair_indices(4)
    assert list(zip(ii, jj)) == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def test_pairwise_distances():
    ocp = get("six_robot_antipodal").make()
    x = ocp.x0
    d2 = P.pairwise_sq_distances(ocp, x)
    assert d2.shape == (15,)
    pos = np.array(x).reshape(6, 3)[:, :2]
    expect = []
    for i in range(6):
        for j in range(i + 1, 6):
            expect.append(np.sum((pos[i] - pos[j]) ** 2))
    np.testing.assert_allclose(d2, expect, rtol=1e-5)


def test_stage_cost_matches_reference_quadratic():
    # (x-xs)'Q(x-xs) + u'Ru with Q=diag(1,5,0.1), R=diag(0.5,0.05) per robot
    ocp = get("single_robot").make()
    x = jnp.array([0.3, -0.4, 0.2])
    u = jnp.array([0.1, -0.5])
    ref = ocp.xref[0]
    dx = np.array(x - ref)
    expect = dx @ np.diag([1, 5, 0.1]) @ dx + np.array(u) @ np.diag([0.5, 0.05]) @ np.array(u)
    np.testing.assert_allclose(P.stage_cost(ocp, x, u, ref), expect, rtol=1e-5)


def test_constraint_stack_shape_and_feasibility_sign():
    sc = get("six_robot_antipodal")
    ocp = sc.make()
    # n_con = pairs + m*n_obs + 2nu + 2nx
    assert ocp.n_con == 15 + 0 + 2 * 12 + 2 * 18
    c = P.stage_constraints(ocp, ocp.x0, jnp.zeros((ocp.nu,)))
    # start poses are mutually feasible -> all c >= 0
    assert float(jnp.min(c)) >= 0.0
    # violated when two robots are closer than dmin
    x_bad = ocp.x0.at[0].set(ocp.x0[3]).at[1].set(ocp.x0[4])
    c_bad = P.stage_constraints(ocp, x_bad, jnp.zeros((ocp.nu,)))
    assert float(jnp.min(c_bad)) < 0.0


def test_obstacle_constraint_value():
    ocp = get("obstacle_scenario_1").make()
    # c = dist - r_rob - r_obs - margin (first_scenario_mpc_obstacle_avoidance.py:125,150)
    c = P.stage_constraints(ocp, jnp.zeros((3,)), jnp.zeros((2,)))
    d = np.hypot(0.4, 1.1)
    np.testing.assert_allclose(c[0], d - 0.15 - 0.15 - 0.05, rtol=1e-5)


def test_rollout_satisfies_dynamics():
    ocp = get("single_robot").make()
    U = 0.1 * jnp.ones((ocp.N, ocp.nu))
    X = P.rollout(ocp, U)
    assert X.shape == (ocp.N + 1, 3)
    for k in [0, 10, 49]:
        np.testing.assert_allclose(
            X[k + 1], X[k] + ocp.T * np.array([
                U[k, 0] * np.cos(X[k, 2]), U[k, 0] * np.sin(X[k, 2]), U[k, 1]]),
            rtol=1e-5, atol=1e-7,
        )


def test_al_penalty_inactive_is_zero():
    c = jnp.array([0.5, 1.0])
    lam = jnp.zeros(2)
    assert float(P.al_penalty(c, lam, 10.0)) == 0.0
    # violated constraint is penalized
    assert float(P.al_penalty(jnp.array([-0.1]), jnp.zeros(1), 10.0)) > 0.0


def test_registry_complete():
    # every reference family is represented (SURVEY.md §2.2)
    fams = {s.family for s in REGISTRY.values()}
    assert {"A", "C", "D", "E", "F", "G", "H", "I"} <= fams
    # all §6 problem sizes present
    for name in [
        "single_robot", "tb3_1", "two_robot_swap", "five_robot",
        "six_robot_antipodal", "eight_robot", "ten_robot", "lidar_v4",
    ]:
        assert name in REGISTRY
    # every scenario builds
    for s in REGISTRY.values():
        ocp = s.make()
        assert ocp.x0.shape == (ocp.nx,)


def test_lidar_augmented_dynamics():
    ocp = get("lidar_v4").make(
        p_obs=jnp.array([[1.0, 0.0]] * 10),
        x0=jnp.concatenate([jnp.zeros(3), jnp.full((10,), 1.0)]),
    )
    x = ocp.x0
    u = jnp.array([0.1, 0.0])
    xn = P.step_dynamics(ocp, x, u)
    # pose advances by euler; ray distance is 1-norm to frozen p_obs
    np.testing.assert_allclose(xn[:3], [0.1 * ocp.T, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(xn[3], 1.0 - 0.1 * float(ocp.T), rtol=1e-5)


def test_analytic_constraint_jacobians_match_ad():
    import jax

    from nmpc_tpu.ocp.jacobians import stage_constraint_jacobians

    cases = [
        get("six_robot_antipodal").make(),                      # pairs + boxes
        get("obstacle_scenario_2").make(),                      # obstacles
    ]
    # moving-obstacle template
    from nmpc_tpu.parallel.decentralized import robot_template

    cases.append(robot_template(10, 0.1, 0.3, 4))
    key = jax.random.PRNGKey(0)
    for ocp in cases:
        for s in range(3):
            key, k1, k2 = jax.random.split(key, 3)
            x = ocp.x0 + 0.5 * jax.random.normal(k1, (ocp.nx,), ocp.x0.dtype)
            u = 0.1 * jax.random.normal(k2, (ocp.nu,), ocp.x0.dtype)
            mov = ocp.mov_obs[0] if ocp.n_mov else None
            Jx, Ju = stage_constraint_jacobians(ocp, x, mov)
            Jx_ad = jax.jacfwd(lambda xx: P.stage_constraints(ocp, xx, u, mov))(x)
            Ju_ad = jax.jacfwd(lambda uu: P.stage_constraints(ocp, x, uu, mov))(u)
            np.testing.assert_allclose(np.asarray(Jx), np.asarray(Jx_ad), atol=1e-5)
            np.testing.assert_allclose(np.asarray(Ju), np.asarray(Ju_ad), atol=1e-6)
