"""Solver parity and robustness tests (L3) — the SURVEY.md §4 strategy:
tolerance-match control sequences against an independent CPU oracle."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nmpc_tpu.ocp.problem import make_ocp
from nmpc_tpu.scenarios import get
from nmpc_tpu.solver.alilqr import ALILQRConfig, solve

from oracle import solve_oracle

TIGHT = ALILQRConfig(tol_cost=1e-9, n_inner=50, n_outer=20, tol_con=1e-5)


def jit_solve(cfg=TIGHT):
    return jax.jit(functools.partial(solve, cfg=cfg))


def test_single_robot_matches_oracle():
    # mpc_online_casadi.py config: T=0.01, N=50
    ocp = make_ocp(m=1, N=50, T=0.01, x0=[0, 0, 0], x_goal=[1.0, 1.5, 0.0])
    res = jit_solve()(ocp)
    U_o, X_o, cost_o = solve_oracle([0, 0, 0], [1.0, 1.5, 0.0], 50, 0.01)
    assert float(res.viol) < 1e-4
    # cost parity to 1e-4 relative, control parity at trajectory tolerance
    np.testing.assert_allclose(float(res.cost), cost_o, rtol=1e-4)
    np.testing.assert_allclose(np.array(res.U), U_o, atol=5e-3)


def test_control_bounds_respected():
    ocp = make_ocp(m=1, N=50, T=0.01, x0=[0, 0, 0], x_goal=[1.0, 1.5, 0.0])
    res = jit_solve()(ocp)
    U = np.array(res.U)
    assert U[:, 0].max() <= 0.22 + 1e-4
    assert np.abs(U[:, 1]).max() <= 2.84 + 1e-4
    # v bound is active at the start (robot far from goal)
    assert U[0, 0] > 0.2199


def test_two_robot_collision_constraint_active():
    # head-on swap where the crossing activates d_ij >= dmin^2
    m, N, T, dmin = 2, 30, 0.1, 0.3
    x0 = np.array([-0.4, 0, 0, 0.4, 0, np.pi])
    xs = np.array([0.5, 0, 0, -0.5, 0, np.pi])
    ocp = make_ocp(m=m, N=N, T=T, x0=x0, x_goal=xs, dmin=dmin, collision=True)
    res = jit_solve()(ocp)
    assert float(res.viol) < 1e-4
    X = np.array(res.X)
    d2 = (X[:N, 0] - X[:N, 3]) ** 2 + (X[:N, 1] - X[:N, 4]) ** 2
    # constraint grazes but holds at the crossing
    assert d2.min() >= dmin * dmin - 1e-3
    assert d2.min() <= (dmin + 0.05) ** 2  # active (robots actually cross nearby)


def test_solution_is_kkt_point_of_reference_nlp():
    """Polish test: seeding the oracle at our solution must not move it
    (our solution is a KKT point of the same NLP)."""
    m, N, T, dmin = 2, 30, 0.1, 0.3
    x0 = np.array([-0.4, 0, 0, 0.4, 0, np.pi])
    xs = np.array([0.5, 0, 0, -0.5, 0, np.pi])
    ocp = make_ocp(m=m, N=N, T=T, x0=x0, x_goal=xs, dmin=dmin, collision=True)
    res = jit_solve()(ocp)
    U_ours = np.array(res.U, dtype=float)
    U_pol, _, cost_pol = solve_oracle(x0, xs, N, T, dmin=dmin, U0=U_ours)
    # the polished optimum stays within trajectory tolerance of ours
    assert np.abs(U_pol - U_ours).max() < 5e-2
    assert abs(cost_pol - float(res.cost)) / (1 + cost_pol) < 1e-3


def test_warm_start_accelerates():
    ocp = make_ocp(m=2, N=30, T=0.1,
                   x0=[-0.4, 0, 0, 0.4, 0, np.pi],
                   x_goal=[0.5, 0, 0, -0.5, 0, np.pi],
                   dmin=0.3, collision=True)
    f = jit_solve()
    res1 = f(ocp)
    from nmpc_tpu.solver.alilqr import WarmStart

    warm = WarmStart(U=res1.U, lam=res1.lam, mu=res1.mu)
    res2 = f(ocp, warm)
    assert int(res2.inner_iters) <= max(3, int(res1.inner_iters) // 4)
    assert float(res2.viol) < 1e-4


def test_vmap_batch_of_scenarios():
    """Scenario batching: vmap over x0/x_goal leaves (the §2.4 data-parallel
    axis). All batch members must solve in one fused program."""
    base = make_ocp(m=1, N=20, T=0.1, x0=[0, 0, 0], x_goal=[1, 1, 0])
    B = 8
    key = jax.random.PRNGKey(0)
    goals = jax.random.uniform(key, (B, 3), minval=-1.5, maxval=1.5)
    import dataclasses

    def solve_one(goal):
        ocp = dataclasses.replace(base, xref=jnp.tile(goal[None, :], (base.N, 1)))
        return solve(ocp, cfg=TIGHT)

    res = jax.jit(jax.vmap(solve_one))(goals)
    assert res.U.shape == (B, 20, 2)
    assert float(jnp.max(res.viol)) < 1e-3
    # each batch member actually heads toward its own goal
    X_end = res.X[:, -1, :2]
    base_err = jnp.linalg.norm(goals[:, :2], axis=-1)
    end_err = jnp.linalg.norm(X_end - goals[:, :2], axis=-1)
    assert bool(jnp.all(end_err < base_err))


def test_infeasible_start_recovers():
    """Failure-handling (SURVEY.md §5.3): starting in violation, the solver
    must still return a usable (descending, bounded) plan and report viol."""
    ocp = make_ocp(m=2, N=20, T=0.1,
                   x0=[-0.05, 0, 0, 0.05, 0, np.pi],   # 0.1 apart < dmin
                   x_goal=[0.5, 0, 0, -0.5, 0, np.pi],
                   dmin=0.3, collision=True)
    res = jit_solve()(ocp)
    X = np.array(res.X)
    d = np.hypot(X[:, 0] - X[:, 3], X[:, 1] - X[:, 4])
    # robots separate over the horizon
    assert d[-1] > d[0]
    assert np.isfinite(float(res.cost))


def test_obstacle_avoidance_solve():
    sc = get("obstacle_scenario_1")
    ocp = sc.make(x_goal=jnp.asarray([1.5, 1.5, 0.0]))
    res = jit_solve()(ocp)
    assert float(res.viol) < 1e-3
    X = np.array(res.X)
    d = np.hypot(X[:-1, 0] - 0.4, X[:-1, 1] - 1.1)
    assert d.min() >= 0.15 + 0.15 + 0.05 - 1e-3


def test_assoc_scan_sweep_matches_sequential():
    """solve with the O(log N) associative-scan backward pass (sweep='scan')
    matches the sequential Riccati sweep on a long-horizon config."""
    import dataclasses as _dc
    import functools as _ft

    from nmpc_tpu.scenarios import get as _get

    ocp = _get("two_robot_swap").make(N=40)
    cfg_seq = ALILQRConfig(n_outer=8, n_inner=15, tol_con=1e-4)
    cfg_par = _dc.replace(cfg_seq, sweep="scan")
    r1 = jax.jit(_ft.partial(solve, cfg=cfg_seq))(ocp)
    r2 = jax.jit(_ft.partial(solve, cfg=cfg_par))(ocp)
    np.testing.assert_allclose(np.array(r2.cost), np.array(r1.cost), rtol=1e-3)
    np.testing.assert_allclose(np.array(r2.U), np.array(r1.U), atol=1e-2)
    assert bool(r2.converged)
