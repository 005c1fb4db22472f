"""ADMM QP solver (OSQP capability) tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nmpc_tpu.solver.admm import ADMMConfig, build_ltv_mpc_qp, qp_setup, qp_solve


def test_box_qp_matches_scipy():
    rng = np.random.default_rng(0)
    n, mrows = 12, 8
    M = rng.normal(size=(n, n))
    P = jnp.asarray(M @ M.T + np.eye(n), jnp.float32)
    q = jnp.asarray(rng.normal(size=n), jnp.float32)
    A = jnp.asarray(rng.normal(size=(mrows, n)), jnp.float32)
    l = jnp.asarray(-0.5 * np.ones(mrows), jnp.float32)
    u = jnp.asarray(0.5 * np.ones(mrows), jnp.float32)
    fac = qp_setup(P, A)
    x, y, iters, done, prim = jax.jit(qp_solve)(fac, q, l, u)
    assert bool(done)
    from scipy.optimize import minimize

    res = minimize(
        lambda z: 0.5 * z @ np.array(P) @ z + np.array(q) @ z,
        np.zeros(n),
        constraints=[
            {"type": "ineq", "fun": lambda z: np.array(u) - np.array(A) @ z},
            {"type": "ineq", "fun": lambda z: np.array(A) @ z - np.array(l)},
        ],
        method="SLSQP",
        options={"maxiter": 200, "ftol": 1e-12},
    )
    obj_admm = 0.5 * np.array(x) @ np.array(P) @ np.array(x) + np.array(q) @ np.array(x)
    assert abs(obj_admm - res.fun) / (1 + abs(res.fun)) < 1e-3
    assert float(prim) < 1e-3


def test_qp_batched_vmap():
    rng = np.random.default_rng(1)
    n, mrows, B = 6, 4, 16
    M = rng.normal(size=(n, n))
    P = jnp.asarray(M @ M.T + np.eye(n), jnp.float32)
    A = jnp.asarray(rng.normal(size=(mrows, n)), jnp.float32)
    fac = qp_setup(P, A)
    qs = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)
    ls = jnp.full((B, mrows), -1.0, jnp.float32)
    us = jnp.full((B, mrows), 1.0, jnp.float32)
    xs, ys, its, dones, prims = jax.jit(
        jax.vmap(functools.partial(qp_solve), in_axes=(None, 0, 0, 0))
    )(fac, qs, ls, us)
    assert xs.shape == (B, n)
    assert bool(jnp.all(dones))


def test_ltv_mpc_qp_reference_structure():
    # small double-integrator LTV MPC (the mpc_osqp_test.py pattern)
    Ts = 0.1
    Ad = jnp.array([[1.0, Ts], [0.0, 1.0]])
    Bd = jnp.array([[0.5 * Ts * Ts], [Ts]])
    Qd = jnp.diag(jnp.array([10.0, 1.0]))
    Rd = jnp.array([[0.1]])
    N = 20
    P, A, l, u, pack = build_ltv_mpc_qp(
        Ad, Bd, Qd, Rd, Qd, N,
        x_lo=jnp.array([-5.0, -2.0]), x_hi=jnp.array([5.0, 2.0]),
        u_lo=jnp.array([-1.0]), u_hi=jnp.array([1.0]),
    )
    fac = qp_setup(P, A, l=l, u=u)
    x_init = jnp.array([2.0, 0.0])
    l_k, u_k = pack(x_init)
    q = jnp.zeros(P.shape[0])
    z, y, iters, done, prim = jax.jit(
        functools.partial(qp_solve, cfg=ADMMConfig(max_iter=2000))
    )(fac, q, l_k, u_k)
    assert bool(done)
    nx = 2
    X = np.array(z[: (N + 1) * nx]).reshape(N + 1, nx)
    U = np.array(z[(N + 1) * nx :]).reshape(N, 1)
    # drives toward the origin, respects input box, dynamics hold
    np.testing.assert_allclose(X[0], [2.0, 0.0], atol=1e-2)
    assert abs(X[-1][0]) < 0.75 * 2.0
    assert np.abs(U).max() <= 1.0 + 1e-3
    np.testing.assert_allclose(
        X[1:], (np.array(Ad) @ X[:-1].T + np.array(Bd) @ U.T).T, atol=5e-3
    )


def test_siso_process_mpc_closed_loop():
    """mpc_test.py capability (SURVEY.md §2.2 #9): setpoint MPC on a SISO
    first-order-plus-gain process (odeint plant in the reference), here as the
    ADMM LTV-QP engine in closed loop against the exactly-discretized plant."""
    K_g, tau, Ts, N = 2.0, 1.5, 0.2, 25
    a = float(np.exp(-Ts / tau))
    Ad = jnp.array([[a]])
    Bd = jnp.array([[K_g * (1.0 - a)]])
    Qd = jnp.array([[5.0]])
    Rd = jnp.array([[0.1]])
    P, A, l, u, pack = build_ltv_mpc_qp(
        Ad, Bd, Qd, Rd, Qd, N,
        x_lo=jnp.array([-10.0]), x_hi=jnp.array([10.0]),
        u_lo=jnp.array([-1.5]), u_hi=jnp.array([1.5]),
    )
    fac = qp_setup(P, A, l=l, u=u)
    setpoint = 1.0
    # linear term: sum_k (x_k - r)' Q (x_k - r) -> q_x = -Q r per stage
    q = jnp.concatenate([jnp.full((N + 1,), -5.0 * setpoint), jnp.zeros(N)])
    step = jax.jit(functools.partial(qp_solve, cfg=ADMMConfig(max_iter=1500)))

    x = 0.0
    xs, us = [x], []
    for _ in range(40):
        l_k, u_k = pack(jnp.array([x]))
        z, y, iters, done, prim = step(fac, q, l_k, u_k)
        u0 = float(z[(N + 1) * 1])
        us.append(u0)
        x = a * x + K_g * (1.0 - a) * u0  # exact ZOH plant
        xs.append(x)
    xs = np.array(xs)
    # settles at the setpoint; steady-state input = r/K (0.5)
    assert abs(xs[-1] - setpoint) < 5e-2
    assert abs(us[-1] - setpoint / K_g) < 5e-2
    # respects input box throughout
    assert np.abs(np.array(us)).max() <= 1.5 + 1e-3


def test_qp_batched_entry_matches_per_element():
    """qp_setup_batched + qp_solve_batched (the fleet entry, VERDICT weak #8)
    must reproduce per-element qp_setup/qp_solve exactly, for both a shared
    and a per-element (LTV) factorization."""
    from nmpc_tpu.solver.admm import qp_setup_batched, qp_solve_batched

    rng = np.random.default_rng(2)
    n, mrows, B = 6, 9, 4
    M = rng.normal(size=(n, n))
    P = jnp.asarray(M @ M.T + np.eye(n), jnp.float32)
    A0 = jnp.asarray(rng.normal(size=(mrows, n)), jnp.float32)
    qs = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)
    ls = jnp.full((B, mrows), -1.0, jnp.float32)
    us = jnp.full((B, mrows), 1.0, jnp.float32)
    cfg = ADMMConfig(max_iter=500)

    # shared factorization
    fac = qp_setup(P, A0, cfg)
    xb, yb, itb, doneb, primb = jax.jit(
        functools.partial(qp_solve_batched, cfg=cfg))(fac, qs, ls, us)
    for i in range(B):
        xi, *_ = qp_solve(fac, qs[i], ls[i], us[i], cfg)
        np.testing.assert_allclose(np.array(xb[i]), np.array(xi), atol=1e-6)
    assert bool(jnp.all(doneb))

    # per-element (LTV-style) factorizations
    As = jnp.stack([A0 + 0.01 * i for i in range(B)])
    facb = jax.jit(functools.partial(qp_setup_batched, cfg=cfg))(
        P, As, l=ls, u=us)
    xb2, _, _, done2, prim2 = jax.jit(
        functools.partial(qp_solve_batched, cfg=cfg))(facb, qs, ls, us)
    for i in range(B):
        fi = qp_setup(P, As[i], cfg, l=ls[i], u=us[i])
        xi, *_ = qp_solve(fi, qs[i], ls[i], us[i], cfg)
        np.testing.assert_allclose(np.array(xb2[i]), np.array(xi), atol=1e-6)
    assert bool(jnp.all(done2))
