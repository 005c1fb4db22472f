"""Generic-dynamics hook: the AL-iLQR engine on non-unicycle models.

The reference's CasADi layer accepts *any* symbolic dynamics — the same
nlpsol machinery solves a Van der Pol OCP
(AllScripts/mpc_pose_control_casadi.py:25-33,66-108) and a first-order
process model (AllScripts/mpc_test.py:22-32,70-71). These tests validate
the equivalent capability: `make_generic_ocp(f, ...)` problems solved by
the nonlinear engine, checked against an independent float64 SLSQP oracle
on the identical (condensed) transcription.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from nmpc_tpu.ocp.problem import BIG, make_generic_ocp, total_cost
from nmpc_tpu.solver.alilqr import ALILQRConfig, solve

CFG = ALILQRConfig(n_outer=10, n_inner=40, tol_con=1e-5)


def _vdp(x, u):
    """Van der Pol RHS (mpc_pose_control_casadi.py:33):
    x1' = (1 - x2^2) x1 - x2 + u, x2' = x1."""
    x1, x2 = x[0], x[1]
    return jnp.stack([(1.0 - x2 * x2) * x1 - x2 + u[0], x1])


def _rollout_np(f_np, x0, U, dt, substeps):
    N = U.shape[0]
    X = np.zeros((N + 1, x0.shape[0]))
    X[0] = x0
    h = dt / substeps
    for k in range(N):
        x = X[k]
        for _ in range(substeps):
            k1 = f_np(x, U[k])
            k2 = f_np(x + 0.5 * h * k1, U[k])
            k3 = f_np(x + 0.5 * h * k2, U[k])
            k4 = f_np(x + h * k3, U[k])
            x = x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        X[k + 1] = x
    return X


def _oracle_generic(f_np, x0, xref, Q, R, N, dt, substeps, u_lo, u_hi,
                    x_lo=None, maxiter=400, n_starts=8, seed=0):
    """Condensed SLSQP oracle over the identical transcription: stage cost at
    X[0..N-1], state lower bound enforced at stages 1..N-1 (stage 0 is the
    pinned measurement, the terminal state is unconstrained — matching
    ocp.problem.trajectory_constraints / constraint_mask). Multi-start:
    SLSQP from z0 = 0 lands on infeasible local points of the nonconvex Van
    der Pol OCP; random restarts find the feasible optimum reliably."""
    nu = len(u_lo)

    def obj(z):
        U = z.reshape(N, nu)
        X = _rollout_np(f_np, x0, U, dt, substeps)
        c = 0.0
        for k in range(N):
            dx = X[k] - xref
            c += dx @ (Q * dx) + U[k] @ (R * U[k])
        return c

    cons = []
    if x_lo is not None:
        fin = np.isfinite(x_lo)  # -inf rows break SLSQP's finite differences

        def state_lb(z):
            U = z.reshape(N, nu)
            X = _rollout_np(f_np, x0, U, dt, substeps)
            return (X[1:N][:, fin] - x_lo[None, fin]).reshape(-1)

        cons.append({"type": "ineq", "fun": state_lb})

    rng = np.random.default_rng(seed)
    lo = np.array([b if np.isfinite(b) else -1.0 for b in u_lo])
    hi = np.array([b if np.isfinite(b) else 1.0 for b in u_hi])
    best = None
    for i in range(n_starts):
        z0 = (np.zeros(N * nu) if i == 0
              else rng.uniform(np.tile(lo, N), np.tile(hi, N)))
        res = minimize(
            obj, z0, method="SLSQP",
            bounds=list(zip(u_lo, u_hi)) * N, constraints=cons,
            options={"maxiter": maxiter, "ftol": 1e-14},
        )
        viol = 0.0 if not cons else max(0.0, -cons[0]["fun"](res.x).min())
        if viol < 1e-6 and (best is None or res.fun < best[1]):
            best = (res.x, res.fun)
    assert best is not None, "oracle found no feasible point"
    U = best[0].reshape(N, nu)
    return U, _rollout_np(f_np, x0, U, dt, substeps), best[1]


def test_van_der_pol_matches_oracle():
    """The reference demo's problem data: N=20 intervals of dt=0.5 with 4 RK4
    substeps, x0=(0,1), u in [-1,1], path bound x1 >= -0.25, L = x1^2 + x2^2
    + u^2 (mpc_pose_control_casadi.py:21-33,77-101)."""
    N, dt, sub = 20, 0.5, 4
    ocp = make_generic_ocp(
        _vdp, nx=2, nu=1, N=N, T=dt, x0=[0.0, 1.0], x_goal=[0.0, 0.0],
        u_lo=[-1.0], u_hi=[1.0], x_lo=[-0.25, -BIG],
        integrator="rk4", substeps=sub,
    )
    r = jax.jit(functools.partial(solve, cfg=CFG))(ocp)
    assert bool(r.converged)
    assert float(r.viol) < 1e-4

    f_np = lambda x, u: np.array(
        [(1.0 - x[1] ** 2) * x[0] - x[1] + u[0], x[0]]
    )
    U_o, X_o, cost_o = _oracle_generic(
        f_np, np.array([0.0, 1.0]), np.zeros(2), np.ones(2), np.ones(1),
        N, dt, sub, [-1.0], [1.0], x_lo=np.array([-0.25, -np.inf]),
    )
    # engine finds the oracle's optimum (or better) on this nonconvex OCP
    assert float(r.cost) <= cost_o * (1.0 + 2e-3)
    np.testing.assert_allclose(np.asarray(r.U), U_o, atol=5e-2)
    # the x1 >= -0.25 bound is genuinely active at the optimum: the
    # unconstrained Van der Pol swing dips x1 below it
    assert np.min(np.asarray(r.X)[1:N, 0]) >= -0.25 - 1e-4
    assert np.min(np.asarray(r.X)[1:N, 0]) < -0.2


def test_van_der_pol_bound_active_vs_unbounded():
    """Dropping the x1 bound lowers the optimal cost — evidence the generic
    state box is actually shaping the solution, not vacuously satisfied."""
    N, dt, sub = 20, 0.5, 4
    kw = dict(nx=2, nu=1, N=N, T=dt, x0=[0.0, 1.0], x_goal=[0.0, 0.0],
              u_lo=[-1.0], u_hi=[1.0], integrator="rk4", substeps=sub)
    bounded = make_generic_ocp(_vdp, x_lo=[-0.25, -BIG], **kw)
    free = make_generic_ocp(_vdp, **kw)
    rb = jax.jit(functools.partial(solve, cfg=CFG))(bounded)
    rf = jax.jit(functools.partial(solve, cfg=CFG))(free)
    assert float(rf.cost) < float(rb.cost) - 1e-3


def test_siso_process_on_nonlinear_engine():
    """First-order process dydt = (-y + K u)/tau with the tutorial's K=3,
    tau=5 (mpc_test.py:22-32,70-71), solved by the AL-iLQR engine through the
    generic hook; the setpoint step must be tracked and the solve must match
    the f64 oracle."""
    K, tau = 3.0, 5.0

    def proc(x, u):
        return (-x + K * u) / tau

    N, dt = 30, 0.5
    sp = 10.0
    ocp = make_generic_ocp(
        proc, nx=1, nu=1, N=N, T=dt, x0=[0.0], x_goal=[sp],
        Qdiag=[1.0], Rdiag=[0.01], u_lo=[0.0], u_hi=[5.0],
        integrator="euler",
    )
    r = jax.jit(functools.partial(solve, cfg=CFG))(ocp)
    assert bool(r.converged)
    # the output crosses into the setpoint region over the horizon (no
    # terminal cost, so the very last stages coast — same as the oracle)
    assert float(jnp.max(r.X[:, 0])) > 0.85 * sp

    f_np = lambda x, u: (-x + K * u) / tau

    def _euler_oracle():
        def obj(z):
            U = z.reshape(N, 1)
            X = np.zeros((N + 1, 1))
            for k in range(N):
                X[k + 1] = X[k] + dt * f_np(X[k], U[k])
            c = 0.0
            for k in range(N):
                c += (X[k, 0] - sp) ** 2 + 0.01 * U[k, 0] ** 2
            return c

        res = minimize(obj, np.zeros(N), method="SLSQP",
                       bounds=[(0.0, 5.0)] * N,
                       options={"maxiter": 300, "ftol": 1e-14})
        return res.x.reshape(N, 1), res.fun

    U_o, cost_o = _euler_oracle()
    assert abs(float(r.cost) - cost_o) <= 1e-3 * (1.0 + abs(cost_o))
    np.testing.assert_allclose(np.asarray(r.U), U_o, atol=2e-2)


def test_generic_closed_loop_driver():
    """The MPC driver closes the loop on a generic model too: the SISO
    process tracks a setpoint through the receding-horizon machinery
    (shift warm starts, plant = the model itself)."""
    from nmpc_tpu.mpc.driver import MPCConfig
    from nmpc_tpu.sim.plant import plant_step

    K, tau = 3.0, 5.0

    def proc(x, u):
        return (-x + K * u) / tau

    N, dt, sp = 10, 0.5, 10.0
    ocp = make_generic_ocp(
        proc, nx=1, nu=1, N=N, T=dt, x0=[0.0], x_goal=[sp],
        Qdiag=[1.0], Rdiag=[0.01], u_lo=[0.0], u_hi=[5.0],
        integrator="euler",
    )
    # hand-rolled receding-horizon loop (the driver's plant is the unicycle;
    # generic models integrate their own dyn_fn)
    from nmpc_tpu.mpc.driver import shift_warm
    from nmpc_tpu.ocp.problem import step_dynamics
    import dataclasses

    w = None
    x = ocp.x0
    cfg = ALILQRConfig(n_outer=4, n_inner=15, tol_con=1e-4)
    for _ in range(25):
        res = jax.jit(functools.partial(solve, cfg=cfg))(
            dataclasses.replace(ocp, x0=x)
        )
        x = step_dynamics(dataclasses.replace(ocp, x0=x), x, res.U[0])
        w = shift_warm(res, cfg)
    assert abs(float(x[0]) - sp) < 0.3
