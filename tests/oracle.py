"""CPU oracle for solver-parity tests.

The reference solves its NLPs with CasADi+IPOPT (not available in this image);
scipy's SLSQP — the solver of the reference's own family-A scripts
(mpc_control_pose_py.py:130) — plays the oracle role on the *condensed* form
(states eliminated by the exact Euler rollout), which shares its optima with
the multiple-shooting form. Pure NumPy, float64, fully independent of the JAX
engine under test.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import minimize


def rollout_np(x0, U, T):
    m = x0.shape[0] // 3
    N = U.shape[0]
    X = np.zeros((N + 1, 3 * m))
    X[0] = x0
    for k in range(N):
        x = X[k]
        rhs = np.zeros(3 * m)
        for i in range(m):
            v, w = U[k, 2 * i], U[k, 2 * i + 1]
            th = x[3 * i + 2]
            rhs[3 * i : 3 * i + 3] = [v * np.cos(th), v * np.sin(th), w]
        X[k + 1] = x + T * rhs
    return X


def solve_oracle(
    x0,
    xs,
    N,
    T,
    dmin=0.0,
    v_max=0.22,
    omega_max=2.84,
    U0=None,
    maxiter=500,
):
    """Condensed SLSQP solve of the reference OCP. Returns (U, X, cost)."""
    x0 = np.asarray(x0, float)
    xs = np.asarray(xs, float)
    m = x0.shape[0] // 3
    Q = np.diag([1.0, 5.0, 0.1] * m)
    R = np.diag([0.5, 0.05] * m)

    def obj(z):
        U = z.reshape(N, 2 * m)
        X = rollout_np(x0, U, T)
        c = 0.0
        for k in range(N):
            dx = X[k] - xs
            c += dx @ Q @ dx + U[k] @ R @ U[k]
        return c

    cons = []
    if dmin > 0 and m > 1:
        pairs = [(i, j) for i in range(m) for j in range(i + 1, m)]

        def coll(z):
            U = z.reshape(N, 2 * m)
            X = rollout_np(x0, U, T)
            rows = []
            for k in range(N):
                for (i, j) in pairs:
                    d2 = (X[k, 3 * i] - X[k, 3 * j]) ** 2 + (
                        X[k, 3 * i + 1] - X[k, 3 * j + 1]
                    ) ** 2
                    rows.append(d2 - dmin * dmin)
            return np.array(rows)

        cons.append({"type": "ineq", "fun": coll})

    z0 = np.zeros(2 * m * N) if U0 is None else np.asarray(U0, float).reshape(-1)
    res = minimize(
        obj,
        z0,
        method="SLSQP",
        bounds=[(-v_max, v_max), (-omega_max, omega_max)] * m * N,
        constraints=cons,
        options={"maxiter": maxiter, "ftol": 1e-12},
    )
    U = res.x.reshape(N, 2 * m)
    return U, rollout_np(x0, U, T), res.fun
