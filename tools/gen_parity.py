"""Generate docs/PARITY.md: open-loop solver parity vs the scipy oracle.

For each reference configuration family we solve the same multiple-shooting
NLP with (a) the TPU engine (AL-iLQR) and (b) the condensed SLSQP oracle
(tests/oracle.py — the reference's own family-A solver, float64, independent
code path), then report cost parity, constraint satisfaction, and the
KKT-polish distance (how far SLSQP moves when seeded at our solution; small
distance = our solution is a KKT point of the reference NLP).

Run: python tools/gen_parity.py   (CPU, a few minutes)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from nmpc_tpu.scenarios import get
from nmpc_tpu.solver.alilqr import ALILQRConfig, solve
from oracle import solve_oracle

TIGHT = ALILQRConfig(tol_cost=1e-9, n_inner=60, n_outer=20, tol_con=1e-5)

# (scenario, horizon override for oracle tractability)
CASES = [
    ("single_robot", None),
    ("tb3_2", 60),
    ("two_robot_swap", 40),
    ("two_robot_centralized", None),
    ("five_robot", 25),
    ("six_robot_antipodal", 20),
    ("eight_robot", None),
    ("ten_robot", 12),
]


def main():
    rows = []
    for name, N_over in CASES:
        sc = get(name)
        ocp = sc.make() if N_over is None else sc.make(N=N_over)
        t0 = time.time()
        res = jax.jit(functools.partial(solve, cfg=TIGHT))(ocp)
        res.X.block_until_ready()
        t_ours = time.time() - t0
        x0 = np.array(ocp.x0, float)
        xs = np.array(ocp.xref[-1], float)
        t0 = time.time()
        U_o, X_o, cost_o = solve_oracle(
            x0, xs, ocp.N, float(ocp.T),
            dmin=float(np.sqrt(float(ocp.dmin2))) if sc.collision else 0.0,
            v_max=sc.v_max, omega_max=sc.omega_max, maxiter=300,
        )
        t_orc = time.time() - t0
        # polish: oracle seeded at our solution
        U_ours = np.array(res.U, float)
        U_p, _, cost_p = solve_oracle(
            x0, xs, ocp.N, float(ocp.T),
            dmin=float(np.sqrt(float(ocp.dmin2))) if sc.collision else 0.0,
            v_max=sc.v_max, omega_max=sc.omega_max, U0=U_ours, maxiter=300,
        )
        polish = np.abs(U_p - U_ours).max()
        cost_ours = float(res.cost)
        rows.append(dict(
            name=name, m=sc.m, N=ocp.N, T=float(ocp.T),
            cost_ours=cost_ours, cost_oracle=cost_o,
            rel=abs(cost_ours - min(cost_o, cost_p)) / (1 + abs(min(cost_o, cost_p))),
            better=cost_ours < cost_o - 1e-6,
            viol=float(res.viol), polish=float(polish),
            t_ours=t_ours, t_orc=t_orc,
        ))
        print(f"{name}: ours {cost_ours:.4f} oracle {cost_o:.4f} "
              f"polish-dU {polish:.2e} viol {float(res.viol):.1e} "
              f"({t_ours:.1f}s vs {t_orc:.1f}s)", flush=True)

    os.makedirs("docs", exist_ok=True)
    with open("docs/PARITY.md", "w") as f:
        f.write(
            "# Solver parity vs the reference NLP (scipy SLSQP oracle)\n\n"
            "Open-loop solves of the reference's own transcriptions. "
            "`polish dU` = max control change when the float64 oracle is "
            "seeded at our solution (small = our solution is a KKT point of "
            "the reference NLP). `ours<orc` marks cases where the TPU engine "
            "found a *better* local optimum than the cold-started oracle "
            "(the problems are nonconvex).\n\n"
            "| scenario | m | N | cost (ours) | cost (oracle) | rel. gap | ours<orc | max viol | polish dU | solve s (ours/oracle) |\n"
            "|---|---|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['name']} | {r['m']} | {r['N']} | {r['cost_ours']:.4f} | "
                f"{r['cost_oracle']:.4f} | {r['rel']:.1e} | "
                f"{'yes' if r['better'] else ''} | {r['viol']:.1e} | "
                f"{r['polish']:.2e} | {r['t_ours']:.2f} / {r['t_orc']:.1f} |\n"
            )
    print("wrote docs/PARITY.md")


if __name__ == "__main__":
    main()
