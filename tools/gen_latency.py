"""Generate docs/LATENCY.md: warm-started per-step solve latency vs the
reference's real-time budget (BASELINE metric: 'p99 per-step solve latency
vs IPOPT' — the budget is the control period T, which the serial IPOPT solve
must fit inside; SURVEY.md §6).

Measures the MPC steady state: solve, shift, jitter the measurement, solve
again — batch of one, real TPU. Run: python tools/gen_latency.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nmpc_tpu.mpc.driver import shift_warm
from nmpc_tpu.scenarios import get
from nmpc_tpu.solver.alilqr import ALILQRConfig, solve
from nmpc_tpu.utils import latency_stats

CASES = [
    ("single_robot", {}),          # T=0.01, N=50
    ("tb3_1", {}),                 # T=0.01, N=200 (longest horizon)
    ("two_robot_swap", {}),        # T=0.02, N=100
    ("five_robot", {}),            # T=0.02, N=70
    ("six_robot_antipodal", {}),   # T=0.2,  N=35 (headline)
    ("eight_robot", {}),           # T=0.02, N=5
    ("ten_robot", {}),             # T=0.1,  N=20
]

CFG = ALILQRConfig(n_outer=6, n_inner=12, tol_con=1e-4)


def main():
    import dataclasses

    rows = []
    for name, over in CASES:
        sc = get(name)
        ocp = sc.make(**over)
        f = jax.jit(functools.partial(solve, cfg=CFG))
        res = f(ocp)
        res.X.block_until_ready()  # compile + cold solve
        warm = shift_warm(res, CFG, mu_reset=True)
        key = jax.random.PRNGKey(0)
        samples = []
        for i in range(30):
            key, sub = jax.random.split(key)
            x0 = ocp.x0 + 0.01 * jax.random.normal(sub, ocp.x0.shape, ocp.x0.dtype)
            ocp_i = dataclasses.replace(ocp, x0=x0)
            t0 = time.perf_counter()
            res = f(ocp_i, warm)
            res.U.block_until_ready()
            samples.append(time.perf_counter() - t0)
            warm = shift_warm(res, CFG, mu_reset=True)
        st = latency_stats(samples)
        budget_ms = float(ocp.T) * 1e3
        rows.append((name, sc.m, ocp.N, budget_ms, st))
        print(f"{name}: p50 {st['p50_ms']:.2f} ms  p99 {st['p99_ms']:.2f} ms "
              f"(budget {budget_ms:.0f} ms) rt={'Y' if st['p99_ms'] <= budget_ms else 'N'}",
              flush=True)

    os.makedirs("docs", exist_ok=True)
    with open("docs/LATENCY.md", "w") as f:
        f.write(
            "# Warm-started per-step solve latency vs real-time budget\n\n"
            "Batch of one, TPU v5e, warm-started (shift) solves — the MPC\n"
            "steady state. Budget = the reference's control period T\n"
            "(the IPOPT solve must fit inside it for the loop to run at rate).\n\n"
            "| scenario | m | N | budget ms | p50 ms | p99 ms | real-time |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for name, m, N, budget, st in rows:
            f.write(
                f"| {name} | {m} | {N} | {budget:.0f} | {st['p50_ms']:.2f} | "
                f"{st['p99_ms']:.2f} | {'yes' if st['p99_ms'] <= budget else 'no'} |\n"
            )
    print("wrote docs/LATENCY.md")


if __name__ == "__main__":
    main()
