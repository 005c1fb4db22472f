"""Benchmark: NMPC solves/s/chip on the six-robot, N=10-horizon problem.

BASELINE.md metric: "NMPC solves/s/chip (six-robot, N=10 horizon)"; north-star
target >1,000 full-horizon NMPC solves/s aggregate (BASELINE.json). The
reference's implied rate is one IPOPT solve per control period T=0.2 s
(5 solves/s, serial CPU). vs_baseline here is value / 1000 — the north-star
ratio, so vs_baseline >= 1.0 means the pod-slice target is met on this chip.

Prints exactly one JSON line.
"""

import dataclasses
import functools
import json
import time

import jax


def main():
    from nmpc_tpu.parallel.batch import batch_ocp
    from nmpc_tpu.scenarios import get
    from nmpc_tpu.solver.alilqr import ALILQRConfig
    from nmpc_tpu.solver.alilqr_batched import solve_batched

    B = 32768
    base = get("six_robot_antipodal").make(N=10)
    cfg = ALILQRConfig(n_outer=6, n_inner=12, tol_con=1e-3)

    key = jax.random.PRNGKey(0)
    # randomized scenario batch: jittered starts around the unit circle
    noise = 0.1 * jax.random.normal(key, (B, base.nx), base.x0.dtype)
    x0s = base.x0[None] + noise
    ob = batch_ocp(base, x0s)

    # batch-native solver: the Riccati backward sweep and line-search rollouts
    # are fused Pallas kernels; fall back to the vmapped engine if the Pallas
    # path fails to compile in this environment
    run = jax.jit(functools.partial(solve_batched, cfg=cfg))
    try:
        res = run(ob)
        res.cost.block_until_ready()  # compile + warm-up
    except Exception:
        from nmpc_tpu.parallel.batch import batched_solve

        run = jax.jit(functools.partial(batched_solve, cfg=cfg))
        res = run(ob)
        res.cost.block_until_ready()

    iters = 4
    t0 = time.perf_counter()
    for i in range(iters):
        # re-jitter so no iteration reuses converged state
        ob_i = dataclasses.replace(ob, x0=x0s + 1e-3 * i)
        res = run(ob_i)
    res.cost.block_until_ready()
    dt = time.perf_counter() - t0

    solves_per_s = B * iters / dt
    print(
        json.dumps(
            {
                "metric": "NMPC solves/s/chip (six-robot, N=10 horizon)",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
