"""Bench: closed-loop FLEET throughput — the serving metric.

bench.py measures cold solves. Deployment steady state is different: a
fleet of MPC loops advancing in lockstep, each step = warm-started solve
(shift + carried duals) -> first control -> plant -> shift, entirely on
device. This tool scans K such steps for B scenarios as one jitted
program and reports fleet-steps/s (= warm solves/s): the number of
robots-being-controlled-in-real-time one chip can carry.

Config: the bench shape (six-robot antipodal, N=10) with jittered starts;
rt-class solver budget per step (3x10, carried mu — the deployment recipe
validated collision-safe by tests/test_rt_mode.py). Synchronous timing.

Usage: python tools/bench_fleet_loop.py [B] [K] [iters]
"""

import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from nmpc_tpu.mpc.driver import shift_warm  # noqa: E402
from nmpc_tpu.parallel.batch import batch_ocp  # noqa: E402
from nmpc_tpu.scenarios import get  # noqa: E402
from nmpc_tpu.sim.plant import PlantConfig, plant_step  # noqa: E402
from nmpc_tpu.solver.alilqr import ALILQRConfig  # noqa: E402
from nmpc_tpu.solver.alilqr_batched import solve_batched  # noqa: E402

SEED_CFG = ALILQRConfig(n_outer=6, n_inner=12, tol_con=1e-3)
RT_CFG = ALILQRConfig(n_outer=3, n_inner=10, tol_con=1e-3)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    base = get("six_robot_antipodal").make(N=10)
    key = jax.random.PRNGKey(0)
    x0s = base.x0[None] + 0.1 * jax.random.normal(key, (B, base.nx), base.x0.dtype)
    ob = batch_ocp(base, x0s)

    seed = jax.jit(functools.partial(solve_batched, cfg=SEED_CFG))
    res0 = seed(ob)
    _ = float(res0.cost[0])
    warm0 = shift_warm(res0, RT_CFG, mu_reset=False)

    def chunk(x0s, warm):
        def step(carry, _):
            x, w = carry
            res = solve_batched(dataclasses.replace(ob, x0=x), w, RT_CFG)
            u0 = res.U[:, 0, :]
            xn, _ = jax.vmap(
                lambda xi, ui: plant_step(xi, ui, base.T, PlantConfig()))(x, u0)
            wn = shift_warm(res, RT_CFG, mu_reset=False)
            return (xn, wn), (jnp.max(res.viol), jnp.mean(res.inner_iters))

        (xF, wF), (viols, its) = jax.lax.scan(step, (x0s, warm), None, length=K)
        return xF, wF, jnp.max(viols), jnp.mean(its)

    f = jax.jit(chunk)
    xF, wF, v, it = f(ob.x0, warm0)
    _ = float(v)  # compile + sync
    print(f"fleet closed loop (six-robot N=10) B={B} K={K} "
          f"backend={jax.default_backend()}")
    # each rep restarts from freshly jittered starts with a seeded warm
    # start (computed OUTSIDE the clock), so every timed chunk measures
    # the maneuver's hard phase, not the post-arrival no-op steady state
    ts = []
    for i in range(iters):
        key, sub = jax.random.split(key)
        x0s = base.x0[None] + 0.1 * jax.random.normal(sub, (B, base.nx),
                                                      base.x0.dtype)
        res_i = seed(dataclasses.replace(ob, x0=x0s))
        w = shift_warm(res_i, RT_CFG, mu_reset=False)
        jax.block_until_ready((x0s, w.U))
        t0 = time.perf_counter()
        x, w, v, it = f(x0s, w)
        _ = float(v)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    cap = B * K / t * float(base.T)  # loops servable at one step per T
    print(f"{t:.3f} s/chunk -> {B * K / t:.1f} warm fleet-steps/s "
          f"(real-time capacity ~{cap:.0f} six-robot loops/chip at "
          f"T={float(base.T):g}; max planned viol {float(v):.1e}, "
          f"{float(it):.1f} mean iters/solve)")


if __name__ == "__main__":
    main()
