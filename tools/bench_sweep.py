"""Bench: sequential vs associative-scan backward sweep at long horizons.

The reference's longest-horizon configs are N=200
(AllScripts/mpc_online_casadi_tb3_1.py:57, decentralized_first_scenario.py:95).
This measures the batched solver at the tb3_1 shape (m=1, N=200) with
sweep='seq' (megakernel / lane-major Pallas, sequential in N) vs
sweep='scan' (hybrid: fused Pallas line search around the O(log N)
associative-scan LQR, ops/assoc_lqr.py), at B=1 and B=2048 (the N=200 scan hybrid
materializes O(B N n^2) combine-tree temporaries, so the fleet batch is
sized to HBM — B=8192 crashed the TPU worker; seq at B=32k is covered by
bench.py).

B=1 latency is measured as lax.map over K independent solves inside one jit
(per-solve device time; a single solve through the dev tunnel is dominated
by the ~25-35 ms dispatch floor — STATUS.md). B=32768 is one synchronous
batch. Results feed the sweep='auto' thresholds in solver/alilqr_batched.py
and the docs/SWEEP.md table.

Usage: python tools/bench_sweep.py [N] [iters]
"""

import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from nmpc_tpu.parallel.batch import batch_ocp  # noqa: E402
from nmpc_tpu.scenarios import get  # noqa: E402
from nmpc_tpu.solver.alilqr import ALILQRConfig  # noqa: E402
from nmpc_tpu.solver.alilqr_batched import solve_batched  # noqa: E402


def bench_b1(base, cfg, K=16, iters=5):
    """Per-solve device time: K independent B=1 solves inside one jit."""
    def many(x0s):  # [K, nx]
        def one(x0):
            ob = batch_ocp(base, x0[None])
            r = solve_batched(ob, cfg=cfg)
            return r.cost[0]
        return jax.lax.map(one, x0s)

    f = jax.jit(many)
    key = jax.random.PRNGKey(0)
    x0s = base.x0[None] + 0.05 * jax.random.normal(key, (K, base.nx))
    _ = float(f(x0s)[0])
    ts = []
    for i in range(iters):
        key, sub = jax.random.split(key)
        x0s = base.x0[None] + 0.05 * jax.random.normal(sub, (K, base.nx))
        x0s.block_until_ready()
        t0 = time.perf_counter()
        out = f(x0s)
        _ = float(out[-1])
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


def bench_batch(base, cfg, B=2048, iters=4):
    key = jax.random.PRNGKey(1)
    ob = batch_ocp(base, base.x0[None] + 0.05 * jax.random.normal(key, (B, base.nx)))
    f = jax.jit(functools.partial(solve_batched, cfg=cfg))
    r = f(ob)
    _ = float(r.cost[0])
    ts = []
    for i in range(iters):
        key, sub = jax.random.split(key)
        ob_i = dataclasses.replace(
            ob, x0=base.x0[None] + 0.05 * jax.random.normal(sub, (B, base.nx)))
        ob_i.x0.block_until_ready()
        t0 = time.perf_counter()
        r = f(ob_i)
        _ = float(r.cost[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), B


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    base = get("tb3_1").make(N=N)
    print(f"tb3_1 shape m=1 N={N} backend={jax.default_backend()}")
    for sweep, Bfleet in (("seq", 2048), ("scan", 512)):
        # scan's combine tree materializes O(B N n^2) temporaries: B=2048+
        # crashed the TPU worker at N=200, so its fleet batch is smaller
        cfg = ALILQRConfig(n_outer=6, n_inner=12, tol_con=1e-3, sweep=sweep)
        t1 = bench_b1(base, cfg, iters=iters)
        tb, B = bench_batch(base, cfg, B=Bfleet, iters=iters)
        print(f"sweep={sweep:4s}:  B=1 {t1*1e3:8.2f} ms/solve   "
              f"B={B} {tb:6.2f} s/batch ({B/tb:9.1f} solves/s)")


if __name__ == "__main__":
    main()
