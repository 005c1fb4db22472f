"""Iteration-lever A/B at bench scale (round 4, VERDICT ask #2).

Measures throughput + quality statistics for solver-config variants that
cut iteration counts (mu_init schedule, seeded cold starts) on the bench
shape. Findings (v5e, B=32768, six-robot N=10, synchronous timing):
  * mu_init=100: mean inner iterations 45.0 -> 35.3 (-22%) at conv 99.87%
    / viol_p99 7.4e-4 (vs 4.7e-4) -- but throughput FLAT (64.6k vs 64.8k):
    megakernel executed work is bounded by each 128-lane tile's straggler
    lane, not by the mean. The lever pays only where divergence is absent
    (B=1 latency path).
  * cold_seed='polar': no iteration change at all (see
    solver/alilqr_batched._polar_seed docstring).
  * ls_rounds=1 (halve the adaptive LS's merit evaluations/iteration):
    +11% throughput (71.5k) but conv drops 99.9 -> 96.0% and viol_p99
    breaches tol (2.6e-3) -- and recovering quality with a larger
    iteration budget ERASES the gain (rounds1 @ 6x16: 54.9k at conv
    99.80; @ 6x20: 44.4k at conv 99.93; vs rounds2 @ 6x12: 64.5k at conv
    99.86): fail-continue retries (a whole extra iteration incl. sweep)
    cost more than the second merit evaluation they replace. The bench
    stays at ls_rounds=2.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import dataclasses, functools, time
import jax, jax.numpy as jnp
from nmpc_tpu.parallel.batch import batch_ocp
from nmpc_tpu.scenarios import get
from nmpc_tpu.solver.alilqr import ALILQRConfig
from nmpc_tpu.solver.alilqr_batched import solve_batched

B = 32768
base = get("six_robot_antipodal").make(N=10)
key = jax.random.PRNGKey(0)
noise = 0.1 * jax.random.normal(key, (B, base.nx), base.x0.dtype)
ob = batch_ocp(base, base.x0[None] + noise)

for name, kw in (
    ("base_r4", dict(n_outer=6, n_inner=12, tol_con=1e-3, ls="adaptive")),
    ("mu100",   dict(n_outer=6, n_inner=12, tol_con=1e-3, ls="adaptive", mu_init=100.0)),
):
    cfg = ALILQRConfig(**kw)
    run = jax.jit(functools.partial(solve_batched, cfg=cfg))
    res = run(ob); _ = float(res.cost[0])
    times = []
    k = key
    for i in range(3):
        k, sub = jax.random.split(k)
        x0s = base.x0[None] + 0.1 * jax.random.normal(sub, (B, base.nx), base.x0.dtype)
        x0s.block_until_ready()
        ob_i = dataclasses.replace(ob, x0=x0s)
        t0 = time.perf_counter()
        res = run(ob_i)
        res.cost.block_until_ready()
        times.append(time.perf_counter() - t0)
    v = jnp.sort(res.viol)
    print("%-8s %8.1f solves/s  conv %.4f  viol_p99 %.2e  mean_inner %.2f" % (
        name, B / min(times),
        float(jnp.mean(res.converged.astype(jnp.float32))),
        float(v[int(0.99 * B) - 1]),
        float(jnp.mean(res.inner_iters))), flush=True)
