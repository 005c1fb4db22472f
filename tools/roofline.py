"""Roofline / MFU accounting for the NMPC megakernel (VERDICT r2 weak #1).

Produces the absolute numbers behind bench.py's relative claims:

1. measured VPU peak — a pure-FMA Pallas microbenchmark on VMEM-resident
   vregs (the megakernel's arithmetic is batched small-matrix algebra on
   [rows, 128] lane vectors: VPU work by construction — a 12x18x18 matmul
   per lane cannot tile onto a 128x128 MXU, so the MXU bf16 peak the chip
   datasheet quotes is NOT this kernel's roof);
2. an analytic per-phase FLOP model of one fused inner iteration, built
   from the kernel structure in ops/megasolve_pallas.py (structured
   unicycle Jacobians: A/B never dense, so this counts the work the
   algorithm actually requires — not what a dense formulation would);
3. measured end-to-end solves/s at the bench shape + per-lane iteration
   counts -> achieved useful FLOP/s, as a fraction of the measured VPU
   peak and of HBM bandwidth.

Usage: python tools/roofline.py [B]
"""

import dataclasses
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

LANES = 128

# v5e datasheet anchors (public: cloud.google.com/tpu/docs/v5e and the
# jax-ml scaling book): 197 TFLOP/s bf16 MXU peak, 16 GiB HBM @ 819 GB/s.
HBM_GBPS = 819.0
MXU_BF16_TFLOPS = 197.0


# ---------------------------------------------------------------- VPU peak
def measure_vpu_peak(rows=256, R=16384, tiles=1536):
    """Pure-FMA chain on register-resident [rows, 128] f32 blocks.

    Each loop iteration issues rows/8 independent vreg FMAs whose only
    dependency is the previous iteration of the same vreg. Measured sweep
    (v5e, this environment): rows=64 (8 vregs) is FMA-latency-bound at
    1.05 TFLOP/s; rows=256 (32 vregs) is the ILP sweet spot; rows >= 512
    falls off (1.5 -> 1.0) as the carry spills out of the register file
    and FMAs pay VMEM round trips. Throughput also grows with total work
    as the per-call dispatch overhead (ms-class through the dev tunnel)
    amortizes: rows=256 measures 2.07/2.38/2.48 TFLOP/s at tiles=512/768/
    1536 (R=16384), marginal rate ~2.6 — consistent with ONE (8,128)-vreg
    FMA issued per cycle at the v5e clock. The asymptote ~2.5-2.6 TFLOP/s
    is the attainable peak for this kernel style. bf16 measures the SAME
    rate as f32 (2.0-2.2 at the short-run sizes): the VPU has no 2x bf16
    issue mode, so reduced precision buys only VMEM footprint here, not
    arithmetic. FLOPs = tiles * R * rows * 128 * 2."""
    def kernel(a_ref, o_ref):
        a = a_ref[...]

        def body(_, x):
            return x * 1.0000001 + 0.0000001

        o_ref[...] = jax.lax.fori_loop(0, R, body, a)

    x = jnp.ones((tiles, rows, LANES), jnp.float32)
    spec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel, grid=(tiles,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=jax.default_backend() == "cpu",
    )
    f = jax.jit(f)
    # synchronous timing with a value forced to host — block_until_ready on
    # a queued computation returns early through this environment's TPU
    # tunnel (STATUS.md hardware findings)
    _ = float(f(x)[0, 0, 0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(f(x)[0, 0, 0])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    flops = tiles * R * rows * LANES * 2
    return flops / t


# ------------------------------------------------------- analytic FLOP model
def iteration_flops(m, N, n_pairs, n_obs=0, n_mov=0, merit_evals=2.0):
    """FLOPs per lane per fused inner iteration (megasolve_pallas kernel).

    Counts multiplies/adds/compares/selects as 1, sqrt/div/sin/cos as 1
    (they cost more cycles — the model is therefore a *lower* bound on VPU
    work). Phases keyed to the kernel: expansions + structured V-propagation
    + Cholesky/solve + gain products (backward sweep, per stage), merit
    rollouts (line search + accept), per-iteration bookkeeping."""
    n, mc = 3 * m, 2 * m
    nc = n_pairs + m * n_obs + m * n_mov + 2 * mc + 2 * n

    # -- _expansion_regs (per stage)
    exp = (m * 6                      # e1/e2/bc/bs (+ sin/cos)
           + n * 3 + mc * 2           # lx/lu quadratic rows
           + n_pairs * 44             # pair rows: c, act, grads, 16 Hessian adds
           + m * n_obs * 40           # obstacle rows (sqrt + unit vector)
           + m * n_mov * 30           # keep-out rows (one-sided pair)
           + mc * 14 + n * 16         # u-box / x-box rows + diag curvature
           + n * 2 + mc * 2)          # He/Ue diagonals
    # -- structured V-propagation (per stage)
    vprop = (m * 4 * n                # VA column corrections
             + n + m * 4              # Qx rows + corrections
             + n * n + m * 4 * n      # Qxx adds + row corrections
             + m * 4 + mc            # bt_rows(Vx) + Qu add
             + m * 4 * n              # Qux = bt_rows(VA)
             + m * 4 * n + m * 4 * mc + mc * mc)  # VB, bt_rows(VB), Quu add
    # -- Cholesky + solve (per stage)
    chol = (mc * mc * (mc - 1)              # column updates (sum_i i * 2*mc)
            + mc * 3                         # sqrt + recip + scale
            + 2 * (mc * (mc - 1) * (1 + n))  # fwd+bwd substitution, r = 1+n
            + 2 * mc * (1 + n))              # divisions
    # -- gain products (per stage)
    gains = (2 * mc * n               # Qux' kff
             + 2 * mc * n * n         # Qux' Kfb  (the single largest term)
             + n + n * n              # Vx/Vxx adds
             + 2 * mc)                # dV1
    sweep = (exp + vprop + chol + gains) * N

    # -- one merit rollout (line search candidate / accept / init)
    fb = 2 * mc * n + 3 * mc          # _feedback_u
    merit = (n * 3 + mc * 3           # quadratic cost
             + n_pairs * 12 + m * n_obs * 12 + m * n_mov * 12
             + mc * 10 + n * 10       # box PHR blocks
             + nc * 3 + 6)            # act^2 reduce + combine
    euler = m * 8
    rollout = (fb + merit + euler) * N

    # merit_evals candidate rollouts + 1 accept rollout per iteration
    ls = (merit_evals + 1.0) * rollout
    return {"sweep": sweep, "line_search": ls,
            "per_iteration": sweep + ls, "rollout_one": rollout,
            "dims": dict(n=n, mc=mc, nc=nc, N=N, n_pairs=n_pairs)}


def hbm_bytes_per_solve(m, N, n_pairs, n_obs=0, n_mov=0, n_outer=6):
    """HBM traffic per solve: problem blocks in/out once per outer call
    (the megakernel keeps everything else VMEM-resident)."""
    n, mc = 3 * m, 2 * m
    nc = n_pairs + m * n_obs + m * n_mov + 2 * mc + 2 * n
    per_call = (n + N * n + N * nc + 1 + N * mc          # in
                + N * mc + N * n + 2                      # out
                + N * nc + 1)                             # AL update lam/viol
    return per_call * 4 * n_outer


# ---------------------------------------------------------------- measured
def measure_bench(B=32768):
    from nmpc_tpu.parallel.batch import batch_ocp
    from nmpc_tpu.scenarios import get
    from nmpc_tpu.solver.alilqr import ALILQRConfig
    from nmpc_tpu.solver.alilqr_batched import solve_batched

    base = get("six_robot_antipodal").make(N=10)
    cfg = ALILQRConfig(n_outer=6, n_inner=12, tol_con=1e-3, ls="adaptive")
    key = jax.random.PRNGKey(0)
    noise = 0.1 * jax.random.normal(key, (B, base.nx), base.x0.dtype)
    ob = batch_ocp(base, base.x0[None] + noise)
    run = jax.jit(functools.partial(solve_batched, cfg=cfg))
    res = run(ob)
    _ = float(res.cost[0])
    ts = []
    for i in range(3):
        key, sub = jax.random.split(key)
        noise = 0.1 * jax.random.normal(sub, (B, base.nx), base.x0.dtype)
        noise.block_until_ready()
        ob_i = batch_ocp(base, base.x0[None] + noise)
        t0 = time.perf_counter()
        res = run(ob_i)
        _ = float(res.cost[0])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    iters = np.asarray(res.inner_iters)
    tile_max = iters.reshape(-1, LANES).max(axis=1)
    return {
        "B": B, "s_per_batch": t, "solves_per_s": B / t,
        "mean_lane_iters": float(iters.mean()),
        "mean_tile_executed_iters": float(tile_max.mean()),
        "base": base,
    }


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    backend = jax.default_backend()
    print(f"backend={backend}")

    vpu = measure_vpu_peak()
    print(f"measured VPU f32 FMA peak: {vpu/1e12:.2f} TFLOP/s "
          f"(MXU bf16 datasheet peak: {MXU_BF16_TFLOPS} TFLOP/s — not this "
          "kernel's roof; see docstring)")

    mb = measure_bench(B)
    base = mb.pop("base")
    fl = iteration_flops(base.m, base.N, base.n_pairs)
    useful = fl["per_iteration"] * mb["mean_lane_iters"]
    executed = fl["per_iteration"] * mb["mean_tile_executed_iters"]
    hbm = hbm_bytes_per_solve(base.m, base.N, base.n_pairs)

    ach_useful = useful * mb["solves_per_s"]
    ach_exec = executed * mb["solves_per_s"]
    hbm_rate = hbm * mb["solves_per_s"]

    out = {
        "bench": {k: v for k, v in mb.items()},
        "flops_per_iteration": {k: v for k, v in fl.items() if k != "dims"},
        "useful_flops_per_solve": useful,
        "executed_flops_per_solve": executed,
        "hbm_bytes_per_solve": hbm,
        "vpu_peak_measured_tflops": vpu / 1e12,
        "achieved_useful_tflops": ach_useful / 1e12,
        "achieved_executed_tflops": ach_exec / 1e12,
        "pct_vpu_peak_useful": 100 * ach_useful / vpu,
        "pct_vpu_peak_executed": 100 * ach_exec / vpu,
        "hbm_gbps": hbm_rate / 1e9,
        "pct_hbm_bw": 100 * hbm_rate / (HBM_GBPS * 1e9),
        "arith_intensity_flop_per_byte": useful / hbm,
    }
    print(json.dumps(out, indent=2, default=float))


if __name__ == "__main__":
    main()
