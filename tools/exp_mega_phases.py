"""Experiment: measure the megakernel's real per-phase time split by ablation.

Builds ablated copies of the fused inner solve (ops/megasolve_pallas.py) and
times them at the bench shape. The ablations produce WRONG solver output —
they exist only to isolate where the kernel's cycles go, since Pallas has no
in-kernel profiler:

  full        — the real kernel (sanity: should match bench timing)
  no_ls       — line search replaced by always-accept alpha=1 (no candidate
                merit rollouts, no accept-rollout merit); isolates the line
                search's share
  no_solve    — Cholesky factor + substitution replaced by a diagonal
                approximation (kff = -Qu/diag, Kfb = -Qux/diag); isolates the
                factor+substitution share
  no_expcon   — constraint rows dropped from the expansions (pure LQR
                expansions); isolates the expansion constraint-row share
  sweep_only  — line search AND rollouts removed entirely (backward sweep +
                writeout only); the sweep's irreducible share

Same iteration counts everywhere: done-based early exit is DISABLED (every
lane runs n_outer * n_inner iterations) so ablations are compared at equal
iteration work, not equal convergence.

NOTE: the 51%/22%/14% split recorded in docs/ROOFLINE.md was measured
against the round-3 PRE-blocked kernel; the package's `_expansion_regs`
(which `full`/`no_ls`/`no_solve` modes import) is now the blocked
version, so a re-run reflects the post-rewrite balance.

Usage: python tools/exp_mega_phases.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from nmpc_tpu.ocp.problem import OCP  # noqa: E402
from nmpc_tpu.ops.rollout_pallas import (  # noqa: E402
    _P, _euler_rows, _feedback_u, _merit_params, _pack_params, _stage_merit,
)
from nmpc_tpu.ops.megasolve_pallas import _expansion_regs  # noqa: E402
from nmpc_tpu.ops.riccati_pallas import _chol, _chol_solve, _mtm  # noqa: E402

LANES = 128


def make_kernel(ocp: OCP, P, cfg, mode: str):
    N, n, mc = ocp.N, ocp.nx, ocp.nu
    reg = cfg.reg

    def kernel(prm, x0_ref, xref_ref, lam_ref, mu_ref, Uin_ref,
               Uout_ref, Xout_ref, cost_ref, iters_ref,
               X_s, U_s, kff_s, Kfb_s, Vx_s, Vxx_s, cost_s, done_s,
               trial_s, acc_s, bcost_s, balpha_s):
        mu = mu_ref[0]
        x0 = x0_ref[0, 0]
        iters_ref[0] = jnp.zeros_like(mu)
        mp = _merit_params(ocp, P, prm, mu)

        def init_roll(k, carry):
            x, cost = carry
            u = Uin_ref[0, k]
            U_s[k] = u
            X_s[k] = x
            if mode != "sweep_only":
                cost = cost + _stage_merit(ocp, P, prm, k, x, u,
                                           xref_ref[0, k], lam_ref[0, k], mu,
                                           None, mp)
            return (_euler_rows(ocp.m, x, u, prm[0, P.dt]), cost)

        _, cost0 = jax.lax.fori_loop(0, N, init_roll, (x0, jnp.zeros_like(mu)))
        cost_s[...] = cost0
        done_s[...] = jnp.zeros_like(mu)
        trial_s[...] = jnp.ones_like(mu)

        def inner(it, _):
            cost_cur = cost_s[...]
            Vx_s[...] = jnp.zeros_like(Vx_s)
            Vxx_s[...] = jnp.zeros_like(Vxx_s)

            def bwd(t, dV1):
                k = N - 1 - t
                if mode == "no_expcon":
                    # LQR-only expansions: zero multipliers kill every
                    # constraint activation branch's arithmetic? No — the
                    # act rows still compute. Instead drop them by calling
                    # with a zeroed-pair OCP is not possible per-stage, so
                    # emulate: plain quadratic expansions inline.
                    x, u, xr = X_s[k], U_s[k], xref_ref[0, k]
                    dt = prm[0, P.dt]
                    one = jnp.ones_like(mu)
                    e1, e2, bc, bs = [], [], [], []
                    for r in range(ocp.m):
                        th = x[3 * r + 2: 3 * r + 3]
                        v = u[2 * r: 2 * r + 1]
                        c, s = jnp.cos(th), jnp.sin(th)
                        e1.append(-dt * v * s)
                        e2.append(dt * v * c)
                        bc.append(dt * c)
                        bs.append(dt * s)
                    lx = jnp.concatenate(
                        [2.0 * prm[0, P.q + i] * (x[i:i+1] - xr[i:i+1])
                         for i in range(n)], axis=0)[:, None]
                    lu = jnp.concatenate(
                        [2.0 * prm[0, P.r + i] * u[i:i+1]
                         for i in range(mc)], axis=0)[:, None]
                    lx = lx.reshape(n, 1, LANES)
                    lu = lu.reshape(mc, 1, LANES)
                    lxx = jnp.concatenate(
                        [jnp.concatenate(
                            [2.0 * prm[0, P.q + i] * one if i == j
                             else jnp.zeros_like(one) for j in range(n)],
                            axis=0)[None] for i in range(n)], axis=0)
                    luu = jnp.concatenate(
                        [jnp.concatenate(
                            [2.0 * prm[0, P.r + i] * one if i == j
                             else jnp.zeros_like(one) for j in range(mc)],
                            axis=0)[None] for i in range(mc)], axis=0)
                else:
                    e1, e2, bc, bs, lx, lu, lxx, luu = _expansion_regs(
                        ocp, P, prm, k, X_s[k], U_s[k], xref_ref[0, k],
                        lam_ref[0, k], mu, None)
                dt = prm[0, P.dt]
                nrob = ocp.m
                Vx = Vx_s[...]
                Vxx = Vxx_s[...]

                va_cols = [Vxx[:, j: j + 1] for j in range(n)]
                for r in range(nrob):
                    va_cols[3 * r + 2] = (
                        va_cols[3 * r + 2]
                        + Vxx[:, 3 * r: 3 * r + 1] * e1[r][None]
                        + Vxx[:, 3 * r + 1: 3 * r + 2] * e2[r][None])
                VA = jnp.concatenate(va_cols, axis=1)
                qx_rows = [lx[i: i + 1] + Vx[i: i + 1] for i in range(n)]
                qxx_rows = [lxx[i: i + 1] + VA[i: i + 1] for i in range(n)]
                for r in range(nrob):
                    i0, i1, i2 = 3 * r, 3 * r + 1, 3 * r + 2
                    qx_rows[i2] = (qx_rows[i2]
                                   + e1[r][None] * Vx[i0: i0 + 1]
                                   + e2[r][None] * Vx[i1: i1 + 1])
                    qxx_rows[i2] = (qxx_rows[i2]
                                    + e1[r][None] * VA[i0: i0 + 1]
                                    + e2[r][None] * VA[i1: i1 + 1])
                Qx = jnp.concatenate(qx_rows, axis=0)
                Qxx = jnp.concatenate(qxx_rows, axis=0)

                def bt_rows(M):
                    rows = []
                    for r in range(nrob):
                        i0 = 3 * r
                        rows.append(bc[r][None] * M[i0: i0 + 1]
                                    + bs[r][None] * M[i0 + 1: i0 + 2])
                        rows.append(dt * M[i0 + 2: i0 + 3])
                    return jnp.concatenate(rows, axis=0)

                Qu = lu + bt_rows(Vx)
                Qux = bt_rows(VA)
                vb_cols = []
                for r in range(nrob):
                    j0 = 3 * r
                    vb_cols.append(bc[r][None] * Vxx[:, j0: j0 + 1]
                                   + bs[r][None] * Vxx[:, j0 + 1: j0 + 2])
                    vb_cols.append(dt * Vxx[:, j0 + 2: j0 + 3])
                Quu = luu + bt_rows(jnp.concatenate(vb_cols, axis=1))
                if mode == "no_solve":
                    dinv = [1.0 / (Quu[i, i: i + 1] + reg) for i in range(mc)]
                    kff = -jnp.concatenate(
                        [dinv[i] * Qu[i: i + 1] for i in range(mc)], axis=0)
                    Kfb = -jnp.concatenate(
                        [dinv[i] * Qux[i: i + 1] for i in range(mc)], axis=0)
                elif mode == "inv_solve":
                    # explicit L^-1: the substitutions' 2m serial [19,T]
                    # rows become row-independent wide FMAs; the inverse
                    # build is m independent narrow column chains
                    L, invs = _chol(Quu, reg)
                    Linv = [[None] * mc for _ in range(mc)]
                    for j in range(mc):
                        Linv[j][j] = invs[j]
                        for i in range(j + 1, mc):
                            acc = L[i][j] * Linv[j][j]
                            for kk in range(j + 1, i):
                                acc = acc + L[i][kk] * Linv[kk][j]
                            Linv[i][j] = -invs[i] * acc
                    RHS = jnp.concatenate([Qu, Qux], axis=1)
                    ys = []
                    for i in range(mc):
                        acc = Linv[i][0] * RHS[0]
                        for kk in range(1, i + 1):
                            acc = acc + Linv[i][kk] * RHS[kk]
                        ys.append(acc)
                    xs_ = [None] * mc
                    for i in range(mc):
                        acc = Linv[i][i] * ys[i]
                        for kk in range(i + 1, mc):
                            acc = acc + Linv[kk][i] * ys[kk]
                        xs_[i] = acc
                    sol = jnp.stack(xs_, axis=0)
                    kff = -sol[:, :1]
                    Kfb = -sol[:, 1:]
                else:
                    L = _chol(Quu, reg)
                    sol = _chol_solve(L, jnp.concatenate([Qu, Qux], axis=1))
                    kff = -sol[:, :1]
                    Kfb = -sol[:, 1:]
                kff_s[k] = kff
                Kfb_s[k] = Kfb
                Vx_s[...] = Qx + _mtm(Qux, kff)
                Vxx_s[...] = Qxx + _mtm(Qux, Kfb)
                return dV1 + jnp.sum(kff * Qu, axis=0)

            dV1 = jax.lax.fori_loop(0, N, bwd, jnp.zeros_like(mu))

            if mode in ("full",):
                def cost_of(alpha):
                    def roll(k, carry):
                        x, cost = carry
                        u = _feedback_u(n, x, X_s[k], U_s[k], kff_s[k],
                                        Kfb_s[k], alpha)
                        cost = cost + _stage_merit(ocp, P, prm, k, x, u,
                                                   xref_ref[0, k],
                                                   lam_ref[0, k], mu, None, mp)
                        return (_euler_rows(ocp.m, x, u, prm[0, P.dt]), cost)
                    _, c = jax.lax.fori_loop(0, N, roll,
                                             (x0, jnp.zeros_like(mu)))
                    return c

                acc_s[...] = jnp.zeros_like(mu)
                bcost_s[...] = cost_cur
                balpha_s[...] = jnp.zeros_like(mu)

                def ls_round():
                    acc = acc_s[...]
                    a = jnp.where(acc > 0.5, jnp.zeros_like(mu), trial_s[...])
                    ca = cost_of(a)
                    expected = cfg.armijo * a * jnp.maximum(-dV1, 0.0)
                    ok = ((acc <= 0.5) & ((cost_cur - ca) >= expected)
                          & (ca < cost_cur))
                    bcost_s[...] = jnp.where(ok, ca, bcost_s[...])
                    balpha_s[...] = jnp.where(ok, a, balpha_s[...])
                    acc_s[...] = jnp.maximum(acc, ok.astype(mu.dtype))
                    trial_s[...] = jnp.where(acc_s[...] > 0.5, trial_s[...],
                                             trial_s[...] * cfg.ls_beta)

                for _ in range(cfg.ls_rounds):
                    @pl.when(jnp.logical_not(jnp.all(acc_s[...] > 0.5)))
                    def _r():
                        ls_round()

                best_alpha = balpha_s[...]
                best_cost = bcost_s[...]
                trial_s[...] = jnp.where(
                    best_alpha > 0.0,
                    jnp.minimum(1.0, best_alpha * cfg.ls_grow), trial_s[...])
                alpha_l = best_alpha
                cost_new = jnp.where(best_alpha > 0.0, best_cost, cost_cur)
            elif mode == "sweep_only":
                alpha_l = None
                cost_new = cost_cur
            else:  # no_ls / no_solve / no_expcon: always take alpha = 1
                alpha_l = jnp.ones_like(mu)
                cost_new = cost_cur

            if alpha_l is not None:
                def accept(k, x):
                    u = _feedback_u(n, x, X_s[k], U_s[k], kff_s[k],
                                    Kfb_s[k], alpha_l)
                    X_s[k] = x
                    U_s[k] = u
                    return _euler_rows(ocp.m, x, u, prm[0, P.dt])
                jax.lax.fori_loop(0, N, accept, x0)

            iters_ref[0] += 1.0
            cost_s[...] = cost_new
            return 0

        jax.lax.fori_loop(0, cfg.n_outer * cfg.n_inner, inner, 0)

        def writeout(k, _):
            Uout_ref[0, k] = U_s[k]
            Xout_ref[0, k] = X_s[k]
            return 0

        jax.lax.fori_loop(0, N, writeout, 0)
        cost_ref[0] = cost_s[...]

    return kernel


def run_mode(ocp, x0_l, xref_l, lam_l, mu_l, U_l, cfg, mode):
    tiles = x0_l.shape[0]
    N, n, mc = ocp.N, ocp.nx, ocp.nu
    dtype = x0_l.dtype
    P = _P(n, mc, 1, ocp.n_obs)
    prm = _pack_params(ocp, (0.0,))

    def vs(nstg, *dims):
        nd = len(dims)
        return pl.BlockSpec((1, nstg, *dims, LANES),
                            lambda i, nd=nd: (i,) + (0,) * (nd + 2),
                            memory_space=pltpu.VMEM)

    lane = pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    sm = pl.BlockSpec((1, P.size), lambda i: (0, 0), memory_space=pltpu.SMEM)
    scratch = [
        pltpu.VMEM((N, n, LANES), dtype),
        pltpu.VMEM((N, mc, LANES), dtype),
        pltpu.VMEM((N, mc, 1, LANES), dtype),
        pltpu.VMEM((N, mc, n, LANES), dtype),
        pltpu.VMEM((n, 1, LANES), dtype),
        pltpu.VMEM((n, n, LANES), dtype),
        pltpu.VMEM((1, LANES), dtype),
        pltpu.VMEM((1, LANES), dtype),
        pltpu.VMEM((1, LANES), dtype),
        pltpu.VMEM((1, LANES), dtype),
        pltpu.VMEM((1, LANES), dtype),
        pltpu.VMEM((1, LANES), dtype),
    ]
    f = pl.pallas_call(
        make_kernel(ocp, P, cfg, mode),
        grid=(tiles,),
        in_specs=[sm, vs(1, n), vs(N, n), vs(N, ocp.n_con), lane, vs(N, mc)],
        out_specs=(vs(N, mc), vs(N, n), lane, lane),
        out_shape=(
            jax.ShapeDtypeStruct((tiles, N, mc, LANES), dtype),
            jax.ShapeDtypeStruct((tiles, N, n, LANES), dtype),
            jax.ShapeDtypeStruct((tiles, 1, LANES), dtype),
            jax.ShapeDtypeStruct((tiles, 1, LANES), dtype),
        ),
        scratch_shapes=scratch,
        interpret=jax.default_backend() == "cpu",
    )
    return f(prm, x0_l, xref_l, lam_l, mu_l, U_l)


def main():
    from nmpc_tpu.parallel.batch import batch_ocp
    from nmpc_tpu.scenarios import get
    from nmpc_tpu.solver.alilqr import ALILQRConfig

    B = 32768
    base = get("six_robot_antipodal").make(N=10)
    cfg = ALILQRConfig(n_outer=6, n_inner=12, tol_con=1e-3, ls="adaptive")
    key = jax.random.PRNGKey(0)
    noise = 0.1 * jax.random.normal(key, (B, base.nx), base.x0.dtype)
    ob = batch_ocp(base, base.x0[None] + noise)

    tiles = B // LANES
    dtype = base.x0.dtype

    def to_lane(x, *dims):
        xt = jnp.moveaxis(x, 0, -1)
        xt = xt.reshape(*xt.shape[:-1], tiles, LANES)
        return jnp.moveaxis(xt, -2, 0)

    x0_l = to_lane(ob.x0[:, None])[:, :1]
    x0_l = x0_l.reshape(tiles, 1, base.nx, LANES)
    xref_l = to_lane(ob.xref)
    lam_l = jnp.zeros((tiles, base.N, base.n_con, LANES), dtype)
    mu_l = jnp.full((tiles, 1, LANES), 10.0, dtype)
    U_l = jnp.zeros((tiles, base.N, base.nu, LANES), dtype)

    iters_total = cfg.n_outer * cfg.n_inner
    print(f"B={B}, fixed {iters_total} iterations per lane, backend="
          f"{jax.default_backend()}")
    base_t = None
    for mode in ["full", "inv_solve", "no_ls", "no_solve", "no_expcon", "sweep_only"]:
        f = jax.jit(functools.partial(run_mode, base, cfg=cfg, mode=mode))
        r = f(x0_l, xref_l, lam_l, mu_l, U_l)
        _ = float(r[2][0, 0, 0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(x0_l, xref_l, lam_l, mu_l, U_l)
            _ = float(r[2][0, 0, 0])
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        if mode == "full":
            base_t = t
            print(f"{mode:10s}: {t*1e3:8.1f} ms")
        else:
            print(f"{mode:10s}: {t*1e3:8.1f} ms  (saves {100*(base_t-t)/base_t:5.1f}% of full)")


if __name__ == "__main__":
    main()
