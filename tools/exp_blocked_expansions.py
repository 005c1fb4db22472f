"""Experiment: block-vectorized stage expansions for the megakernel.

tools/exp_mega_phases.py measured the expansion constraint rows at 51% of
megakernel time at fixed iterations — they are evaluated one [1, T] lane row
at a time (7/8 of every vreg idle), exactly the shape problem the round-2
merit rewrite fixed for the line search. This prototype evaluates the
pair/box rows as [rows, T] sublane-packed blocks and assembles the dense
lxx/luu from slices, then times the full fused solve against the current
per-row `_expansion_regs` at equal iteration counts and checks the outputs
match to f32 tolerance.

The per-row baseline is inlined below (the pre-round-3 implementation,
frozen from git history) — the package's `_expansion_regs` IS the
blocked version since this experiment landed.

Usage: python tools/exp_blocked_expansions.py
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

from nmpc_tpu.ocp.problem import OCP, pair_indices  # noqa: E402
from nmpc_tpu.ops.rollout_pallas import (  # noqa: E402
    _P, _euler_rows, _feedback_u, _merit_params, _pack_params, _stage_merit,
)
from nmpc_tpu.ops.riccati_pallas import _chol, _chol_solve, _mtm  # noqa: E402

LANES = 128


def _expansion_regs_perrow(ocp: OCP, P, prm, k, x, u, xr, lam_k, mu, mov_k=None):
    """Stage expansion in registers (same math as expansions_pallas).

    The unicycle Jacobians are never materialized dense: A = I + E with
    E[3r, 3r+2] = -dt v sinθ =: e1[r], E[3r+1, 3r+2] = dt v cosθ =: e2[r],
    and B has per-robot entries B[3r, 2r] = dt cosθ =: bc[r],
    B[3r+1, 2r] = dt sinθ =: bs[r], B[3r+2, 2r+1] = dt. The backward sweep
    consumes these [1, T] lane vectors directly (see `bwd`), turning the
    O(n^3) dense V-propagation products into O(n) per-robot row/column
    updates and eliminating the [n,n,T]/[n,mc,T] register spill that kept
    the five- and ten-robot shapes out of VMEM."""
    n, mc, nrob = ocp.nx, ocp.nu, ocp.m
    zero = jnp.zeros_like(mu)
    one = jnp.ones_like(mu)
    dt = prm[0, P.dt]

    def dense(entries, rows, cols):
        out = []
        for a in range(rows):
            out.append(jnp.concatenate(
                [entries.get((a, b), zero) for b in range(cols)], axis=0))
        return jnp.stack(out, axis=0)

    e1, e2, bc, bs = [], [], [], []
    for r in range(nrob):
        th = x[3 * r + 2 : 3 * r + 3]
        v = u[2 * r : 2 * r + 1]
        c, s = jnp.cos(th), jnp.sin(th)
        e1.append(-dt * v * s)
        e2.append(dt * v * c)
        bc.append(dt * c)
        bs.append(dt * s)

    lx_rows = [2.0 * prm[0, P.q + i] * (x[i : i + 1] - xr[i : i + 1]) for i in range(n)]
    lu_rows = [2.0 * prm[0, P.r + i] * u[i : i + 1] for i in range(mc)]

    row = 0
    pair_data = []
    if ocp.n_pairs:
        for (i, j) in zip(*pair_indices(nrob)):
            dx = x[3 * i : 3 * i + 1] - x[3 * j : 3 * j + 1]
            dy = x[3 * i + 1 : 3 * i + 2] - x[3 * j + 1 : 3 * j + 2]
            c_row = dx * dx + dy * dy - prm[0, P.dmin2]
            act = jnp.maximum(0.0, lam_k[row : row + 1] - mu * c_row)
            act = jnp.where(k == 0, 0.0, act)
            w = mu * (act > 0.0).astype(act.dtype)
            gx, gy = 2.0 * dx, 2.0 * dy
            lx_rows[3 * i] = lx_rows[3 * i] - gx * act
            lx_rows[3 * i + 1] = lx_rows[3 * i + 1] - gy * act
            lx_rows[3 * j] = lx_rows[3 * j] + gx * act
            lx_rows[3 * j + 1] = lx_rows[3 * j + 1] + gy * act
            pair_data.append((i, j, gx, gy, w))
            row += 1
    obs_data = []
    for i in range(nrob):
        for o in range(ocp.n_obs):
            dx = x[3 * i : 3 * i + 1] - prm[0, P.obs + 3 * o]
            dy = x[3 * i + 1 : 3 * i + 2] - prm[0, P.obs + 3 * o + 1]
            dist = jnp.sqrt(dx * dx + dy * dy + 1e-12)
            c_row = dist - prm[0, P.obs + 3 * o + 2]
            act = jnp.maximum(0.0, lam_k[row : row + 1] - mu * c_row)
            act = jnp.where(k == 0, 0.0, act)
            w = mu * (act > 0.0).astype(act.dtype)
            ux, uy = dx / dist, dy / dist
            lx_rows[3 * i] = lx_rows[3 * i] - ux * act
            lx_rows[3 * i + 1] = lx_rows[3 * i + 1] - uy * act
            obs_data.append((i, ux, uy, w))
            row += 1
    # moving-obstacle rows (decentralized neighbor plans): c = d2 - dmin2,
    # gradient only on the robot side — same shape as a one-sided pair row
    mov_data = []
    for i in range(nrob):
        for o in range(ocp.n_mov):
            dxm = x[3 * i : 3 * i + 1] - mov_k[2 * o : 2 * o + 1]
            dym = x[3 * i + 1 : 3 * i + 2] - mov_k[2 * o + 1 : 2 * o + 2]
            c_row = dxm * dxm + dym * dym - prm[0, P.dmin2]
            act = jnp.maximum(0.0, lam_k[row : row + 1] - mu * c_row)
            act = jnp.where(k == 0, 0.0, act)
            w = mu * (act > 0.0).astype(act.dtype)
            gx, gy = 2.0 * dxm, 2.0 * dym
            lx_rows[3 * i] = lx_rows[3 * i] - gx * act
            lx_rows[3 * i + 1] = lx_rows[3 * i + 1] - gy * act
            mov_data.append((i, gx, gy, w))
            row += 1

    du_diag = []
    for i in range(mc):
        a_lo = jnp.maximum(0.0, lam_k[row + i : row + i + 1]
                           - mu * (u[i : i + 1] - prm[0, P.u_lo + i]))
        a_hi = jnp.maximum(0.0, lam_k[row + mc + i : row + mc + i + 1]
                           - mu * (prm[0, P.u_hi + i] - u[i : i + 1]))
        lu_rows[i] = lu_rows[i] - a_lo + a_hi
        du_diag.append(mu * ((a_lo > 0.0).astype(mu.dtype)
                             + (a_hi > 0.0).astype(mu.dtype)))
    row += 2 * mc

    dx_diag = []
    for i in range(n):
        a_lo = jnp.maximum(0.0, lam_k[row + i : row + i + 1]
                           - mu * (x[i : i + 1] - prm[0, P.x_lo + i]))
        a_hi = jnp.maximum(0.0, lam_k[row + n + i : row + n + i + 1]
                           - mu * (prm[0, P.x_hi + i] - x[i : i + 1]))
        a_lo = jnp.where(k == 0, 0.0, a_lo)
        a_hi = jnp.where(k == 0, 0.0, a_hi)
        lx_rows[i] = lx_rows[i] - a_lo + a_hi
        dx_diag.append(mu * ((a_lo > 0.0).astype(mu.dtype)
                             + (a_hi > 0.0).astype(mu.dtype)))

    lx = jnp.stack(lx_rows, axis=0)      # [n, 1, T]
    lu = jnp.stack(lu_rows, axis=0)      # [mc, 1, T]

    He = {}
    for i in range(n):
        He[(i, i)] = 2.0 * prm[0, P.q + i] * one + dx_diag[i]

    def add(a, b, v):
        He[(a, b)] = He.get((a, b), zero) + v

    for (i, j, gx, gy, w) in pair_data:
        xi, yi, xj, yj = 3 * i, 3 * i + 1, 3 * j, 3 * j + 1
        wxx, wyy, wxy = w * gx * gx, w * gy * gy, w * gx * gy
        add(xi, xi, wxx); add(yi, yi, wyy)
        add(xj, xj, wxx); add(yj, yj, wyy)
        add(xi, yi, wxy); add(yi, xi, wxy)
        add(xj, yj, wxy); add(yj, xj, wxy)
        add(xi, xj, -wxx); add(xj, xi, -wxx)
        add(yi, yj, -wyy); add(yj, yi, -wyy)
        add(xi, yj, -wxy); add(yj, xi, -wxy)
        add(yi, xj, -wxy); add(xj, yi, -wxy)
    for (i, ux, uy, w) in obs_data:
        xi, yi = 3 * i, 3 * i + 1
        add(xi, xi, w * ux * ux)
        add(yi, yi, w * uy * uy)
        add(xi, yi, w * ux * uy)
        add(yi, xi, w * ux * uy)
    for (i, gx, gy, w) in mov_data:
        xi, yi = 3 * i, 3 * i + 1
        add(xi, xi, w * gx * gx)
        add(yi, yi, w * gy * gy)
        add(xi, yi, w * gx * gy)
        add(yi, xi, w * gx * gy)
    lxx = dense(He, n, n)

    Ue = {}
    for i in range(mc):
        Ue[(i, i)] = 2.0 * prm[0, P.r + i] * one + du_diag[i]
    luu = dense(Ue, mc, mc)
    return e1, e2, bc, bs, lx, lu, lxx, luu


def _expansion_regs_blocked(ocp: OCP, P, prm, k, x, u, xr, lam_k, mu, mp,
                            mov_k=None):
    """Blocked rewrite of megasolve_pallas._expansion_regs (same outputs)."""
    n, mc, nrob = ocp.nx, ocp.nu, ocp.m
    zero = jnp.zeros_like(mu)
    one = jnp.ones_like(mu)
    dt = prm[0, P.dt]

    e1, e2, bc, bs = [], [], [], []
    for r in range(nrob):
        th = x[3 * r + 2: 3 * r + 3]
        v = u[2 * r: 2 * r + 1]
        c, s = jnp.cos(th), jnp.sin(th)
        e1.append(-dt * v * s)
        e2.append(dt * v * c)
        bc.append(dt * c)
        bs.append(dt * s)

    gate = jnp.where(k == 0, zero, one)

    # ---- quadratic rows as blocks ----
    lx_blk = 2.0 * mp["q"] * (x - xr)              # [n, T]
    lu_blk = 2.0 * mp["r"] * u                     # [mc, T]

    row = 0
    # ---- pair rows as one [n_pairs, T] block ----
    pair_blk = None
    if ocp.n_pairs:
        I, J = pair_indices(nrob)
        xi = jnp.concatenate([x[3 * i: 3 * i + 1] for i in I], axis=0)
        yi = jnp.concatenate([x[3 * i + 1: 3 * i + 2] for i in I], axis=0)
        xj = jnp.concatenate([x[3 * j: 3 * j + 1] for j in J], axis=0)
        yj = jnp.concatenate([x[3 * j + 1: 3 * j + 2] for j in J], axis=0)
        dx, dy = xi - xj, yi - yj
        c_blk = dx * dx + dy * dy - prm[0, P.dmin2]
        act = jnp.maximum(0.0, lam_k[row: row + ocp.n_pairs] - mu * c_blk)
        act = jnp.where(gate > 0.0, act, jnp.zeros_like(act))
        w = mu * (act > 0.0).astype(act.dtype)
        gx, gy = 2.0 * dx, 2.0 * dy
        gxa, gya = gx * act, gy * act              # lx contributions
        wxx, wyy, wxy = w * gx * gx, w * gy * gy, w * gx * gy
        nwxx, nwyy, nwxy = -wxx, -wyy, -wxy
        pair_blk = (I, J, gxa, gya, wxx, wyy, wxy, nwxx, nwyy, nwxy)
        row += ocp.n_pairs

    # ---- obstacle rows as one [m*n_obs, T] block ----
    obs_blk = None
    if ocp.n_obs:
        px = jnp.concatenate([x[3 * i: 3 * i + 1]
                              for i in range(nrob)
                              for _ in range(ocp.n_obs)], axis=0)
        py = jnp.concatenate([x[3 * i + 1: 3 * i + 2]
                              for i in range(nrob)
                              for _ in range(ocp.n_obs)], axis=0)
        dxo, dyo = px - mp["obs_x"], py - mp["obs_y"]
        dist = jnp.sqrt(dxo * dxo + dyo * dyo + 1e-12)
        c_blk = dist - mp["obs_k"]
        cnt = nrob * ocp.n_obs
        act = jnp.maximum(0.0, lam_k[row: row + cnt] - mu * c_blk)
        act = jnp.where(gate > 0.0, act, jnp.zeros_like(act))
        w = mu * (act > 0.0).astype(act.dtype)
        ux, uy = dxo / dist, dyo / dist
        uxa, uya = ux * act, uy * act
        wxx, wyy, wxy = w * ux * ux, w * uy * uy, w * ux * uy
        obs_blk = (uxa, uya, wxx, wyy, wxy)
        row += cnt

    # ---- moving-obstacle rows as one [m*n_mov, T] block ----
    mov_blk = None
    if ocp.n_mov:
        px = jnp.concatenate([x[3 * i: 3 * i + 1]
                              for i in range(nrob)
                              for _ in range(ocp.n_mov)], axis=0)
        py = jnp.concatenate([x[3 * i + 1: 3 * i + 2]
                              for i in range(nrob)
                              for _ in range(ocp.n_mov)], axis=0)
        mx = jnp.concatenate([mov_k[2 * o: 2 * o + 1]
                              for _ in range(nrob)
                              for o in range(ocp.n_mov)], axis=0)
        my = jnp.concatenate([mov_k[2 * o + 1: 2 * o + 2]
                              for _ in range(nrob)
                              for o in range(ocp.n_mov)], axis=0)
        dxm, dym = px - mx, py - my
        c_blk = dxm * dxm + dym * dym - prm[0, P.dmin2]
        cnt = nrob * ocp.n_mov
        act = jnp.maximum(0.0, lam_k[row: row + cnt] - mu * c_blk)
        act = jnp.where(gate > 0.0, act, jnp.zeros_like(act))
        w = mu * (act > 0.0).astype(act.dtype)
        gx, gy = 2.0 * dxm, 2.0 * dym
        mov_blk = (gx * act, gy * act, w * gx * gx, w * gy * gy, w * gx * gy)
        row += cnt

    # ---- u-box rows as [mc, T] blocks ----
    a_lo_u = jnp.maximum(0.0, lam_k[row: row + mc] - mu * (u - mp["u_lo"]))
    a_hi_u = jnp.maximum(0.0, lam_k[row + mc: row + 2 * mc]
                         - mu * (mp["u_hi"] - u))
    lu_blk = lu_blk - a_lo_u + a_hi_u
    du_blk = mu * ((a_lo_u > 0.0).astype(mu.dtype)
                   + (a_hi_u > 0.0).astype(mu.dtype))   # [mc, T]
    row += 2 * mc

    # ---- x-box rows as [n, T] blocks ----
    a_lo_x = jnp.maximum(0.0, lam_k[row: row + n] - mu * (x - mp["x_lo"]))
    a_hi_x = jnp.maximum(0.0, lam_k[row + n: row + 2 * n]
                         - mu * (mp["x_hi"] - x))
    a_lo_x = jnp.where(gate > 0.0, a_lo_x, jnp.zeros_like(a_lo_x))
    a_hi_x = jnp.where(gate > 0.0, a_hi_x, jnp.zeros_like(a_hi_x))
    dxd_blk = mu * ((a_lo_x > 0.0).astype(mu.dtype)
                    + (a_hi_x > 0.0).astype(mu.dtype))  # [n, T]

    # ---- assemble lx rows: block part + pair/obs/mov scatters ----
    lx_rows = [lx_blk[i: i + 1] - a_lo_x[i: i + 1] + a_hi_x[i: i + 1]
               for i in range(n)]
    if pair_blk is not None:
        (I, J, gxa, gya, *_rest) = pair_blk
        for p, (i, j) in enumerate(zip(I, J)):
            lx_rows[3 * i] = lx_rows[3 * i] - gxa[p: p + 1]
            lx_rows[3 * i + 1] = lx_rows[3 * i + 1] - gya[p: p + 1]
            lx_rows[3 * j] = lx_rows[3 * j] + gxa[p: p + 1]
            lx_rows[3 * j + 1] = lx_rows[3 * j + 1] + gya[p: p + 1]
    if obs_blk is not None:
        uxa, uya = obs_blk[0], obs_blk[1]
        for i in range(nrob):
            for o in range(ocp.n_obs):
                q = i * ocp.n_obs + o
                lx_rows[3 * i] = lx_rows[3 * i] - uxa[q: q + 1]
                lx_rows[3 * i + 1] = lx_rows[3 * i + 1] - uya[q: q + 1]
    if mov_blk is not None:
        gxa_m, gya_m = mov_blk[0], mov_blk[1]
        for i in range(nrob):
            for o in range(ocp.n_mov):
                q = i * ocp.n_mov + o
                lx_rows[3 * i] = lx_rows[3 * i] - gxa_m[q: q + 1]
                lx_rows[3 * i + 1] = lx_rows[3 * i + 1] - gya_m[q: q + 1]
    lx = jnp.stack(lx_rows, axis=0)                # [n, 1, T]
    lu = jnp.stack([lu_blk[i: i + 1] for i in range(mc)], axis=0)

    # ---- dense lxx from block slices ----
    He = {}
    for i in range(n):
        He[(i, i)] = 2.0 * mp["q"][i: i + 1] + dxd_blk[i: i + 1]

    def add(a, b, v):
        He[(a, b)] = He.get((a, b), zero) + v

    if pair_blk is not None:
        (I, J, _gxa, _gya, wxx, wyy, wxy, nwxx, nwyy, nwxy) = pair_blk
        for p, (i, j) in enumerate(zip(I, J)):
            xi_, yi_, xj_, yj_ = 3 * i, 3 * i + 1, 3 * j, 3 * j + 1
            sxx = wxx[p: p + 1]
            syy = wyy[p: p + 1]
            sxy = wxy[p: p + 1]
            add(xi_, xi_, sxx); add(yi_, yi_, syy)
            add(xj_, xj_, sxx); add(yj_, yj_, syy)
            add(xi_, yi_, sxy); add(yi_, xi_, sxy)
            add(xj_, yj_, sxy); add(yj_, xj_, sxy)
            add(xi_, xj_, nwxx[p: p + 1]); add(xj_, xi_, nwxx[p: p + 1])
            add(yi_, yj_, nwyy[p: p + 1]); add(yj_, yi_, nwyy[p: p + 1])
            add(xi_, yj_, nwxy[p: p + 1]); add(yj_, xi_, nwxy[p: p + 1])
            add(yi_, xj_, nwxy[p: p + 1]); add(xj_, yi_, nwxy[p: p + 1])
    if obs_blk is not None:
        wxx, wyy, wxy = obs_blk[2], obs_blk[3], obs_blk[4]
        for i in range(nrob):
            for o in range(ocp.n_obs):
                q = i * ocp.n_obs + o
                xi_, yi_ = 3 * i, 3 * i + 1
                add(xi_, xi_, wxx[q: q + 1])
                add(yi_, yi_, wyy[q: q + 1])
                add(xi_, yi_, wxy[q: q + 1])
                add(yi_, xi_, wxy[q: q + 1])
    if mov_blk is not None:
        wxx, wyy, wxy = mov_blk[2], mov_blk[3], mov_blk[4]
        for i in range(nrob):
            for o in range(ocp.n_mov):
                q = i * ocp.n_mov + o
                xi_, yi_ = 3 * i, 3 * i + 1
                add(xi_, xi_, wxx[q: q + 1])
                add(yi_, yi_, wyy[q: q + 1])
                add(xi_, yi_, wxy[q: q + 1])
                add(yi_, xi_, wxy[q: q + 1])

    def dense(entries, rows, cols):
        out = []
        for a in range(rows):
            out.append(jnp.concatenate(
                [entries.get((a, b), zero) for b in range(cols)], axis=0))
        return jnp.stack(out, axis=0)

    lxx = dense(He, n, n)

    Ue = {}
    for i in range(mc):
        Ue[(i, i)] = 2.0 * mp["r"][i: i + 1] + du_blk[i: i + 1]
    luu = dense(Ue, mc, mc)
    return e1, e2, bc, bs, lx, lu, lxx, luu


def make_kernel(ocp: OCP, P, cfg, blocked: bool):
    """The full adaptive-LS megakernel with selectable expansion impl."""
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
                if blocked:
                    e1, e2, bc, bs, lx, lu, lxx, luu = _expansion_regs_blocked(
                        ocp, P, prm, k, X_s[k], U_s[k], xref_ref[0, k],
                        lam_ref[0, k], mu, mp, None)
                else:
                    e1, e2, bc, bs, lx, lu, lxx, luu = _expansion_regs_perrow(
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

                def bt_rows(Mm):
                    rows = []
                    for r in range(nrob):
                        i0 = 3 * r
                        rows.append(bc[r][None] * Mm[i0: i0 + 1]
                                    + bs[r][None] * Mm[i0 + 1: i0 + 2])
                        rows.append(dt * Mm[i0 + 2: i0 + 3])
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

            def cost_of(alpha):
                def roll(k, carry):
                    x, cost = carry
                    u = _feedback_u(n, x, X_s[k], U_s[k], kff_s[k],
                                    Kfb_s[k], alpha)
                    cost = cost + _stage_merit(ocp, P, prm, k, x, u,
                                               xref_ref[0, k],
                                               lam_ref[0, k], mu, None, mp)
                    return (_euler_rows(ocp.m, x, u, prm[0, P.dt]), cost)
                _, c = jax.lax.fori_loop(0, N, roll, (x0, jnp.zeros_like(mu)))
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

            def accept(k, x):
                u = _feedback_u(n, x, X_s[k], U_s[k], kff_s[k],
                                Kfb_s[k], best_alpha)
                X_s[k] = x
                U_s[k] = u
                return _euler_rows(ocp.m, x, u, prm[0, P.dt])
            jax.lax.fori_loop(0, N, accept, x0)

            iters_ref[0] += 1.0
            cost_s[...] = jnp.where(best_alpha > 0.0, best_cost, cost_cur)
            return 0

        jax.lax.fori_loop(0, cfg.n_inner, inner, 0)

        def writeout(k, _):
            Uout_ref[0, k] = U_s[k]
            Xout_ref[0, k] = X_s[k]
            return 0

        jax.lax.fori_loop(0, N, writeout, 0)
        cost_ref[0] = cost_s[...]

    return kernel


def run(ocp, x0_l, xref_l, lam_l, mu_l, U_l, cfg, blocked):
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
    ] + [pltpu.VMEM((1, LANES), dtype)] * 6
    f = pl.pallas_call(
        make_kernel(ocp, P, cfg, blocked),
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
    cfg = ALILQRConfig(n_outer=1, n_inner=40, tol_con=1e-3, ls="adaptive")
    key = jax.random.PRNGKey(0)
    noise = 0.1 * jax.random.normal(key, (B, base.nx), base.x0.dtype)
    ob = batch_ocp(base, base.x0[None] + noise)

    tiles = B // LANES
    dtype = base.x0.dtype

    def to_lane(x):
        xt = jnp.moveaxis(x, 0, -1)
        xt = xt.reshape(*xt.shape[:-1], tiles, LANES)
        return jnp.moveaxis(xt, -2, 0)

    x0_l = to_lane(ob.x0[:, None])
    xref_l = to_lane(ob.xref)
    # nonzero duals so the activation branches do real work
    lam_l = jnp.abs(0.1 * jax.random.normal(
        jax.random.PRNGKey(7), (tiles, base.N, base.n_con, LANES), dtype))
    mu_l = jnp.full((tiles, 1, LANES), 10.0, dtype)
    U_l = 0.01 * jax.random.normal(
        jax.random.PRNGKey(3), (tiles, base.N, base.nu, LANES), dtype)

    print(f"B={B}, {cfg.n_inner} fixed iterations, backend="
          f"{jax.default_backend()}")
    out = {}
    for blocked in [False, True]:
        f = jax.jit(functools.partial(run, base, cfg=cfg, blocked=blocked))
        r = f(x0_l, xref_l, lam_l, mu_l, U_l)
        _ = float(r[2][0, 0, 0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(x0_l, xref_l, lam_l, mu_l, U_l)
            _ = float(r[2][0, 0, 0])
            ts.append(time.perf_counter() - t0)
        out[blocked] = r
        name = "blocked" if blocked else "per-row "
        print(f"{name}: {min(ts)*1e3:8.1f} ms")
    dU = float(jnp.max(jnp.abs(out[True][0] - out[False][0])))
    dc = float(jnp.max(jnp.abs(out[True][2] - out[False][2])))
    print(f"max |dU| = {dU:.2e}, max |dcost| = {dc:.2e}")


if __name__ == "__main__":
    main()
