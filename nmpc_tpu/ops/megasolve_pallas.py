"""Pallas TPU megakernel: the whole iLQR inner solve in one program.

The lane-major pipeline (expansions -> Riccati -> line search -> rollout)
still pays 4 kernel launches + HBM round-trips of the stage expansions per
iteration, and the engine remains latency-bound to B~32k. This kernel folds
the complete inner loop — n_inner iterations of: on-the-fly stage expansions
(recomputed, never materialized to HBM), backward Riccati sweep, all-alpha
line search with per-lane Armijo selection, and the accepted-alpha rollout —
into a single Pallas program per batch tile. Only the AL multiplier update
between outer steps stays outside (cheap elementwise XLA).

State lives in VMEM scratch for the whole solve: X stages, U, gains, value
function. VMEM ~ N*(n + m + nc + m*n)*512 B per tile (~2 MB at the bench
shape, ~8 MB at the six-robot N=35 shape).

Same problem class as the other fused kernels (pairs + obstacles + boxes,
Euler unicycle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmpc_tpu.ocp.problem import OCP, pair_indices
from nmpc_tpu.ops.rollout_pallas import (
    _P,
    _euler_rows,
    _feedback_u,
    _merit_params,
    _pack_params,
    _stage_merit,
    supports,  # noqa: F401
)
from nmpc_tpu.ops.riccati_pallas import _chol, _chol_solve, _mtm

LANES = 128

# v5e scoped-VMEM budget is 16 MiB per core. The formula in mega_fits is an
# *estimate* of the compiler's scoped-VMEM demand, inflated by the worst
# observed estimate-to-actual ratio before comparing against the physical
# budget, so a near-gate shape whose true demand exceeds 16 MiB falls back
# to the staged lane pipeline instead of hard-failing at compile time.
#
# Measured anchors (via --xla_tpu_scoped_vmem_limit_kib bisection — the
# Mosaic OOM error reports the exact requested stack size):
#   * round 3 (blocked expansions, per-entry assembly): ten-robot N=20
#     formula 15.0 MiB vs compiler-reported ~15.3 MB; the pre-structured-
#     sweep formula under-predicted by ~5% (17.0 est vs 17.8 measured) —
#     hence _CALIBRATION = 1.05.
#   * round 4 (matrix-form expansions): the SAME ten-robot N=20 kernel's
#     scoped stack allocation measured 10.35M (compiles at a 10.5 MiB
#     limit, fails at 9 MiB reporting 10.35M) — the matrix rewrite
#     RELEASED ~5 MB of live per-entry [1, T] values, so the unchanged
#     formula now over-predicts this shape by ~1.5x. The advisor's round-3
#     concern (new expansion-block transients pushing a near-gate shape
#     over) is therefore closed by measurement: the transients fit inside
#     the formula's existing margin with ~5 MiB to spare. _CALIBRATION
#     stays at the historical worst-case 1.05 (conservative: the gate may
#     send a would-fit shape to the staged path, never the reverse).
#     NOTE: the round-4 expansion dispatch routes m > _MAT_EXPANSION_MAX_M
#     back to the (faster at that shape) scatter path, so ten-robot's
#     actual demand is the round-3 ~15.3 MB figure again — which is the
#     number the formula+calibration were anchored against all along.
_VMEM_PHYSICAL_BYTES = 16 * 1024 * 1024
_CALIBRATION = 1.05  # worst measured actual/estimate ratio (17.8 / 17.0)


def mega_fits(ocp: OCP) -> bool:
    """Static estimate: does the whole-solve megakernel's VMEM footprint
    (scratch + double-buffered in/out blocks) fit the per-core budget?
    Shapes that don't fit run the staged lane pipeline instead, whose
    kernels chunk over stages."""
    N, n, mc, nc = ocp.N, ocp.nx, ocp.nu, ocp.n_con
    f = 4  # f32
    scratch = (N * (n + mc + mc + mc * n) + n + n * n) * LANES * f
    blocks_in = (n + N * n + N * nc + 1 + N * mc
                 + N * 2 * ocp.n_mov) * LANES * f
    blocks_out = (N * mc + N * n + 2) * LANES * f
    # register-spill stack of the backward-sweep body: the structured sweep
    # keeps VA/Qxx/lxx dense [n,n,T] plus the B-contraction temporaries
    # (dense A/B and their products no longer exist); plus the loop-invariant
    # _merit_params blocks (3(n+mc) + 3·m·n_obs lane rows) held for the
    # whole solve
    spill = (4 * n * n + 3 * mc * n + 3 * mc * mc
             + 3 * (n + mc) + 3 * ocp.m * ocp.n_obs) * LANES * f
    # transient gather blocks the vectorized merit builds per stage
    # (xi/yi/xj/yj for pairs, px/py for obstacles, px/py/mx/my for moving
    # obstacles) — live across one _stage_merit call
    merit_tmp = (4 * ocp.n_pairs + 2 * ocp.m * ocp.n_obs
                 + 4 * ocp.m * ocp.n_mov) * LANES * f
    estimate = scratch + spill + merit_tmp + 2 * (blocks_in + blocks_out)
    return estimate * _CALIBRATION < _VMEM_PHYSICAL_BYTES


# Shape-dependent expansion dispatch (round 4): the matrix form wins at the
# bench shapes (m <= 6: 62.9k -> 64.3k solves/s) but LOSES ~6% at m = 10,
# where [m, m, T] padding (10 rows over two 8-sublane blocks) and the
# m^2-slot multiplier gather outgrow the per-entry assembly they replace.
# Both paths are semantically identical (same AL expansions); the bound is
# the measured crossover.
_MAT_EXPANSION_MAX_M = 8


def _expansion_regs(ocp: OCP, P, prm, k, x, u, xr, lam_k, mu, mov_k=None,
                    mp=None):
    """Stage expansion in registers — dispatches between the matrix-form
    (m <= _MAT_EXPANSION_MAX_M) and per-entry scatter engines; see each
    implementation's docstring for the measured trade."""
    if ocp.m <= _MAT_EXPANSION_MAX_M:
        return _expansion_regs_mat(ocp, P, prm, k, x, u, xr, lam_k, mu,
                                   mov_k, mp)
    return _expansion_regs_scatter(ocp, P, prm, k, x, u, xr, lam_k, mu,
                                   mov_k, mp)


def _expansion_regs_scatter(ocp: OCP, P, prm, k, x, u, xr, lam_k, mu,
                            mov_k=None, mp=None):
    """Round-3 per-entry expansion path (pair-vector blocks + scattered
    lx/lxx/luu assembly), kept as the LARGE-m engine: at m > 8 the matrix
    form of `_expansion_regs_mat` pays more in [m, m, T] padding and the
    m^2-slot multiplier gather than the per-entry assembly it removes
    (measured, ten-robot N=20 B=4096: 13.9k solves/s here vs 12.9k on the
    matrix form; round-3 anchor 13.7k). Semantics identical to the
    matrix path.
    """
    if mp is None:
        mp = _merit_params(ocp, P, prm, mu)
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


def _expansion_regs_mat(ocp: OCP, P, prm, k, x, u, xr, lam_k, mu,
                        mov_k=None, mp=None):
    """Stage expansion in registers, block-vectorized (round 3).

    The unicycle Jacobians are never materialized dense: A = I + E with
    E[3r, 3r+2] = -dt v sinθ =: e1[r], E[3r+1, 3r+2] = dt v cosθ =: e2[r],
    and B has per-robot entries B[3r, 2r] = dt cosθ =: bc[r],
    B[3r+1, 2r] = dt sinθ =: bs[r], B[3r+2, 2r+1] = dt. The backward sweep
    consumes these [1, T] lane vectors directly (see `bwd`).

    Constraint rows are evaluated block-vectorized. Round 3 packed the
    activation/gradient/weight math into [rows, T] blocks (the per-row
    [1, T] form was 51% of kernel cycles, tools/exp_mega_phases.py);
    round 4 removes the remaining per-entry residue (gradient scatters
    into lx + dense lxx/luu assembly, ~30% of post-rewrite cycles): pair
    rows live as [m, m, T] antisymmetric/symmetric matrices, the lx
    scatter is one row-sum reduction per coordinate, obstacle/moving rows
    reduce per robot, and lxx/luu assemble from eye-masked diagonals plus
    [m, 1, T]-wide robot-block column slices — no [1, T] entry ops remain
    in the assembly.

    mp: precomputed `_merit_params` blocks (computed on the fly when
    None — pass it in hot loops)."""
    if mp is None:
        mp = _merit_params(ocp, P, prm, mu)
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
    # ---- pair rows in MATRIX form (round 4) ----
    # The round-3 blocked form still scattered gradients into lx and
    # assembled dense lxx/luu entry-by-entry ([1, T] granularity) — measured
    # at ~30% of kernel cycles post-rewrite (docs/ROOFLINE.md ablation).
    # Matrix form removes the per-entry residue: all pair quantities live as
    # [m, m, T] antisymmetric/symmetric matrices built with wide VPU ops;
    # the lx scatter becomes one row-sum reduction per coordinate, and the
    # pair Hessian becomes per-robot-block matrices assembled into dense
    # lxx with [m, 1, T]-wide column slices instead of 324 [1, T] entries.
    # The only remaining per-entry work is gathering the packed pair
    # multipliers into the symmetric [m, m, T] matrix (upper rows are
    # contiguous slices of lam; lower entries are single-row gathers).
    Bxx = Byy = Bxy = None       # [m, m, T] off-diagonal robot-block Hessians
    grad_x = grad_y = None       # [m, T] summed lx gradient contributions
    Dxx = Dyy = Dxy = None       # [m, T] diagonal-block Hessian additions
    if ocp.n_pairs:
        xv = jnp.concatenate([x[3 * i: 3 * i + 1] for i in range(nrob)], axis=0)
        yv = jnp.concatenate([x[3 * i + 1: 3 * i + 2] for i in range(nrob)], axis=0)
        dxm = xv[:, None, :] - xv[None, :, :]      # [m, m, T], antisymmetric
        dym = yv[:, None, :] - yv[None, :, :]
        c_mat = dxm * dxm + dym * dym - prm[0, P.dmin2]
        # symmetric multiplier matrix from the packed pair rows: row i =
        # [pairs (j, i) for j < i] ++ [0] ++ [pairs (i, j) for j > i]; the
        # upper part is one contiguous lam slice
        offs, o = [], row
        for i in range(nrob):
            offs.append(o)
            o += nrob - 1 - i
        lam_rows = []
        for i in range(nrob):
            parts = []
            for j in range(i):
                p = offs[j] + (i - j - 1)
                parts.append(lam_k[p: p + 1])
            parts.append(jnp.zeros_like(mu))
            if i + 1 < nrob:
                parts.append(lam_k[offs[i]: offs[i] + (nrob - 1 - i)])
            lam_rows.append(jnp.concatenate(parts, axis=0)
                            if len(parts) > 1 else parts[0])
        lam_mat = jnp.stack(lam_rows, axis=0)      # [m, m, T]
        ri = jax.lax.broadcasted_iota(jnp.int32, (nrob, nrob, 1), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (nrob, nrob, 1), 1)
        offdiag = (ri != ci).astype(x.dtype)       # [m, m, 1]
        act = jnp.maximum(0.0, lam_mat - mu * c_mat) * offdiag
        act = jnp.where(gate > 0.0, act, jnp.zeros_like(act))
        w = mu * (act > 0.0).astype(act.dtype)
        gx, gy = 2.0 * dxm, 2.0 * dym
        gxa, gya = gx * act, gy * act              # antisymmetric
        wxx, wyy, wxy = w * gx * gx, w * gy * gy, w * gx * gy  # symmetric
        # lx row 3i picks up -sum_j gxa[i, j] (covers both pair orientations
        # via antisymmetry); Hessian diag blocks pick up the row sums
        grad_x = jnp.sum(gxa, axis=1)              # [m, T]
        grad_y = jnp.sum(gya, axis=1)
        Dxx = jnp.sum(wxx, axis=1)
        Dyy = jnp.sum(wyy, axis=1)
        Dxy = jnp.sum(wxy, axis=1)
        Bxx, Byy, Bxy = -wxx, -wyy, -wxy
        row += ocp.n_pairs

    def _acc(base, add):
        return add if base is None else base + add

    def _robot_sums(blk, per):
        """[m*per, T] robot-major block -> [m, T] per-robot row sums."""
        if per == 1:
            return blk
        return jnp.concatenate(
            [jnp.sum(blk[i * per: (i + 1) * per], axis=0, keepdims=True)
             for i in range(nrob)], axis=0)

    # ---- obstacle rows as one [m*n_obs, T] block, reduced per robot ----
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
        grad_x = _acc(grad_x, _robot_sums(ux * act, ocp.n_obs))
        grad_y = _acc(grad_y, _robot_sums(uy * act, ocp.n_obs))
        Dxx = _acc(Dxx, _robot_sums(w * ux * ux, ocp.n_obs))
        Dyy = _acc(Dyy, _robot_sums(w * uy * uy, ocp.n_obs))
        Dxy = _acc(Dxy, _robot_sums(w * ux * uy, ocp.n_obs))
        row += cnt

    # ---- moving-obstacle rows as one [m*n_mov, T] block, reduced per robot ----
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
        dxv, dyv = px - mx, py - my
        c_blk = dxv * dxv + dyv * dyv - prm[0, P.dmin2]
        cnt = nrob * ocp.n_mov
        act = jnp.maximum(0.0, lam_k[row: row + cnt] - mu * c_blk)
        act = jnp.where(gate > 0.0, act, jnp.zeros_like(act))
        w = mu * (act > 0.0).astype(act.dtype)
        gx, gy = 2.0 * dxv, 2.0 * dyv
        grad_x = _acc(grad_x, _robot_sums(gx * act, ocp.n_mov))
        grad_y = _acc(grad_y, _robot_sums(gy * act, ocp.n_mov))
        Dxx = _acc(Dxx, _robot_sums(w * gx * gx, ocp.n_mov))
        Dyy = _acc(Dyy, _robot_sums(w * gy * gy, ocp.n_mov))
        Dxy = _acc(Dxy, _robot_sums(w * gx * gy, ocp.n_mov))
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

    # ---- assemble lx: wide block ops + one interleave of the row sums ----
    lx_full = lx_blk - a_lo_x + a_hi_x             # [n, T]
    if grad_x is not None:
        zrow = jnp.zeros_like(mu)
        g_rows = []
        for a in range(nrob):
            g_rows += [grad_x[a: a + 1], grad_y[a: a + 1], zrow]
        lx_full = lx_full - jnp.concatenate(g_rows, axis=0)
    lx = lx_full[:, None, :]                       # [n, 1, T]
    lu = lu_blk[:, None, :]                        # [mc, 1, T]

    # ---- dense lxx: eye-masked diagonal + interleaved robot blocks ----
    rin = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    cin = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    diag_full = 2.0 * mp["q"] + dxd_blk            # [n, T]
    lxx = (rin == cin).astype(x.dtype) * diag_full[:, None, :]
    if grad_x is not None:
        if Bxx is None:
            zmat = jnp.zeros((nrob, nrob, mu.shape[-1]), x.dtype)
            Bxx = Byy = Bxy = zmat
        rim = jax.lax.broadcasted_iota(jnp.int32, (nrob, nrob, 1), 0)
        cim = jax.lax.broadcasted_iota(jnp.int32, (nrob, nrob, 1), 1)
        eyem = (rim == cim).astype(x.dtype)        # [m, m, 1]
        Bxx = Bxx + eyem * Dxx[:, None, :]
        Byy = Byy + eyem * Dyy[:, None, :]
        Bxy = Bxy + eyem * Dxy[:, None, :]
        # column-interleave the robot-block matrices to [m, n, T] row
        # groups, then row-interleave to [n, n, T] — [m, 1, T] / [1, n, T]
        # wide slice concats, never [1, T] entries
        colZ = jnp.zeros_like(Bxx[:, :1])
        xcols, ycols = [], []
        for b in range(nrob):
            xcols += [Bxx[:, b: b + 1], Bxy[:, b: b + 1], colZ]
            ycols += [Bxy[:, b: b + 1], Byy[:, b: b + 1], colZ]
        row_x = jnp.concatenate(xcols, axis=1)     # [m, n, T]
        row_y = jnp.concatenate(ycols, axis=1)
        row_z = jnp.zeros_like(row_x[:1])          # [1, n, T]
        rows_out = []
        for a in range(nrob):
            rows_out += [row_x[a: a + 1], row_y[a: a + 1], row_z]
        lxx = lxx + jnp.concatenate(rows_out, axis=0)

    # ---- luu: diagonal only ----
    riu = jax.lax.broadcasted_iota(jnp.int32, (mc, mc, 1), 0)
    ciu = jax.lax.broadcasted_iota(jnp.int32, (mc, mc, 1), 1)
    luu_d = 2.0 * mp["r"] + du_blk                 # [mc, T]
    luu = (riu == ciu).astype(x.dtype) * luu_d[:, None, :]
    return e1, e2, bc, bs, lx, lu, lxx, luu


def _make_megakernel(ocp: OCP, P, cfg):
    N, n, mc = ocp.N, ocp.nx, ocp.nu
    reg = cfg.reg
    alphas = tuple(cfg.alphas)
    adaptive = cfg.ls == "adaptive"

    def kernel(prm, x0_ref, xref_ref, lam_ref, mu_ref, Uin_ref, *rest):
        if ocp.n_mov:
            mov_ref = rest[0]
            rest = rest[1:]
        else:
            mov_ref = None
        if adaptive:
            (Uout_ref, Xout_ref, cost_ref, iters_ref,
             X_s, U_s, kff_s, Kfb_s, Vx_s, Vxx_s, cost_s, done_s,
             trial_s, acc_s, bcost_s, balpha_s) = rest
        else:
            (Uout_ref, Xout_ref, cost_ref, iters_ref,
             X_s, U_s, kff_s, Kfb_s, Vx_s, Vxx_s, cost_s, done_s) = rest

        def mov_at(k):
            return None if mov_ref is None else mov_ref[0, k]

        mu = mu_ref[0]                     # [1, T]
        x0 = x0_ref[0, 0]                  # [n, T]
        iters_ref[0] = jnp.zeros_like(mu)
        mp = _merit_params(ocp, P, prm, mu)

        # ---- initial rollout of warm controls + merit ----
        def init_roll(k, carry):
            x, cost = carry
            u = Uin_ref[0, k]
            U_s[k] = u
            X_s[k] = x
            cost = cost + _stage_merit(ocp, P, prm, k, x, u,
                                       xref_ref[0, k], lam_ref[0, k], mu,
                                       mov_at(k), mp)
            return (_euler_rows(ocp.m, x, u, prm[0, P.dt]), cost)

        _, cost0 = jax.lax.fori_loop(0, N, init_roll,
                                     (x0, jnp.zeros_like(mu)))
        cost_s[...] = cost0
        done_s[...] = jnp.zeros_like(mu)
        if adaptive:
            trial_s[...] = jnp.ones_like(mu)

        # once every lane of the tile has converged, whole iterations are
        # skipped (a converged iteration is a no-op by construction:
        # alpha = 0 reproduces the nominal trajectory exactly)
        def inner_guarded(it, _):
            @pl.when(jnp.logical_not(jnp.all(done_s[...] > 0.5)))
            def _body():
                inner()

            return 0

        def inner():
            cost_cur, done = cost_s[...], done_s[...]  # [1,T] (1.0 = done)

            # ---- backward sweep with on-the-fly expansions ----
            Vx_s[...] = jnp.zeros_like(Vx_s)
            Vxx_s[...] = jnp.zeros_like(Vxx_s)

            def bwd(t, dV1):
                k = N - 1 - t
                e1, e2, bc, bs, lx, lu, lxx, luu = _expansion_regs(
                    ocp, P, prm, k, X_s[k], U_s[k], xref_ref[0, k],
                    lam_ref[0, k], mu, mov_at(k), mp)
                dt = prm[0, P.dt]
                nrob = ocp.m
                Vx = Vx_s[...]             # [n, 1, T]
                Vxx = Vxx_s[...]           # [n, n, T]

                # A = I + E (E nonzero only in columns 3r+2), so every dense
                # product with A collapses to a copy plus per-robot rank-1
                # row/column updates; B likewise has 3 entries per robot.
                # VA = Vxx @ A: only columns 3r+2 pick up corrections.
                va_cols = [Vxx[:, j : j + 1] for j in range(n)]
                for r in range(nrob):
                    va_cols[3 * r + 2] = (
                        va_cols[3 * r + 2]
                        + Vxx[:, 3 * r : 3 * r + 1] * e1[r][None]
                        + Vxx[:, 3 * r + 1 : 3 * r + 2] * e2[r][None])
                VA = jnp.concatenate(va_cols, axis=1)

                # Qx = lx + A^T Vx; Qxx = lxx + A^T VA: rows 3r+2 corrected.
                qx_rows = [lx[i : i + 1] + Vx[i : i + 1] for i in range(n)]
                qxx_rows = [lxx[i : i + 1] + VA[i : i + 1] for i in range(n)]
                for r in range(nrob):
                    i0, i1, i2 = 3 * r, 3 * r + 1, 3 * r + 2
                    qx_rows[i2] = (qx_rows[i2]
                                   + e1[r][None] * Vx[i0 : i0 + 1]
                                   + e2[r][None] * Vx[i1 : i1 + 1])
                    qxx_rows[i2] = (qxx_rows[i2]
                                    + e1[r][None] * VA[i0 : i0 + 1]
                                    + e2[r][None] * VA[i1 : i1 + 1])
                Qx = jnp.concatenate(qx_rows, axis=0)
                Qxx = jnp.concatenate(qxx_rows, axis=0)

                # B^T contractions: row 2r = bc*row(3r) + bs*row(3r+1),
                # row 2r+1 = dt*row(3r+2) of the left operand.
                def bt_rows(M):
                    rows = []
                    for r in range(nrob):
                        i0 = 3 * r
                        rows.append(bc[r][None] * M[i0 : i0 + 1]
                                    + bs[r][None] * M[i0 + 1 : i0 + 2])
                        rows.append(dt * M[i0 + 2 : i0 + 3])
                    return jnp.concatenate(rows, axis=0)

                Qu = lu + bt_rows(Vx)
                Qux = bt_rows(VA)          # lux = 0 for this class
                # VB = Vxx @ B, then Quu = luu + B^T VB.
                vb_cols = []
                for r in range(nrob):
                    j0 = 3 * r
                    vb_cols.append(bc[r][None] * Vxx[:, j0 : j0 + 1]
                                   + bs[r][None] * Vxx[:, j0 + 1 : j0 + 2])
                    vb_cols.append(dt * Vxx[:, j0 + 2 : j0 + 3])
                Quu = luu + bt_rows(jnp.concatenate(vb_cols, axis=1))
                L = _chol(Quu, reg)
                sol = _chol_solve(L, jnp.concatenate([Qu, Qux], axis=1))
                kff = -sol[:, :1]
                Kfb = -sol[:, 1:]
                kff_s[k] = kff
                Kfb_s[k] = Kfb
                Vx_s[...] = Qx + _mtm(Qux, kff)
                # Qux' Kfb = -Qux' Quu^-1 Qux is symmetric by construction
                # (Quu SPD), so one _mtm suffices — the old
                # 0.5 (_mtm(Qux,Kfb) + _mtm(Kfb,Qux)) "symmetrization" paid
                # a second [n,n,T] product to reproduce the same matrix up
                # to f32 rounding (measured: no accuracy change, the sweep
                # is the fixed-cost bound of the adaptive-LS megakernel)
                Vxx_s[...] = Qxx + _mtm(Qux, Kfb)
                return dV1 + jnp.sum(kff * Qu, axis=0)  # [1, T]

            dV1 = jax.lax.fori_loop(0, N, bwd, jnp.zeros_like(mu))

            # ---- line search: evaluate each alpha, keep per-lane best ----
            def cost_of(alpha):
                def roll(k, carry):
                    x, cost = carry
                    u = _feedback_u(n, x, X_s[k], U_s[k], kff_s[k],
                                    Kfb_s[k], alpha)
                    cost = cost + _stage_merit(ocp, P, prm, k, x, u,
                                               xref_ref[0, k], lam_ref[0, k],
                                               mu, mov_at(k), mp)
                    return (_euler_rows(ocp.m, x, u, prm[0, P.dt]), cost)

                _, c = jax.lax.fori_loop(0, N, roll, (x0, jnp.zeros_like(mu)))
                return c

            if adaptive:
                # carried per-lane trial step, first-accept Armijo: each
                # round rolls ONE candidate chain whose alpha differs per
                # lane; rounds are skipped tile-wide once every lane has
                # accepted (cost_of takes a [1, T] alpha — _feedback_u
                # broadcasts it). Lanes that already accepted roll alpha 0
                # (reproduces the nominal; cannot re-accept since
                # ca == cost_cur fails ca < cost_cur).
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

                best_cost = bcost_s[...]
                best_alpha = balpha_s[...]
                # next iteration: accepted lanes start at the grown step;
                # failed lanes keep the shrunk trial (fail-continue — they
                # retry deeper next iteration rather than being marked done)
                trial_s[...] = jnp.where(
                    best_alpha > 0.0,
                    jnp.minimum(1.0, best_alpha * cfg.ls_grow),
                    trial_s[...])
            else:
                best_cost = cost_cur
                best_alpha = jnp.zeros_like(mu)
                for ai, a in enumerate(alphas):
                    ca = cost_of(a)
                    expected = cfg.armijo * a * jnp.maximum(-dV1, 0.0)
                    ok = ((cost_cur - ca) >= expected) & (ca < best_cost)
                    best_cost = jnp.where(ok, ca, best_cost)
                    best_alpha = jnp.where(ok, a, best_alpha)

            improved = best_alpha > 0.0
            alpha_l = jnp.where(done > 0.5, 0.0, best_alpha)

            # ---- accepted rollout (alpha = 0 reproduces the nominal) ----
            def accept(k, x):
                u = _feedback_u(n, x, X_s[k], U_s[k], kff_s[k],
                                Kfb_s[k], alpha_l)
                X_s[k] = x
                U_s[k] = u
                return _euler_rows(ocp.m, x, u, prm[0, P.dt])

            jax.lax.fori_loop(0, N, accept, x0)

            cost_new = jnp.where(done > 0.5, cost_cur,
                                 jnp.where(improved, best_cost, cost_cur))
            rel = (cost_cur - cost_new) / (1.0 + jnp.abs(cost_cur))
            if adaptive:
                # fail-continue: an unimproved lane stays active (it retries
                # at a deeper carried trial next iteration) until the trial
                # is exhausted — the analog of the cascade's full alpha grid
                give_up = (~improved) & (trial_s[...] <= cfg.ls_trial_min)
                # boolean algebra, not a select on i1 vectors — Mosaic
                # rejects select_n between bool operands (i8->i1 trunc)
                stop = (improved & (rel < cfg.tol_cost)) | give_up
                done = jnp.maximum(done, jnp.where(stop, 1.0, 0.0))
            else:
                done = jnp.maximum(done, jnp.where(
                    (~improved) | (rel < cfg.tol_cost), 1.0, 0.0))
            iters_ref[0] += jnp.where(done > 0.5, 0.0, 1.0)
            cost_s[...] = cost_new
            done_s[...] = done

        jax.lax.fori_loop(0, cfg.n_inner, inner_guarded, 0)

        def writeout(k, _):
            Uout_ref[0, k] = U_s[k]
            Xout_ref[0, k] = X_s[k]
            return 0

        jax.lax.fori_loop(0, N, writeout, 0)
        cost_ref[0] = cost_s[...]

    return kernel


def _make_al_update_kernel(ocp: OCP, P, lam_max: float, big: float):
    """AL multiplier update + max-violation, lane-major.

    Replicates solver.alilqr_batched's per-outer XLA phase
    (masked_trajectory_constraints -> lam = clip(max(0, lam - mu c), 0,
    lam_max); viol = max(0, -min c)) without leaving the lane layout — the
    stage-0 state-row mask (ocp/problem.constraint_mask) is applied by
    substituting c = BIG, exactly like masked_trajectory_constraints."""
    N, n, mc, nrob = ocp.N, ocp.nx, ocp.nu, ocp.m

    def kernel(prm, Xs_ref, U_ref, lam_ref, mu_ref, *rest):
        if ocp.n_mov:
            mov_ref, lam_out, viol_ref = rest
        else:
            mov_ref, (lam_out, viol_ref) = None, rest
        mu = mu_ref[0]                                   # [1, T]

        def stage(k, cmin):
            x = Xs_ref[0, k]
            u = U_ref[0, k]
            lam_k = lam_ref[0, k]                        # [nc, T]
            rows = []
            if ocp.n_pairs:
                for (i, j) in zip(*pair_indices(nrob)):
                    dx = x[3 * i : 3 * i + 1] - x[3 * j : 3 * j + 1]
                    dy = x[3 * i + 1 : 3 * i + 2] - x[3 * j + 1 : 3 * j + 2]
                    c = dx * dx + dy * dy - prm[0, P.dmin2]
                    rows.append(jnp.where(k == 0, big, c))
            for i in range(nrob):
                for o in range(ocp.n_obs):
                    dx = x[3 * i : 3 * i + 1] - prm[0, P.obs + 3 * o]
                    dy = x[3 * i + 1 : 3 * i + 2] - prm[0, P.obs + 3 * o + 1]
                    dist = jnp.sqrt(jnp.maximum(dx * dx + dy * dy, 1e-12))
                    c = dist - prm[0, P.obs + 3 * o + 2]
                    rows.append(jnp.where(k == 0, big, c))
            for i in range(nrob):
                for o in range(ocp.n_mov):
                    mov_k = mov_ref[0, k]
                    dx = x[3 * i : 3 * i + 1] - mov_k[2 * o : 2 * o + 1]
                    dy = x[3 * i + 1 : 3 * i + 2] - mov_k[2 * o + 1 : 2 * o + 2]
                    c = dx * dx + dy * dy - prm[0, P.dmin2]
                    rows.append(jnp.where(k == 0, big, c))
            for i in range(mc):
                rows.append(u[i : i + 1] - prm[0, P.u_lo + i])
            for i in range(mc):
                rows.append(prm[0, P.u_hi + i] - u[i : i + 1])
            for i in range(n):
                c = x[i : i + 1] - prm[0, P.x_lo + i]
                rows.append(jnp.where(k == 0, big, c))
            for i in range(n):
                c = prm[0, P.x_hi + i] - x[i : i + 1]
                rows.append(jnp.where(k == 0, big, c))
            c_all = jnp.concatenate(rows, axis=0)        # [nc, T]
            act = jnp.maximum(0.0, lam_k - mu * c_all)
            lam_out[0, k] = jnp.minimum(act, lam_max)
            return jnp.minimum(cmin, jnp.min(c_all, axis=0, keepdims=True))

        cmin = jax.lax.fori_loop(0, N, stage, jnp.full_like(mu, big))
        viol_ref[0] = jnp.maximum(0.0, -cmin)

    return kernel


def al_update_lanes(ocp: OCP, Xs_l, U_l, lam_l, mu_l, lam_max: float,
                    mov_l=None, interpret=None):
    """Lane-major AL outer update: (lam_new_l [t,N,nc,L], viol_l [t,1,L])."""
    from nmpc_tpu.ocp.problem import BIG

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tiles = Xs_l.shape[0]
    N, n, mc = ocp.N, ocp.nx, ocp.nu
    dtype = Xs_l.dtype
    P = _P(n, mc, 1, ocp.n_obs)
    prm = _pack_params(ocp, (0.0,))

    def vs(nstg, *dims):
        nd = len(dims)
        return pl.BlockSpec((1, nstg, *dims, LANES),
                            lambda i, nd=nd: (i,) + (0,) * (nd + 2),
                            memory_space=pltpu.VMEM)

    lane = pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sm = pl.BlockSpec((1, P.size), lambda i: (0, 0), memory_space=pltpu.SMEM)

    ins = [prm, Xs_l, U_l, lam_l, mu_l]
    in_specs = [sm, vs(N, n), vs(N, mc), vs(N, ocp.n_con), lane]
    if ocp.n_mov:
        ins.append(mov_l)
        in_specs.append(vs(N, 2 * ocp.n_mov))
    lam_new, viol = pl.pallas_call(
        _make_al_update_kernel(ocp, P, lam_max, BIG),
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=(vs(N, ocp.n_con), lane),
        out_shape=(
            jax.ShapeDtypeStruct((tiles, N, ocp.n_con, LANES), dtype),
            jax.ShapeDtypeStruct((tiles, 1, LANES), dtype),
        ),
        interpret=interpret,
    )(*ins)
    return lam_new, viol


def inner_solve_fused(ocp: OCP, x0_l, xref_l, lam_l, mu_l, U_l, cfg,
                      mov_l=None, interpret=None):
    """One fused inner iLQR solve (n_inner iterations) per batch tile.

    x0_l [t,1,n,L], xref_l [t,N,n,L], lam_l [t,N,nc,L], mu_l [t,1,L],
    U_l [t,N,m,L], mov_l [t,N,2*n_mov,L] when ocp.n_mov > 0
    -> (Xs_l [t,N,n,L] stage states, U_l [t,N,m,L],
    cost [t,1,L], iters [t,1,L])."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
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

    lane = pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sm = pl.BlockSpec((1, P.size), lambda i: (0, 0), memory_space=pltpu.SMEM)

    ins = [prm, x0_l, xref_l, lam_l, mu_l, U_l]
    in_specs = [sm, vs(1, n), vs(N, n), vs(N, ocp.n_con), lane, vs(N, mc)]
    if ocp.n_mov:
        ins.append(mov_l)
        in_specs.append(vs(N, 2 * ocp.n_mov))
    scratch = [
        pltpu.VMEM((N, n, LANES), dtype),        # X stages
        pltpu.VMEM((N, mc, LANES), dtype),       # U
        pltpu.VMEM((N, mc, 1, LANES), dtype),    # kff
        pltpu.VMEM((N, mc, n, LANES), dtype),    # Kfb
        pltpu.VMEM((n, 1, LANES), dtype),        # Vx
        pltpu.VMEM((n, n, LANES), dtype),        # Vxx
        pltpu.VMEM((1, LANES), dtype),           # merit (current iterate)
        pltpu.VMEM((1, LANES), dtype),           # per-lane done flags
    ]
    if cfg.ls == "adaptive":
        scratch += [
            pltpu.VMEM((1, LANES), dtype),       # carried trial alpha
            pltpu.VMEM((1, LANES), dtype),       # round: accepted flags
            pltpu.VMEM((1, LANES), dtype),       # round: best merit
            pltpu.VMEM((1, LANES), dtype),       # round: accepted alpha
        ]
    U_out, Xs_l, cost, iters = pl.pallas_call(
        _make_megakernel(ocp, P, cfg),
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=(vs(N, mc), vs(N, n), lane, lane),
        out_shape=(
            jax.ShapeDtypeStruct((tiles, N, mc, LANES), dtype),
            jax.ShapeDtypeStruct((tiles, N, n, LANES), dtype),
            jax.ShapeDtypeStruct((tiles, 1, LANES), dtype),
            jax.ShapeDtypeStruct((tiles, 1, LANES), dtype),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*ins)
    return Xs_l, U_out, cost, iters
