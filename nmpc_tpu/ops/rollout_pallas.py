"""Pallas TPU kernels: fused line-search rollouts for the batched solver.

After fusing the Riccati sweep, profiling shows the parallel line search
dominates the AL-iLQR iteration (~29 ms of a ~30 ms inner step at B=4096):
eight vmapped `lax.scan` rollouts of tiny per-stage ops. These kernels fuse
the whole candidate evaluation — closed-loop rollout under the LQR gains,
stage cost, and the PHR penalty — into lane-major Pallas programs:

  * `linesearch_costs`: grid (batch-tiles, n_alphas); each instance rolls its
    alpha for 128 scenarios and emits the AL merit. Pass alpha 0 first and
    the current-iterate cost comes out of the same kernel.
  * `rollout_alpha`: rolls one per-element alpha (the line-search winner) and
    writes the accepted trajectory.

Numeric problem data (weights, bounds, dmin^2, dt, alphas) is passed through
an SMEM parameter vector — the kernels never close over traced values.

Supported problem class: plain stacked-unicycle Euler dynamics with pair
collision rows + control/state boxes (the multi-robot families). Problems
with obstacles / LiDAR rays / moving obstacles fall back to the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmpc_tpu.ocp.problem import OCP, pair_indices

LANES = 128


def supports(ocp: OCP) -> bool:
    """Problem class the fused kernels cover: stacked-unicycle Euler with
    pair / static-obstacle / moving-obstacle / box rows (LiDAR rays and
    user-supplied dynamics fall back to the XLA path). Moving-obstacle rows
    (time-indexed keep-out discs — the decentralized mode's neighbor plans,
    SURVEY.md §2.4) enter the kernels as a per-stage VMEM input."""
    return (
        ocp.num_rays == 0
        and ocp.integrator == "euler"
        and ocp.dyn_fn is None
    )


class _P:
    """Static offsets into the SMEM parameter vector."""

    def __init__(self, n, mc, n_alphas, n_obs=0):
        self.q = 0
        self.r = self.q + n
        self.u_lo = self.r + mc
        self.u_hi = self.u_lo + mc
        self.x_lo = self.u_hi + mc
        self.x_hi = self.x_lo + n
        self.dmin2 = self.x_hi + n
        self.dt = self.dmin2 + 1
        self.obs = self.dt + 1           # n_obs rows of (ox, oy, keepout)
        self.alphas = self.obs + 3 * n_obs
        self.size = self.alphas + n_alphas


def _pack_params(ocp: OCP, alphas):
    # obstacle rows pre-fold the radii: keepout = r_obs + r_rob + margin
    keepout = (ocp.obstacles[:, 2] + ocp.robot_radius + ocp.obs_margin
               ) if ocp.n_obs else jnp.zeros((0,), ocp.Qdiag.dtype)
    obs = (jnp.concatenate([ocp.obstacles[:, :2], keepout[:, None]], axis=1).reshape(-1)
           if ocp.n_obs else jnp.zeros((0,), ocp.Qdiag.dtype))
    return jnp.concatenate([
        ocp.Qdiag, ocp.Rdiag, ocp.u_lo, ocp.u_hi, ocp.x_lo, ocp.x_hi,
        ocp.dmin2[None], ocp.T[None], obs,
        jnp.asarray(alphas, ocp.Qdiag.dtype),
    ])[None, :]


def _feedback_u(nx, x, xbar, ubar, kffk, Kk, alpha):
    """u = ubar + alpha kff + K (x - xbar), lane-major unrolled."""
    dx = x - xbar
    acc = ubar + alpha * kffk[:, 0]
    for j in range(nx):
        acc = acc + Kk[:, j] * dx[j : j + 1]
    return acc


def _euler_rows(nrob, x, u, dt):
    rows = []
    for r in range(nrob):
        th = x[3 * r + 2 : 3 * r + 3]
        v = u[2 * r : 2 * r + 1]
        w = u[2 * r + 1 : 2 * r + 2]
        rows.append(x[3 * r : 3 * r + 1] + dt * v * jnp.cos(th))
        rows.append(x[3 * r + 1 : 3 * r + 2] + dt * v * jnp.sin(th))
        rows.append(th + dt * w)
    return jnp.concatenate(rows, axis=0)


def _merit_params(ocp: OCP, P, prm, like):
    """Loop-invariant lane-broadcast parameter blocks for the vectorized
    stage merit.

    Call ONCE per kernel invocation (`like` is any [1, T] lane vector, e.g.
    mu) and close over the result in the per-stage loops: the SMEM-scalar ->
    lane-vector broadcasts are then paid once per solve instead of once per
    constraint row per stage per line-search candidate."""
    n, mc, nrob = ocp.nx, ocp.nu, ocp.m
    one = jnp.ones_like(like)

    def vec(off, cnt):
        return jnp.concatenate(
            [prm[0, off + i] * one for i in range(cnt)], axis=0)

    mp = {
        "q": vec(P.q, n),
        "r": vec(P.r, mc),
        "u_lo": vec(P.u_lo, mc),
        "u_hi": vec(P.u_hi, mc),
        "x_lo": vec(P.x_lo, n),
        "x_hi": vec(P.x_hi, n),
    }
    if ocp.n_obs:
        # row order robot-major, obstacle-minor — matches the lam layout
        mp["obs_x"] = jnp.concatenate(
            [prm[0, P.obs + 3 * o] * one
             for _ in range(nrob) for o in range(ocp.n_obs)], axis=0)
        mp["obs_y"] = jnp.concatenate(
            [prm[0, P.obs + 3 * o + 1] * one
             for _ in range(nrob) for o in range(ocp.n_obs)], axis=0)
        mp["obs_k"] = jnp.concatenate(
            [prm[0, P.obs + 3 * o + 2] * one
             for _ in range(nrob) for o in range(ocp.n_obs)], axis=0)
    return mp


def _stage_merit(ocp: OCP, P, prm, k, x, u, xref_k, lam_k, mu, mov_k=None,
                 mp=None):
    """Lane-major AL merit contribution of one stage, block-vectorized.

    Penalty rows are evaluated as [rows, T] blocks (pairs / obstacles /
    moving obstacles / u-box / x-box) so the VPU processes 8 constraint rows
    per sublane-packed op instead of one [1, T] row at a time — the row-wise
    form left 7/8 of each vreg idle and was the measured line-search
    bottleneck (STATUS.md megakernel notes).

    mov_k: [2*n_mov, T] this stage's moving-obstacle positions (x0, y0, x1,
    y1, ...) when ocp.n_mov > 0. mp: precomputed `_merit_params` blocks
    (computed on the fly when None — pass it in hot loops)."""
    n, mc, nrob = ocp.nx, ocp.nu, ocp.m
    if mp is None:
        mp = _merit_params(ocp, P, prm, mu)
    dxr = x - xref_k
    cost = (jnp.sum(mp["q"] * dxr * dxr, axis=0, keepdims=True)
            + jnp.sum(mp["r"] * u * u, axis=0, keepdims=True))

    # stage-0 gate for state-dependent rows (constraint_mask semantics)
    gate = jnp.where(k == 0, jnp.zeros_like(mu), jnp.ones_like(mu))

    pen = jnp.zeros_like(mu)
    row = 0

    def phr_block(c_blk, row0, cnt, x_dep):
        act = jnp.maximum(0.0, lam_k[row0 : row0 + cnt] - mu * c_blk)
        if x_dep:
            # hard mask (not act * gate): a non-finite activation at k == 0
            # (e.g. NaN warm-start duals) must not leak into the merit
            act = jnp.where(gate > 0.0, act, jnp.zeros_like(act))
        return jnp.sum(act * act, axis=0, keepdims=True)

    if ocp.n_pairs:
        I, J = pair_indices(nrob)
        xi = jnp.concatenate([x[3 * i : 3 * i + 1] for i in I], axis=0)
        yi = jnp.concatenate([x[3 * i + 1 : 3 * i + 2] for i in I], axis=0)
        xj = jnp.concatenate([x[3 * j : 3 * j + 1] for j in J], axis=0)
        yj = jnp.concatenate([x[3 * j + 1 : 3 * j + 2] for j in J], axis=0)
        dx, dy = xi - xj, yi - yj
        c_blk = dx * dx + dy * dy - prm[0, P.dmin2]
        pen = pen + phr_block(c_blk, row, ocp.n_pairs, True)
        row += ocp.n_pairs
    if ocp.n_obs:      # obstacle rows: dist - keepout >= 0
        px = jnp.concatenate([x[3 * i : 3 * i + 1]
                              for i in range(nrob)
                              for _ in range(ocp.n_obs)], axis=0)
        py = jnp.concatenate([x[3 * i + 1 : 3 * i + 2]
                              for i in range(nrob)
                              for _ in range(ocp.n_obs)], axis=0)
        dx, dy = px - mp["obs_x"], py - mp["obs_y"]
        dist = jnp.sqrt(dx * dx + dy * dy + 1e-12)
        pen = pen + phr_block(dist - mp["obs_k"], row, nrob * ocp.n_obs, True)
        row += nrob * ocp.n_obs
    if ocp.n_mov:      # moving-obstacle rows: d2 - dmin2 >= 0
        px = jnp.concatenate([x[3 * i : 3 * i + 1]
                              for i in range(nrob)
                              for _ in range(ocp.n_mov)], axis=0)
        py = jnp.concatenate([x[3 * i + 1 : 3 * i + 2]
                              for i in range(nrob)
                              for _ in range(ocp.n_mov)], axis=0)
        mx = jnp.concatenate([mov_k[2 * o : 2 * o + 1]
                              for _ in range(nrob)
                              for o in range(ocp.n_mov)], axis=0)
        my = jnp.concatenate([mov_k[2 * o + 1 : 2 * o + 2]
                              for _ in range(nrob)
                              for o in range(ocp.n_mov)], axis=0)
        dx, dy = px - mx, py - my
        c_blk = dx * dx + dy * dy - prm[0, P.dmin2]
        pen = pen + phr_block(c_blk, row, nrob * ocp.n_mov, True)
        row += nrob * ocp.n_mov
    pen = pen + phr_block(u - mp["u_lo"], row, mc, False)
    row += mc
    pen = pen + phr_block(mp["u_hi"] - u, row, mc, False)
    row += mc
    pen = pen + phr_block(x - mp["x_lo"], row, n, True)
    row += n
    pen = pen + phr_block(mp["x_hi"] - x, row, n, True)
    row += n
    return cost + pen / (2.0 * mu)


def _make_cost_kernel(ocp: OCP, P):
    N, n = ocp.N, ocp.nx

    def kernel(prm, x0_ref, X_ref, U_ref, kff_ref, Kfb_ref, xref_ref, lam_ref,
               mu_ref, *rest):
        if ocp.n_mov:
            mov_ref, cost_ref, x_s = rest
        else:
            mov_ref, (cost_ref, x_s) = None, rest
        a = pl.program_id(1)
        alpha = prm[0, P.alphas + a]
        dt = prm[0, P.dt]
        x_s[...] = x0_ref[0, 0]
        mu = mu_ref[0]
        mp = _merit_params(ocp, P, prm, mu)

        def stage(k, acc):
            x = x_s[...]
            u = _feedback_u(n, x, X_ref[0, k], U_ref[0, k],
                            kff_ref[0, k], Kfb_ref[0, k], alpha)
            mov_k = None if mov_ref is None else mov_ref[0, k]
            merit = _stage_merit(ocp, P, prm, k, x, u, xref_ref[0, k],
                                 lam_ref[0, k], mu, mov_k, mp)
            x_s[...] = _euler_rows(ocp.m, x, u, dt)
            return acc + merit

        total = jax.lax.fori_loop(0, N, stage, jnp.zeros_like(mu))
        cost_ref[0, 0] = total

    return kernel


def _make_rollout_kernel(ocp: OCP, P):
    N, n = ocp.N, ocp.nx

    def kernel(prm, x0_ref, X_ref, U_ref, kff_ref, Kfb_ref, alpha_ref,
               Xout_ref, Uout_ref, x_s):
        dt = prm[0, P.dt]
        alpha = alpha_ref[0]
        x_s[...] = x0_ref[0, 0]

        def stage(k, _):
            x = x_s[...]
            u = _feedback_u(n, x, X_ref[0, k], U_ref[0, k],
                            kff_ref[0, k], Kfb_ref[0, k], alpha)
            x_next = _euler_rows(ocp.m, x, u, dt)
            Uout_ref[0, k] = u
            Xout_ref[0, k] = x_next
            x_s[...] = x_next
            return 0

        jax.lax.fori_loop(0, N, stage, 0)

    return kernel


def _to_lane(x, tiles):
    xt = jnp.moveaxis(x, 0, -1)
    xt = xt.reshape(*xt.shape[:-1], tiles, LANES)
    return jnp.moveaxis(xt, -2, 0)


def _from_lane(x, Bt):
    xt = jnp.moveaxis(x, 0, -2)
    xt = xt.reshape(*xt.shape[:-2], Bt)
    return jnp.moveaxis(xt, -1, 0)


def linesearch_costs_lanes(ocp: OCP, x0_l, X_l, U_l, kff_l, Kfb_l, xref_l,
                           lam_l, mu_l, alphas, mov_l=None, interpret=None):
    """Lane-major fused line search. Inputs [tiles, ..., LANES]:
    x0_l [t,1,n,L], X_l [t,N,n,L] (stage states), U_l [t,N,m,L],
    kff_l [t,N,m,1,L], Kfb_l [t,N,m,n,L], xref_l [t,N,n,L],
    lam_l [t,N,nc,L], mu_l [t,1,L], mov_l [t,N,2*n_mov,L] when n_mov > 0.
    Returns costs [n_alphas, tiles*LANES]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tiles = x0_l.shape[0]
    Bt = tiles * LANES
    N, n, mc = ocp.N, ocp.nx, ocp.nu
    A = len(alphas)
    dtype = x0_l.dtype
    P = _P(n, mc, A, ocp.n_obs)
    prm = _pack_params(ocp, alphas)
    ins = [prm, x0_l, X_l, U_l, kff_l, Kfb_l, xref_l, lam_l, mu_l]

    def vs(*dims):
        nd = len(dims)
        return pl.BlockSpec((1, *dims, LANES),
                            lambda i, a, nd=nd: (i,) + (0,) * (nd + 1),
                            memory_space=pltpu.VMEM)

    sm = pl.BlockSpec((1, P.size), lambda i, a: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [
        sm, vs(1, n), vs(N, n), vs(N, mc), vs(N, mc, 1), vs(N, mc, n),
        vs(N, n), vs(N, ocp.n_con),
        pl.BlockSpec((1, 1, LANES), lambda i, a: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    if ocp.n_mov:
        ins.append(mov_l)
        in_specs.append(vs(N, 2 * ocp.n_mov))
    costs = pl.pallas_call(
        _make_cost_kernel(ocp, P),
        grid=(tiles, A),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 1, LANES), lambda i, a: (i, a, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, A, 1, LANES), dtype),
        scratch_shapes=[pltpu.VMEM((n, LANES), dtype)],
        interpret=interpret,
    )(*ins)
    return jnp.moveaxis(costs[:, :, 0, :], 0, -2).reshape(A, Bt)


def linesearch_costs(ocp: OCP, x0, X, U, kff, Kfb, xref, lam, mu, alphas,
                     mov=None, interpret=None):
    """AL merit for every alpha: returns costs [n_alphas, Bt].
    Standard-layout wrapper of linesearch_costs_lanes. mov: [Bt, N, n_mov, 2]
    per-element moving-obstacle plans when ocp.n_mov > 0."""
    Bt = x0.shape[0]
    assert Bt % LANES == 0
    tiles = Bt // LANES
    N = ocp.N
    mov_l = (None if mov is None
             else _to_lane(mov.reshape(Bt, N, 2 * ocp.n_mov), tiles))
    return linesearch_costs_lanes(
        ocp,
        _to_lane(x0[:, None], tiles),
        _to_lane(X[:, :-1], tiles),
        _to_lane(U, tiles),
        _to_lane(kff[..., None, :].swapaxes(-1, -2), tiles),
        _to_lane(Kfb, tiles),
        _to_lane(xref, tiles),
        _to_lane(lam, tiles),
        _to_lane(mu[:, None], tiles),
        alphas,
        mov_l,
        interpret,
    )


def rollout_alpha_lanes(ocp: OCP, x0_l, X_l, U_l, kff_l, Kfb_l, alpha_l,
                        interpret=None):
    """Lane-major accepted-candidate rollout. alpha_l [tiles, 1, LANES].
    Returns (Xtail_l [t,N,n,L] — states 1..N, U_l_new [t,N,m,L])."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tiles = x0_l.shape[0]
    N, n, mc = ocp.N, ocp.nx, ocp.nu
    dtype = x0_l.dtype
    P = _P(n, mc, 1, ocp.n_obs)
    prm = _pack_params(ocp, (0.0,))
    ins = (prm, x0_l, X_l, U_l, kff_l, Kfb_l, alpha_l)

    def vs(*dims):
        nd = len(dims)
        return pl.BlockSpec((1, *dims, LANES),
                            lambda i, nd=nd: (i,) + (0,) * (nd + 1),
                            memory_space=pltpu.VMEM)

    sm = pl.BlockSpec((1, P.size), lambda i: (0, 0), memory_space=pltpu.SMEM)
    Xl, Ul = pl.pallas_call(
        _make_rollout_kernel(ocp, P),
        grid=(tiles,),
        in_specs=[sm, vs(1, n), vs(N, n), vs(N, mc), vs(N, mc, 1), vs(N, mc, n),
                  pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=(vs(N, n), vs(N, mc)),
        out_shape=(
            jax.ShapeDtypeStruct((tiles, N, n, LANES), dtype),
            jax.ShapeDtypeStruct((tiles, N, mc, LANES), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((n, LANES), dtype)],
        interpret=interpret,
    )(*ins)
    return Xl, Ul


def rollout_alpha(ocp: OCP, x0, X, U, kff, Kfb, alpha, interpret=None):
    """Accepted-candidate rollout: per-element alpha [Bt]. Returns
    (X_new [Bt,N+1,n], U_new [Bt,N,m]). Standard-layout wrapper."""
    Bt = x0.shape[0]
    assert Bt % LANES == 0
    tiles = Bt // LANES
    Xl, Ul = rollout_alpha_lanes(
        ocp,
        _to_lane(x0[:, None], tiles),
        _to_lane(X[:, :-1], tiles),
        _to_lane(U, tiles),
        _to_lane(kff[..., None, :].swapaxes(-1, -2), tiles),
        _to_lane(Kfb, tiles),
        _to_lane(alpha[:, None], tiles),
        interpret,
    )
    X_new = jnp.concatenate([x0[:, None], _from_lane(Xl, Bt)], axis=1)
    return X_new, _from_lane(Ul, Bt)
