"""Pallas TPU kernel: fused AL-iLQR stage expansions.

Computes, for every stage and every scenario lane, the quantities the
backward sweep consumes — dynamics Jacobians (A, B) and the AL-merit
gradients / Gauss-Newton Hessians (lx, lu, lxx, luu, lux) — exploiting the
closed-form constraint structure (nmpc_tpu/ocp/jacobians.py):

  * box rows touch only the diagonal of lxx / luu;
  * pair rows are rank-1 with 4 static nonzeros, so their J' W J outer
    products are 16 static entry accumulations instead of an [n_con, n]
    dense product;
  * this problem class has no x-u constraint coupling: lux = 0.

Matrices are assembled as dictionaries of [1, T] lane-vector entries at
static coordinates, stacked once per stage — no scalar stores, no scatters,
no transposes. Same supported class as rollout_pallas (pairs + boxes, Euler
unicycle); parameters arrive via the SMEM vector. Outputs are lane-major,
ready for riccati_pallas without re-transposition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmpc_tpu.ocp.problem import OCP, pair_indices
from nmpc_tpu.ops.rollout_pallas import _P, _pack_params, supports  # noqa: F401

LANES = 128


def _dense(entries, rows, cols, zero):
    """Stack a {(r, c): [1, T]} dict into [rows, cols, T]."""
    out_rows = []
    for a in range(rows):
        out_rows.append(
            jnp.concatenate([entries.get((a, b), zero) for b in range(cols)], axis=0)
        )
    return jnp.stack(out_rows, axis=0)


def _make_expansion_kernel(ocp: OCP, P, n_stages, stage_offset=0):
    N, n, mc, nrob = n_stages, ocp.nx, ocp.nu, ocp.m
    pairs = list(zip(*pair_indices(nrob))) if ocp.n_pairs else []

    def kernel(prm, X_ref, U_ref, xref_ref, lam_ref, mu_ref, *rest):
        if ocp.n_mov:
            mov_ref = rest[0]
            rest = rest[1:]
        else:
            mov_ref = None
        A_ref, B_ref, lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref = rest
        dt = prm[0, P.dt]
        mu = mu_ref[0]           # [1, T]

        def stage(k, _):
            x = X_ref[0, k]      # [n, T]
            u = U_ref[0, k]      # [mc, T]
            xr = xref_ref[0, k]
            lam_k = lam_ref[0, k]  # [nc, T]
            zero = jnp.zeros_like(mu)
            one = jnp.ones_like(mu)

            # ---- dynamics Jacobians (Euler unicycle, closed form) ----
            Ae, Be = {}, {}
            for r in range(nrob):
                th = x[3 * r + 2 : 3 * r + 3]
                v = u[2 * r : 2 * r + 1]
                c, s = jnp.cos(th), jnp.sin(th)
                Ae[(3 * r, 3 * r)] = one
                Ae[(3 * r + 1, 3 * r + 1)] = one
                Ae[(3 * r + 2, 3 * r + 2)] = one
                Ae[(3 * r, 3 * r + 2)] = -dt * v * s
                Ae[(3 * r + 1, 3 * r + 2)] = dt * v * c
                Be[(3 * r, 2 * r)] = dt * c
                Be[(3 * r + 1, 2 * r)] = dt * s
                Be[(3 * r + 2, 2 * r + 1)] = dt * one
            A_ref[0, k] = _dense(Ae, n, n, zero)
            B_ref[0, k] = _dense(Be, n, mc, zero)

            # ---- gradients and GN Hessians ----
            lx_rows = [2.0 * prm[0, P.q + i] * (x[i : i + 1] - xr[i : i + 1])
                       for i in range(n)]
            lu_rows = [2.0 * prm[0, P.r + i] * u[i : i + 1] for i in range(mc)]

            row = 0
            pair_data = []
            for (i, j) in pairs:
                dx = x[3 * i : 3 * i + 1] - x[3 * j : 3 * j + 1]
                dy = x[3 * i + 1 : 3 * i + 2] - x[3 * j + 1 : 3 * j + 2]
                c_row = dx * dx + dy * dy - prm[0, P.dmin2]
                act = jnp.maximum(0.0, lam_k[row : row + 1] - mu * c_row)
                act = jnp.where(k + stage_offset == 0, 0.0, act)  # global stage-0 state rows masked
                w = mu * (act > 0.0).astype(act.dtype)
                gx, gy = 2.0 * dx, 2.0 * dy
                lx_rows[3 * i] = lx_rows[3 * i] - gx * act
                lx_rows[3 * i + 1] = lx_rows[3 * i + 1] - gy * act
                lx_rows[3 * j] = lx_rows[3 * j] + gx * act
                lx_rows[3 * j + 1] = lx_rows[3 * j + 1] + gy * act
                pair_data.append((i, j, gx, gy, w))
                row += 1

            # obstacle rows: c = |p_i - o| - keepout, J = unit vector at p_i
            obs_data = []
            for i in range(nrob):
                for o in range(ocp.n_obs):
                    dx = x[3 * i : 3 * i + 1] - prm[0, P.obs + 3 * o]
                    dy = x[3 * i + 1 : 3 * i + 2] - prm[0, P.obs + 3 * o + 1]
                    dist = jnp.sqrt(dx * dx + dy * dy + 1e-12)
                    c_row = dist - prm[0, P.obs + 3 * o + 2]
                    act = jnp.maximum(0.0, lam_k[row : row + 1] - mu * c_row)
                    act = jnp.where(k + stage_offset == 0, 0.0, act)
                    w = mu * (act > 0.0).astype(act.dtype)
                    ux, uy = dx / dist, dy / dist
                    lx_rows[3 * i] = lx_rows[3 * i] - ux * act
                    lx_rows[3 * i + 1] = lx_rows[3 * i + 1] - uy * act
                    obs_data.append((i, ux, uy, w))
                    row += 1

            # moving-obstacle rows: c = d2 - dmin2, J = 2(p_i - mov) on the
            # robot side only (the obstacle path is data, not a decision)
            mov_data = []
            if ocp.n_mov:
                mov_k = mov_ref[0, k]  # [2*n_mov, T]
                for i in range(nrob):
                    for o in range(ocp.n_mov):
                        dx = x[3 * i : 3 * i + 1] - mov_k[2 * o : 2 * o + 1]
                        dy = x[3 * i + 1 : 3 * i + 2] - mov_k[2 * o + 1 : 2 * o + 2]
                        c_row = dx * dx + dy * dy - prm[0, P.dmin2]
                        act = jnp.maximum(0.0, lam_k[row : row + 1] - mu * c_row)
                        act = jnp.where(k + stage_offset == 0, 0.0, act)
                        w = mu * (act > 0.0).astype(act.dtype)
                        gx, gy = 2.0 * dx, 2.0 * dy
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
                a_lo = jnp.where(k + stage_offset == 0, 0.0, a_lo)
                a_hi = jnp.where(k + stage_offset == 0, 0.0, a_hi)
                lx_rows[i] = lx_rows[i] - a_lo + a_hi
                dx_diag.append(mu * ((a_lo > 0.0).astype(mu.dtype)
                                     + (a_hi > 0.0).astype(mu.dtype)))

            lx_ref[0, k] = jnp.stack(lx_rows, axis=0)   # [n, 1, T]
            lu_ref[0, k] = jnp.stack(lu_rows, axis=0)   # [mc, 1, T]

            # lxx entries: diagonal base + pair outer products
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
            lxx_ref[0, k] = _dense(He, n, n, zero)

            Ue = {}
            for i in range(mc):
                Ue[(i, i)] = 2.0 * prm[0, P.r + i] * one + du_diag[i]
            luu_ref[0, k] = _dense(Ue, mc, mc, zero)
            lux_ref[0, k] = jnp.zeros_like(lux_ref[0, k])
            return 0

        jax.lax.fori_loop(0, N, stage, 0)

    return kernel


def expansions_fused(ocp: OCP, X_l, U_l, xref_l, lam_l, mu_l, mov_l=None,
                     interpret=None):
    """Lane-major fused expansions.

    X_l [tiles,N,n,L] (stage states 0..N-1), U_l [tiles,N,mc,L],
    xref_l [tiles,N,n,L], lam_l [tiles,N,nc,L], mu_l [tiles,1,L],
    mov_l [tiles,N,2*n_mov,L] when ocp.n_mov > 0
    -> (A, B, lx, lu, lxx, luu, lux) lane-major [tiles, N, ..., L]
    with lx [.., n, 1, L], lu [.., mc, 1, L].
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tiles, N, n, L = X_l.shape
    mc = ocp.nu
    nc = ocp.n_con
    dtype = X_l.dtype
    P = _P(n, mc, 1, ocp.n_obs)
    prm = _pack_params(ocp, (0.0,))

    # Stages are independent — chunk the horizon so each call's
    # (double-buffered) VMEM working set stays bounded; the seven outputs
    # dominate: ~ (2n^2 + 2 n mc + mc^2 + n + mc) * 512 B per stage per tile.
    stage_bytes = (2 * n * n + 2 * n * mc + mc * mc + 3 * n + 2 * mc + nc) * LANES * 4
    chunk = max(1, min(N, (2 * 1024 * 1024) // stage_bytes))

    def vs(nstg, *dims):
        nd = len(dims)
        return pl.BlockSpec((1, nstg, *dims, LANES),
                            lambda i, nd=nd: (i,) + (0,) * (nd + 2),
                            memory_space=pltpu.VMEM)

    sm = pl.BlockSpec((1, P.size), lambda i: (0, 0), memory_space=pltpu.SMEM)
    parts = []
    for s in range(0, N, chunk):
        e = min(s + chunk, N)
        nstg = e - s
        ins = [prm, X_l[:, s:e], U_l[:, s:e], xref_l[:, s:e], lam_l[:, s:e], mu_l]
        in_specs = [sm, vs(nstg, n), vs(nstg, mc), vs(nstg, n), vs(nstg, nc),
                    pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)]
        if ocp.n_mov:
            ins.append(mov_l[:, s:e])
            in_specs.append(vs(nstg, 2 * ocp.n_mov))
        outs = pl.pallas_call(
            _make_expansion_kernel(ocp, P, nstg, stage_offset=s),
            grid=(tiles,),
            in_specs=in_specs,
            out_specs=(vs(nstg, n, n), vs(nstg, n, mc), vs(nstg, n, 1),
                       vs(nstg, mc, 1), vs(nstg, n, n), vs(nstg, mc, mc),
                       vs(nstg, mc, n)),
            out_shape=(
                jax.ShapeDtypeStruct((tiles, nstg, n, n, LANES), dtype),
                jax.ShapeDtypeStruct((tiles, nstg, n, mc, LANES), dtype),
                jax.ShapeDtypeStruct((tiles, nstg, n, 1, LANES), dtype),
                jax.ShapeDtypeStruct((tiles, nstg, mc, 1, LANES), dtype),
                jax.ShapeDtypeStruct((tiles, nstg, n, n, LANES), dtype),
                jax.ShapeDtypeStruct((tiles, nstg, mc, mc, LANES), dtype),
                jax.ShapeDtypeStruct((tiles, nstg, mc, n, LANES), dtype),
            ),
            interpret=interpret,
        )(*ins)
        parts.append(outs)
    if len(parts) == 1:
        return parts[0]
    return tuple(jnp.concatenate([p[i] for p in parts], axis=1) for i in range(7))
