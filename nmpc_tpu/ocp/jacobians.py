"""Analytic constraint Jacobians (replaces per-stage jacfwd in the solver).

Every inequality row of `stage_constraints` has closed-form derivatives with
a *static* sparsity pattern; building them as dense incidence-matrix
products keeps the whole assembly a handful of broadcasts — no AD forward
passes, no scatters — which XLA fuses into the expansion kernel:

  pair row (i, j):  d2 = |pi - pj|^2        dJ/dpi = 2(pi - pj), anti-sym
  obstacle row:     c  = |pi - po| - r - m  dJ/dpi = (pi - po)/|pi - po|
  moving row:       c  = |pi - qk|^2 - d2   dJ/dpi = 2(pi - qk)
  box rows:         +/- identity

Applies to every model without LiDAR rays (the augmented state keeps the AD
path).
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from nmpc_tpu.ocp.problem import OCP, pair_indices


@functools.lru_cache(maxsize=None)
def _incidence(m: int, nx: int, n_obs: int, n_mov: int):
    """Static incidence matrices, cached per problem class."""
    P = m * (m - 1) // 2
    Ax = np.zeros((P, nx), np.float32)
    Ay = np.zeros((P, nx), np.float32)
    for p, (i, j) in enumerate(zip(*pair_indices(m))):
        Ax[p, 3 * i] = 1.0
        Ax[p, 3 * j] = -1.0
        Ay[p, 3 * i + 1] = 1.0
        Ay[p, 3 * j + 1] = -1.0
    # obstacle/moving rows: robot index per row (row-major robot x obs)
    Ox = np.zeros((m * n_obs, nx), np.float32)
    Oy = np.zeros((m * n_obs, nx), np.float32)
    for i in range(m):
        for o in range(n_obs):
            Ox[i * n_obs + o, 3 * i] = 1.0
            Oy[i * n_obs + o, 3 * i + 1] = 1.0
    Mx = np.zeros((m * n_mov, nx), np.float32)
    My = np.zeros((m * n_mov, nx), np.float32)
    for i in range(m):
        for o in range(n_mov):
            Mx[i * n_mov + o, 3 * i] = 1.0
            My[i * n_mov + o, 3 * i + 1] = 1.0
    # cache NUMPY constants only — caching jnp arrays created inside a jit
    # trace would leak trace-bound values into later traces
    return Ax, Ay, Ox, Oy, Mx, My


def stage_constraint_jacobians(ocp: OCP, x, mov_k=None):
    """(Jx [n_con, nx], Ju [n_con, nu]) of stage_constraints at (x, u).
    Only state-dependent rows depend on x; box rows are constants."""
    assert ocp.num_rays == 0, "LiDAR-augmented model uses the AD path"
    m, nx, nu = ocp.m, ocp.nx, ocp.nu
    dtype = x.dtype
    Ax, Ay, Ox, Oy, Mx, My = (
        jnp.asarray(a) for a in _incidence(m, nx, ocp.n_obs, ocp.n_mov)
    )
    pos = x.reshape(m, 3)[:, :2]
    blocks = []
    if ocp.n_pairs:
        ii, jj = pair_indices(m)
        diff = pos[jnp.array(ii)] - pos[jnp.array(jj)]        # [P, 2]
        blocks.append(2.0 * (diff[:, 0:1] * Ax + diff[:, 1:2] * Ay))
    if ocp.n_obs:
        delta = pos[:, None, :] - ocp.obstacles[None, :, :2]  # [m, n_obs, 2]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, -1), 1e-12))
        unit = (delta / dist[..., None]).reshape(m * ocp.n_obs, 2)
        blocks.append(unit[:, 0:1] * Ox + unit[:, 1:2] * Oy)
    if ocp.n_mov:
        mov_k = ocp.mov_obs[0] if mov_k is None else mov_k
        delta = (pos[:, None, :] - mov_k[None, :, :]).reshape(m * ocp.n_mov, 2)
        blocks.append(2.0 * (delta[:, 0:1] * Mx + delta[:, 1:2] * My))
    zero_u = jnp.zeros((2 * nu, nx), dtype)
    eye_x = jnp.eye(nx, dtype=dtype)
    Jx = jnp.concatenate(blocks + [zero_u, eye_x, -eye_x], axis=0)

    n_state_rows = ocp.n_pairs + m * ocp.n_obs + m * ocp.n_mov
    eye_u = jnp.eye(nu, dtype=dtype)
    Ju = jnp.concatenate([
        jnp.zeros((n_state_rows, nu), dtype), eye_u, -eye_u,
        jnp.zeros((2 * nx, nu), dtype),
    ], axis=0)
    return Jx, Ju
