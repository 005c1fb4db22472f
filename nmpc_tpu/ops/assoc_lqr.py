"""Horizon-parallel LQR via associative scan — the in-solver analog of
sequence parallelism (SURVEY.md §5.7).

The reference materializes the horizon as symbolic graph columns and lets
MUMPS factorize the resulting block-tridiagonal KKT serially. Here the
Riccati backward recursion is reformulated as an associative operation on
conditional-value-function elements (Sarkka & Garcia-Fernandez, "Temporal
Parallelization of Dynamic Programming and Linear Quadratic Control"), so
`jax.lax.associative_scan` evaluates all N value functions in O(log N) depth
— XLA schedules the combine tree across the chip instead of waiting on an
N-step sequential chain. Used for long horizons (the reference runs N up to
200: mpc_online_casadi_tb3_1.py:57).

Element e = (A, b, C, eta, J) encodes the optimal cost-to-go between two
stages as V(x_i | x_j) with value form V(x) = 0.5 x'Jx - eta'x and endpoint
map x_j = (I + C J)^{-1}(A x_i + b + C eta)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine(ei, ej):
    """Associative composition of conditional-value elements (ei covers the
    earlier interval, ej the later)."""
    Ai, bi, Ci, etai, Ji = ei
    Aj, bj, Cj, etaj, Jj = ej
    n = Ai.shape[-1]
    I = jnp.eye(n, dtype=Ai.dtype)
    # batched over leading dims
    M1 = jnp.linalg.solve(I + Ci @ Jj, jnp.concatenate([Ai, bi[..., None], Ci], axis=-1))
    M1A, M1b, M1C = M1[..., :n], M1[..., n], M1[..., n + 1 :]
    M2 = jnp.linalg.solve(
        (I + Jj @ Ci), jnp.concatenate([(etaj - (Jj @ bi[..., None])[..., 0])[..., None], Jj @ Ai], axis=-1)
    )
    M2e, M2JA = M2[..., 0], M2[..., 1:]
    # recompute M1 applied to (bi + Ci etaj) exactly
    rhs_b = bi + (Ci @ etaj[..., None])[..., 0]
    M1bC = jnp.linalg.solve(I + Ci @ Jj, rhs_b[..., None])[..., 0]
    A = Aj @ M1A
    b = (Aj @ M1bC[..., None])[..., 0] + bj
    C = Aj @ M1C @ jnp.swapaxes(Aj, -1, -2) + Cj
    eta = (jnp.swapaxes(Ai, -1, -2) @ M2e[..., None])[..., 0] + etai
    J = jnp.swapaxes(Ai, -1, -2) @ M2JA + Ji
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return (A, b, C, eta, J)


def _eliminate_cross(A, B, c, Qxx, qx, Quu, qu, Qux):
    """Complete the square in u to remove cross terms: u = ubar - Quu^{-1}
    (Qux x + qu). Returns pure-form (Abar, cbar, Cbar, Qxxbar, qxbar) plus
    the recovery pieces (Kc = Quu^{-1} Qux, kc = Quu^{-1} qu)."""
    sol = jnp.linalg.solve(Quu, jnp.concatenate([Qux, qu[..., None], jnp.swapaxes(B, -1, -2)], axis=-1))
    n = Qux.shape[-1]
    Kc = sol[..., :n]                      # Quu^{-1} Qux
    kc = sol[..., n]                       # Quu^{-1} qu
    QiBt = sol[..., n + 1 :]               # Quu^{-1} B'
    Abar = A - B @ Kc
    cbar = c - (B @ kc[..., None])[..., 0]
    Cbar = B @ QiBt
    Cbar = 0.5 * (Cbar + jnp.swapaxes(Cbar, -1, -2))
    Qxxbar = Qxx - jnp.swapaxes(Qux, -1, -2) @ Kc
    qxbar = qx - (jnp.swapaxes(Qux, -1, -2) @ kc[..., None])[..., 0]
    return Abar, cbar, Cbar, Qxxbar, qxbar, Kc, kc


def parallel_lqr_gains(A, B, c, Qxx, qx, Quu, qu, Qux, QxxN=None, qxN=None):
    """All-stage LQR gains in O(log N) depth.

    Inputs (delta-coordinate LQ subproblem, stage k = 0..N-1):
      A [N,n,n], B [N,n,m], c [N,n], Qxx [N,n,n], qx [N,n],
      Quu [N,m,m] (PD), qu [N,m], Qux [N,m,n]; terminal QxxN [n,n], qxN [n]
      (default zero — the reference OCP has no terminal cost).
    Returns (kff [N,m], K [N,m,n], S [N+1,n,n], v [N+1,n]) with
    V_k(x) = 0.5 x'S_k x - v_k'x.
    """
    N, n, m = B.shape
    dtype = A.dtype
    if QxxN is None:
        QxxN = jnp.zeros((n, n), dtype)
    if qxN is None:
        qxN = jnp.zeros((n,), dtype)

    Abar, cbar, Cbar, Qxxbar, qxbar, Kc, kc = _eliminate_cross(
        A, B, c, Qxx, qx, Quu, qu, Qux
    )
    elems = (
        jnp.concatenate([Abar, jnp.zeros((1, n, n), dtype)], 0),
        jnp.concatenate([cbar, jnp.zeros((1, n), dtype)], 0),
        jnp.concatenate([Cbar, jnp.zeros((1, n, n), dtype)], 0),
        jnp.concatenate([-qxbar, -qxN[None]], 0),
        jnp.concatenate([Qxxbar, QxxN[None]], 0),
    )
    # inclusive right-to-left scan: out[k] = e_k (x) ... (x) e_N.
    # associative_scan(reverse=True) passes the right-accumulated element as
    # the first argument, so flip _combine's (earlier, later) convention.
    out = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), elems, reverse=True, axis=0
    )
    S = out[4]          # [N+1, n, n]
    v = out[3]          # [N+1, n]

    # gains from the k+1 value function (delta coordinates: x evaluated at 0)
    S1, v1 = S[1:], v[1:]
    H = Quu + jnp.swapaxes(B, -1, -2) @ S1 @ B          # [N, m, m]
    rhs_k = (jnp.swapaxes(B, -1, -2) @ (S1 @ cbar[..., None] - v1[..., None]))[..., 0]
    rhs_K = jnp.swapaxes(B, -1, -2) @ S1 @ Abar
    sol = jnp.linalg.solve(H, jnp.concatenate([rhs_k[..., None], rhs_K], axis=-1))
    kbar = -sol[..., 0]
    Kbar = -sol[..., 1:]
    kff = kbar - kc
    K = Kbar - Kc
    return kff, K, S, v


def sequential_lqr_gains(A, B, c, Qxx, qx, Quu, qu, Qux, QxxN=None, qxN=None):
    """Reference O(N) Riccati sweep over the same inputs (for validation and
    short horizons where the scan's combine overhead dominates)."""
    N, n, m = B.shape
    dtype = A.dtype
    S = jnp.zeros((n, n), dtype) if QxxN is None else QxxN
    v = jnp.zeros((n,), dtype) if qxN is None else -qxN

    def body(carry, inp):
        S, v = carry
        A_k, B_k, c_k, Qxx_k, qx_k, Quu_k, qu_k, Qux_k = inp
        # V_{k+1}(x) = 0.5 x'Sx - v'x; expand through dynamics with offset c
        Qx = qx_k + A_k.T @ (S @ c_k - v)
        Qu = qu_k + B_k.T @ (S @ c_k - v)
        Qxx_h = Qxx_k + A_k.T @ S @ A_k
        Quu_h = Quu_k + B_k.T @ S @ B_k
        Qux_h = Qux_k + B_k.T @ S @ A_k
        sol = jnp.linalg.solve(Quu_h, jnp.concatenate([Qu[:, None], Qux_h], axis=-1))
        kff = -sol[:, 0]
        K = -sol[:, 1:]
        S_new = Qxx_h + K.T @ Quu_h @ K + K.T @ Qux_h + Qux_h.T @ K
        v_new = -(Qx + K.T @ Quu_h @ kff + K.T @ Qu + Qux_h.T @ kff)
        S_new = 0.5 * (S_new + S_new.T)
        return (S_new, v_new), (kff, K)

    (_, _), (kffs, Ks) = jax.lax.scan(
        body, (S, v), (A, B, c, Qxx, qx, Quu, qu, Qux), reverse=True
    )
    return kffs, Ks
