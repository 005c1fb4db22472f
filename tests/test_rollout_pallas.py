"""Fused line-search kernels vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from nmpc_tpu.ops.riccati_pallas import riccati_fused
from nmpc_tpu.ops.rollout_pallas import linesearch_costs, rollout_alpha, supports
from nmpc_tpu.parallel.batch import batch_ocp
from nmpc_tpu.scenarios import get
from nmpc_tpu.solver import alilqr_batched as ab
from nmpc_tpu.solver.alilqr import ALILQRConfig


def _setup(B=128):
    base = get("two_robot_swap").make(N=8)
    x0s = base.x0[None] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(0), (B, base.nx), base.x0.dtype
    )
    ob = batch_ocp(base, x0s)
    U = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (B, base.N, base.nu))
    lam = 0.1 * jax.random.uniform(jax.random.PRNGKey(2), (B, base.N, base.n_con))
    mu = jnp.full((B,), 10.0)
    X = ab._rollout_b(ob, U)
    cfg = ALILQRConfig()
    A, Bm, lx, lu, lxx, luu, lux = ab._expansions(ob, X, U, lam, mu)
    kff, Kfb, dV1 = riccati_fused(A, Bm, lx, lu, lxx, luu, lux, reg=cfg.reg)
    return base, ob, X, U, lam, mu, kff, Kfb


def test_supports_gate():
    assert supports(get("two_robot_swap").make(N=5))
    assert supports(get("obstacle_scenario_1").make(N=5))  # obstacles fused
    assert not supports(get("lidar_v4").make(N=5))


def test_linesearch_costs_match_xla():
    base, ob, X, U, lam, mu, kff, Kfb = _setup()
    alphas = (0.0, 1.0, 0.5, 0.1)
    costs_p = linesearch_costs(base, ob.x0, X, U, kff, Kfb, ob.xref, lam, mu, alphas)
    B = ob.x0.shape[0]
    for ai, a in enumerate(alphas):
        Xn, Un = ab._forward_b(ob, X, U, kff, Kfb, jnp.full((B,), a))
        ref = ab._al_cost_b(ob, Xn, Un, lam, mu)
        np.testing.assert_allclose(np.array(costs_p[ai]), np.array(ref),
                                   rtol=2e-4, atol=2e-3)


def test_rollout_alpha_matches_xla():
    base, ob, X, U, lam, mu, kff, Kfb = _setup()
    B = ob.x0.shape[0]
    alpha = jnp.where(jnp.arange(B) % 2 == 0, 1.0, 0.25)
    Xp, Up = rollout_alpha(base, ob.x0, X, U, kff, Kfb, alpha)
    Xr, Ur = ab._forward_b(ob, X, U, kff, Kfb, alpha)
    np.testing.assert_allclose(np.array(Xp), np.array(Xr), atol=1e-5)
    np.testing.assert_allclose(np.array(Up), np.array(Ur), atol=1e-5)
