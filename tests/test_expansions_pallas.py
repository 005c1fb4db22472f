"""Fused expansions kernel vs the XLA/AD expansion path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from nmpc_tpu.ocp.problem import x_dependent_rows
from nmpc_tpu.ops.expansions_pallas import expansions_fused
from nmpc_tpu.ops.riccati_pallas import _to_lane
from nmpc_tpu.parallel.batch import batch_ocp
from nmpc_tpu.scenarios import get
from nmpc_tpu.solver import alilqr_batched as ab


def test_expansions_fused_matches_xla():
    B = 128
    base = get("two_robot_swap").make(N=6)
    x0s = base.x0[None] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(0), (B, base.nx), base.x0.dtype
    )
    ob = batch_ocp(base, x0s)
    U = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, base.N, base.nu))
    lam = 0.2 * jax.random.uniform(jax.random.PRNGKey(2), (B, base.N, base.n_con))
    # stage-0 state-dependent rows carry no multipliers (the masked rows —
    # the AL update keeps them at zero; the kernel hard-masks them)
    xdep = np.asarray(x_dependent_rows(base))
    lam = lam.at[:, 0, xdep].set(0.0)
    mu = jnp.full((B,), 10.0)
    X = ab._rollout_b(ob, U)

    A, Bm, lx, lu, lxx, luu, lux = ab._expansions(ob, X, U, lam, mu)

    tiles = B // 128
    X_l = _to_lane(X[:, :-1], tiles)
    U_l = _to_lane(U, tiles)
    xref_l = _to_lane(ob.xref, tiles)
    lam_l = _to_lane(lam, tiles)
    mu_l = _to_lane(mu[:, None], tiles)
    Ap, Bp, lxp, lup, lxxp, luup, luxp = expansions_fused(
        base, X_l, U_l, xref_l, lam_l, mu_l
    )

    from nmpc_tpu.ops.riccati_pallas import _from_lane

    np.testing.assert_allclose(np.asarray(_from_lane(Ap, B)), np.asarray(A), atol=1e-5)
    np.testing.assert_allclose(np.asarray(_from_lane(Bp, B)), np.asarray(Bm), atol=1e-5)
    np.testing.assert_allclose(np.asarray(_from_lane(lxp, B))[..., 0], np.asarray(lx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(_from_lane(lup, B))[..., 0], np.asarray(lu), atol=1e-4)
    np.testing.assert_allclose(np.asarray(_from_lane(lxxp, B)), np.asarray(lxx), atol=1e-3)
    np.testing.assert_allclose(np.asarray(_from_lane(luup, B)), np.asarray(luu), atol=1e-4)
    np.testing.assert_allclose(np.asarray(_from_lane(luxp, B)), np.asarray(lux), atol=1e-6)


def test_expansions_and_solve_with_obstacles():
    """Obstacle rows in the fused class (family H)."""
    import functools

    from nmpc_tpu.solver.alilqr import ALILQRConfig, solve
    from nmpc_tpu.solver.alilqr_batched import solve_batched
    from nmpc_tpu.ops.rollout_pallas import supports

    base = get("obstacle_scenario_1").make(N=10, x_goal=jnp.asarray([1.5, 1.5, 0.0]))
    assert supports(base)
    B = 4
    x0s = base.x0[None] + 0.02 * jax.random.normal(
        jax.random.PRNGKey(3), (B, base.nx), base.x0.dtype
    )
    ob = batch_ocp(base, x0s)
    # this start needs ~20 AL outers on the fused path (first-order
    # multiplier iteration; budget generously)
    cfg = ALILQRConfig(n_outer=30, n_inner=60, tol_con=1e-4)
    rb = jax.jit(functools.partial(solve_batched, cfg=cfg))(ob)
    import dataclasses

    rv = jax.jit(jax.vmap(
        lambda x0: solve(dataclasses.replace(base, x0=x0), cfg=cfg)))(x0s)
    # nonconvex problem: both paths reach valid KKT points; costs agree to
    # the ~1% level and both satisfy the constraints
    np.testing.assert_allclose(np.asarray(rb.cost), np.asarray(rv.cost), rtol=1e-2)
    assert bool(jnp.all(rb.converged))
    assert float(jnp.max(rb.viol)) < 1e-3


def test_al_update_lanes_matches_xla():
    """Lane-major AL multiplier update kernel == the XLA reference
    (masked_trajectory_constraints -> clip(max(0, lam - mu c), 0, lam_max),
    viol = max(0, -min c))."""
    import dataclasses

    from nmpc_tpu.ocp import problem as P
    from nmpc_tpu.ops.megasolve_pallas import al_update_lanes
    from nmpc_tpu.ops.riccati_pallas import LANES, _from_lane, _to_lane
    from nmpc_tpu.scenarios import get

    base = get("six_robot_antipodal").make(N=8)
    Bt = LANES
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    Xs = base.x0[None, None] + 0.3 * jax.random.normal(k1, (Bt, 8, base.nx))
    U = 0.2 * jax.random.normal(k2, (Bt, 8, base.nu))
    lam = jnp.abs(jax.random.normal(k3, (Bt, 8, base.n_con)))
    mu = jnp.full((Bt,), 10.0)

    lam_l, viol_l = al_update_lanes(
        base, _to_lane(Xs, 1), _to_lane(U, 1), _to_lane(lam, 1),
        _to_lane(mu[:, None], 1), lam_max=1e6)
    lam_k = _from_lane(lam_l, Bt)
    viol_k = _from_lane(viol_l[:, None], Bt)[:, 0, 0]

    def ref_one(x0_b, Xs_b, U_b, lam_b, mu_b):
        o = dataclasses.replace(base, x0=x0_b)
        X_full = jnp.concatenate([Xs_b, Xs_b[-1:]], axis=0)
        c = P.masked_trajectory_constraints(o, X_full, U_b)
        viol = jnp.maximum(0.0, -jnp.min(c))
        lam_new = jnp.clip(jnp.maximum(0.0, lam_b - mu_b * c), 0.0, 1e6)
        return lam_new, viol

    lam_ref, viol_ref = jax.vmap(ref_one)(
        jnp.tile(base.x0[None], (Bt, 1)), Xs, U, lam, mu)
    np.testing.assert_allclose(np.array(lam_k), np.array(lam_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.array(viol_k), np.array(viol_ref),
                               rtol=1e-5, atol=1e-6)


def test_chol_rl_matches_left_looking():
    """The right-looking factorization + column-oriented substitutions
    (kept as a measured ALTERNATIVE — a recorded round-4 negative result,
    10% end-to-end regression, NOT used by the production kernels; see
    ops/riccati_pallas.py) must agree with the left-looking
    `_chol`/`_chol_solve` pair on random SPD lane-major blocks — same
    math, different op schedule (rounding-level differences only)."""
    from nmpc_tpu.ops.riccati_pallas import (
        _chol, _chol_rl, _chol_solve, _chol_solve_rl)

    rng = np.random.default_rng(7)
    m, r, T = 12, 19, 16
    A = rng.normal(size=(m, m, T))
    Quu = jnp.asarray(np.einsum("ikt,jkt->ijt", A, A) + 3.0 * np.eye(m)[:, :, None],
                      jnp.float32)
    RHS = jnp.asarray(rng.normal(size=(m, r, T)), jnp.float32)
    X1 = _chol_solve(_chol(Quu, 1e-6), RHS)
    X2 = _chol_solve_rl(_chol_rl(Quu, 1e-6), RHS)
    np.testing.assert_allclose(np.array(X2), np.array(X1), rtol=2e-4, atol=2e-5)
