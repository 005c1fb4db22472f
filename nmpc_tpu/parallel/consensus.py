"""Robot-sharded JOINT NMPC solve by Jacobi-AL consensus (SURVEY.md §2.4
"model/robot parallel" — the one strategy round 1 left partial: the
centralized NLP lived on a single chip).

The reference's centralized joint NLP couples robots only through the
pairwise keep-out rows c_ij = d_ij^2 - dmin^2 >= 0 evaluated at stages
0..N-1 (mpc_online_casadi_tb3_six_multi_centralized_collision_free.py:
218-236,256-261); cost and dynamics are per-robot separable. Duplicating
each pair row once per endpoint yields an equivalent NLP whose KKT points
simply split the pair multiplier between the endpoints, so a block-Jacobi
scheme over robots — each robot minimizes the joint augmented Lagrangian
over its OWN trajectory with the neighbors' trajectories fixed — has the
joint problem's KKT points as fixed points. That is the decomposition this
module runs, one round being:

  1. exchange position plans (a single `jax.lax.all_gather` over the robot
     mesh axis — the ICI collective standing in for the reference's
     shared-world coupling, SURVEY.md §5.8),
  2. every robot solves its own 3-state OCP with the neighbors' gathered
     plans as *stage-synchronous* moving keep-outs (same stage k vs stage k
     as the joint rows; contrast the deployment-mode `decentralized_step`,
     which offsets by one stage because its plans are a control period
     stale),
  3. under-relax the exchanged plans (`damping`) to suppress the limit
     cycling symmetric Jacobi iterations are prone to, and CARRY the AL
     duals and penalty (lam, mu) across rounds — steady-warm semantics
     (round-1 finding: resetting mu under carried lam breaks the PHR
     activation band).

Joint convergence is measured on the gathered iterate (max duplicated-pair
violation + plan movement), identical on every shard by construction.

vs `decentralized.decentralized_step`: that is ONE Jacobi round per control
period against stale plans — the paper's decentralized *architecture*.
This module iterates rounds at a FIXED initial state until the joint
iterate settles, i.e. it solves the centralized problem itself with robots
as the parallel axis: lanes of one fused megakernel on a single chip,
shards of a mesh across chips.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec
from jax import shard_map

from nmpc_tpu.ocp.problem import OCP
from nmpc_tpu.parallel.decentralized import _neighbor_index, robot_template
from nmpc_tpu.solver.alilqr import ALILQRConfig, WarmStart, cold_start, solve

__all__ = [
    "consensus_solve",
    "consensus_solve_sharded",
    "joint_pair_violation",
    "robot_template",
]


def joint_pair_violation(plans: jax.Array, dmin2, N: int) -> jax.Array:
    """Max violation of the joint pair rows dmin^2 - d_ij^2 <= 0 over stages
    0..N-1 of the gathered position plans [m, N+1, 2] (squared-distance
    units, matching SolveResult.viol)."""
    m = plans.shape[0]
    P = plans[:, :N, :]
    d2 = jnp.sum((P[:, None] - P[None, :]) ** 2, axis=-1)  # [m, m, N]
    off = ~jnp.eye(m, dtype=bool)
    v = jnp.maximum(0.0, dmin2 - d2) * off[:, :, None]
    return jnp.max(v)


def _plans_cold(poses: jax.Array, N: int) -> jax.Array:
    return jnp.tile(poses[:, None, :2], (1, N + 1, 1))


def consensus_solve(
    template: OCP,
    x_joint: jax.Array,      # [3m] joint initial state
    goals: jax.Array,        # [m, 3]
    cfg: ALILQRConfig = ALILQRConfig(),
    rounds: int = 10,
    damping: float = 0.5,
    warms: WarmStart | None = None,
    plans: jax.Array | None = None,
    engine: str = "fused",
):
    """Joint solve on one program: robots ride the batch axis (fused
    megakernel lanes, or vmap of the per-scenario solver with
    engine='xla').

    Returns (X [m, N+1, 3], U [m, N, 2], warms, plans, viol_hist [rounds],
    delta_hist [rounds]). `warms`/`plans` allow MPC-step warm starting;
    viol_hist is the joint duplicated-pair violation of each round's raw
    (undamped) iterate — its tail is the convergence certificate.
    """
    m = goals.shape[0]
    N = template.N
    nbr = _neighbor_index(m)
    poses = x_joint.reshape(m, 3)
    xref_b = jnp.tile(goals[:, None, :], (1, N, 1))
    if plans is None:
        plans = _plans_cold(poses, N)
    if warms is None:
        warms = jax.vmap(lambda _: cold_start(template, cfg))(jnp.arange(m))

    from nmpc_tpu.ops.rollout_pallas import supports

    use_fused = engine == "fused" and supports(template)
    if use_fused:
        from nmpc_tpu.solver.alilqr_batched import solve_batched

    def solve_round(plans_k, wU, wlam, wmu):
        # stage-k keep-out = neighbor's plan at stage k (joint-row semantics)
        mov = jnp.swapaxes(plans_k[nbr][:, :, :N, :], 1, 2)  # [m, N, m-1, 2]
        w = WarmStart(U=wU, lam=wlam, mu=wmu)
        if use_fused:
            ocp_b = dataclasses.replace(
                template, x0=poses, xref=xref_b, mov_obs=mov)
            return solve_batched(ocp_b, w, cfg)

        def one(x0_i, xref_i, mov_i, w_i):
            ocp_i = dataclasses.replace(
                template, x0=x0_i, xref=xref_i, mov_obs=mov_i)
            return solve(ocp_i, w_i, cfg)

        return jax.vmap(one)(poses, xref_b, mov, w)

    def body(carry, _):
        plans_prev, wU, wlam, wmu, _X = carry
        res = solve_round(plans_prev, wU, wlam, wmu)
        raw = res.X[:, :, :2]
        plans_new = damping * raw + (1.0 - damping) * plans_prev
        delta = jnp.max(jnp.abs(plans_new - plans_prev))
        viol = joint_pair_violation(raw, template.dmin2, N)
        return (plans_new, res.U, res.lam, res.mu, res.X), (viol, delta)

    X0 = jnp.tile(poses[:, None, :], (1, N + 1, 1))
    carry0 = (plans, warms.U, warms.lam, warms.mu, X0)
    (plans_f, U_f, lam_f, mu_f, X_f), (violh, deltah) = jax.lax.scan(
        body, carry0, None, length=rounds)
    return X_f, U_f, WarmStart(U=U_f, lam=lam_f, mu=mu_f), plans_f, violh, deltah


def consensus_solve_sharded(
    mesh: Mesh,
    template: OCP,
    cfg: ALILQRConfig = ALILQRConfig(),
    rounds: int = 10,
    damping: float = 0.5,
    axis: str = "robots",
):
    """shard_map form of `consensus_solve`: robots sharded over `axis`, one
    `all_gather` per round for the plan exchange (the cross-chip constraint
    reduction), `pmax` for the global plan-movement metric.

    Returns a jitted callable
      (poses [m, 3], goals [m, 3], plans [m, N+1, 2], warms) ->
      (X [m, N+1, 3], U [m, N, 2], warms, plans, viol_hist, delta_hist)
    with the robot-carried outputs sharded and the histories replicated.
    Per-shard subproblems go through the vmapped per-scenario solver (the
    local robot count m/d is far below a lane tile, so the megakernel's
    128-lane layout has nothing to fill; on a real slice each chip instead
    fuses its whole shard the same way `consensus_solve` does at m lanes).
    """
    N = template.N

    def body(poses, goals, plans, wU, wlam, wmu):
        m_loc = poses.shape[0]
        xref_l = jnp.tile(goals[:, None, :], (1, N, 1))
        my0 = jax.lax.axis_index(axis) * m_loc

        def rnd(carry, _):
            plans_loc, wU, wlam, wmu, _X = carry
            all_plans = jax.lax.all_gather(plans_loc, axis, tiled=True)

            def one(i_local, x0_i, xref_i, w_i):
                i_glob = my0 + i_local
                # roll self to slot 0, drop it -> the m-1 neighbor plans
                others = jnp.roll(all_plans, -i_glob, axis=0)[1:]
                mov = jnp.swapaxes(others[:, :N, :], 0, 1)  # [N, m-1, 2]
                ocp_i = dataclasses.replace(
                    template, x0=x0_i, xref=xref_i, mov_obs=mov)
                return solve(ocp_i, w_i, cfg)

            res = jax.vmap(one)(
                jnp.arange(m_loc), poses, xref_l,
                WarmStart(U=wU, lam=wlam, mu=wmu))
            raw = res.X[:, :, :2]
            plans_new = damping * raw + (1.0 - damping) * plans_loc
            all_raw = jax.lax.all_gather(raw, axis, tiled=True)
            viol = joint_pair_violation(all_raw, template.dmin2, N)
            delta = jax.lax.pmax(
                jnp.max(jnp.abs(plans_new - plans_loc)), axis)
            return (plans_new, res.U, res.lam, res.mu, res.X), (viol, delta)

        X0 = jnp.tile(poses[:, None, :], (1, N + 1, 1))
        (plans_f, U_f, lam_f, mu_f, X_f), (violh, deltah) = jax.lax.scan(
            rnd, (plans, wU, wlam, wmu, X0), None, length=rounds)
        return X_f, U_f, plans_f, lam_f, mu_f, violh, deltah

    spec = PartitionSpec(axis)
    rep = PartitionSpec()
    fn = jax.jit(shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec, spec, rep, rep),
        check_vma=False,  # scan carries inside the per-shard solver are
                          # unvarying at init; vma inference rejects them
    ))

    def run(poses, goals, plans=None, warms=None):
        m = poses.shape[0]
        if plans is None:
            plans = _plans_cold(poses, N)
        if warms is None:
            warms = jax.vmap(lambda _: cold_start(template, cfg))(jnp.arange(m))
        X, U, plans_f, lam_f, mu_f, violh, deltah = fn(
            poses, goals, plans, warms.U, warms.lam, warms.mu)
        return X, U, WarmStart(U=U, lam=lam_f, mu=mu_f), plans_f, violh, deltah

    return run
