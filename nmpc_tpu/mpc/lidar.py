"""LiDAR-augmented closed-loop MPC — family I, v4 semantics.

Reproduces obs_avoid_static_first_scenario_v4.py end to end, with the Gazebo
scan replaced by the on-device raycaster:
  per step: scan <- raycast(pose)                    (:29-40, /scan callback)
            x0   <- [pose; scan]                      (:296-297 re-seed)
            pObs <- Rz(th) (scan_j e(B0_j)) + p       (:109-113, frozen)
            solve augmented-state OCP, Nc move-blocked (:61,128-131)
            apply u*[0], advance plant
The augmented dynamics, d >= robot_radius bounds, and (1/d)' L (1/d) cost
live in the OCP (nmpc_tpu.ocp.problem); the condensed GN solver handles the
Nc blocking.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from nmpc_tpu.ocp.problem import OCP
from nmpc_tpu.sim.lidar import obstacle_points, ray_angles, raycast
from nmpc_tpu.sim.plant import PlantConfig, plant_step
from nmpc_tpu.solver import gn
from nmpc_tpu.solver.alilqr import WarmStart


def closed_loop_lidar(
    ocp: OCP,                 # LiDAR-augmented template (num_rays > 0)
    sim_obstacles: jax.Array, # [n, 3] ground-truth circles for the raycaster
    waypoints: jax.Array,     # [G, 3] pose goals
    cfg: gn.GNConfig = gn.GNConfig(Nc=50, normal="dense"),
    max_steps: int = 300,
    advance_tol: float = 0.1,
    scan_max: float = 3.5,
    plant: PlantConfig = PlantConfig(),
    solve_fn=None,
):
    """Returns (X_hist [S+1, 3] poses, U_hist [S, 2], min_clearance [S],
    goal_idx_hist [S], reached).

    solve_fn(ocp, warm) overrides the NLP engine. Default is the condensed
    GN solver with cfg's Nc move blocking (v4 semantics,
    obs_avoid_static_first_scenario_v4.py:61). For v3 semantics (full control
    horizon, obs_avoid_static_first_scenario_v3.py) pass the AL-iLQR engine,
    e.g. solve_fn=lambda o, w: alilqr.solve(o, w, ALILQRConfig(...))."""
    R = ocp.num_rays
    N = ocp.N
    angles = ray_angles(R, ocp.x0.dtype)
    G = waypoints.shape[0]
    solve_fn = solve_fn or functools.partial(gn.solve, cfg=cfg)

    def step(carry, _):
        pose, w, done, gidx = carry
        goal = waypoints[jnp.minimum(gidx, G - 1)]
        err = jnp.linalg.norm(pose - goal)
        advance = (err < advance_tol) & (~done)
        gidx = gidx + advance.astype(jnp.int32)
        done = done | (gidx >= G)
        goal = waypoints[jnp.minimum(gidx, G - 1)]

        scan = raycast(pose, sim_obstacles, angles, scan_max)
        x0_aug = jnp.concatenate([pose, scan])
        p_obs = obstacle_points(pose, scan, angles)
        goal_aug = jnp.concatenate([goal, jnp.zeros((R,), pose.dtype)])
        ocp_k = dataclasses.replace(
            ocp,
            x0=x0_aug,
            xref=jnp.tile(goal_aug[None, :], (N, 1)),
            p_obs=p_obs,
        )
        res = solve_fn(ocp_k, w)
        u0 = jnp.where(done, 0.0, res.U[0])
        pose_next_full, _ = plant_step(pose, u0, ocp.T, plant)
        pose_next = jnp.where(done, pose, pose_next_full)
        U_sh = jnp.concatenate([res.U[1:], res.U[-1:]], axis=0)
        # controls warm-start; multipliers restart cold — the scan-dependent
        # constraint landscape changes every step (frozen pObs moves), so
        # carried multipliers misprice the new active set and stall the GN
        # line search
        w_next = WarmStart(
            U=U_sh,
            lam=jnp.zeros_like(res.lam),
            mu=jnp.asarray(cfg.mu_init, pose.dtype),
        )
        w_next = jax.tree.map(lambda a, b: jnp.where(done, a, b), w, w_next)
        # true clearance to the nearest obstacle surface
        dc = jnp.sqrt(jnp.sum((pose_next[:2][None] - sim_obstacles[:, :2]) ** 2, -1))
        clearance = jnp.min(dc - sim_obstacles[:, 2])
        return (pose_next, w_next, done, gidx), (pose_next, u0, err, clearance, gidx)

    dtype = ocp.x0.dtype
    w0 = WarmStart(
        U=jnp.zeros((N, 2), dtype),
        lam=jnp.zeros((N, ocp.n_con), dtype),
        mu=jnp.asarray(cfg.mu_init, dtype),
    )
    pose0 = ocp.x0[:3]
    carry0 = (pose0, w0, jnp.zeros((), bool), jnp.zeros((), jnp.int32))
    (poseF, _, done, gidx), (X_t, U_t, err_t, clr_t, gidx_t) = jax.lax.scan(
        step, carry0, jnp.arange(max_steps)
    )
    X_hist = jnp.concatenate([pose0[None], X_t], axis=0)
    return X_hist, U_t, clr_t, gidx_t, done
