"""Closed-loop runs of the remaining reference scenario families (slow suite).

Each test runs the registry config end to end (model-in-loop plant) and
asserts the reference's own success criteria: goal reached within its stop
tolerance and no pairwise distance below dmin (SURVEY.md §4 points 2-5).
"""

import functools

import jax
import numpy as np
import pytest

from nmpc_tpu.mpc.driver import MPCConfig, closed_loop
from nmpc_tpu.scenarios import get
from nmpc_tpu.solver.alilqr import ALILQRConfig

FAST = ALILQRConfig(n_outer=10, n_inner=20, tol_con=1e-4)
STRONG = ALILQRConfig(n_outer=15, n_inner=25, tol_con=1e-4)


def _run(name, max_steps, solver=FAST, **overrides):
    sc = get(name)
    ocp = sc.make(**overrides)
    mpc = MPCConfig(max_steps=max_steps, stop_tol=sc.stop_tol, escape=True)
    r = jax.jit(functools.partial(closed_loop, solver_cfg=solver, mpc=mpc))(ocp)
    return sc, r


@pytest.mark.slow
def test_third_scenario_line_to_column():
    sc, r = _run("third_scenario", 700)  # T=0.05: ~290 steps of travel + parking
    assert bool(r.reached)
    assert float(np.min(np.asarray(r.min_dist_hist))) >= sc.dmin - 1e-2


@pytest.mark.slow
def test_fourth_scenario_square_swap():
    sc, r = _run("fourth_scenario", 250, STRONG)
    assert bool(r.reached)
    assert float(np.min(np.asarray(r.min_dist_hist))) >= sc.dmin - 1e-2


@pytest.mark.slow
def test_fifth_scenario_arc_swap():
    sc, r = _run("fifth_scenario", 250, STRONG)
    assert bool(r.reached)
    assert float(np.min(np.asarray(r.min_dist_hist))) >= sc.dmin - 1e-2


@pytest.mark.slow
def test_six_robot_hardware_config():
    """Real-TB3 variant: reduced limits v<=0.15, w<=1.5, dmin=0.4, T=0.3.
    Runs the rt deployment recipe (seed + 3x10 carried-mu solves): with the
    final control projection the plain STRONG loop's realized clearance is
    0.358 while the rt recipe holds 0.398 (the seeded multipliers carry the
    crossing's active set — same effect as on the sim headline config)."""
    from nmpc_tpu.mpc.driver import rt_closed_loop

    sc = get("six_robot_impl")
    ocp = sc.make()
    mpc = MPCConfig(max_steps=120, stop_tol=sc.stop_tol, escape=True)
    r = jax.jit(functools.partial(rt_closed_loop, mpc=mpc))(ocp)
    assert bool(r.reached)
    assert float(np.min(np.asarray(r.min_dist_hist))) >= sc.dmin - 1.5e-2


@pytest.mark.slow
def test_two_robot_hardware_config():
    sc, r = _run("two_robot_impl", 400, STRONG)
    assert bool(r.reached)
    assert float(np.min(np.asarray(r.min_dist_hist))) >= sc.dmin - 1e-2


@pytest.mark.slow
def test_ten_robot_line_crossing():
    sc, r = _run("ten_robot", 250, STRONG)
    # rows cross without collision; most robots park (outlier goals make the
    # strict joint norm slow), so assert the collision-free property plus
    # substantial convergence
    assert float(np.min(np.asarray(r.min_dist_hist))) >= sc.dmin - 1e-2
    assert float(r.err_hist[-1]) < 0.25 * float(r.err_hist[0])


@pytest.mark.slow
def test_eight_robot_closed_loop_published_config():
    """Family E's last un-loop-tested config (m=8, N=5, T=0.02 —
    AllScripts/mpc_online_casadi_tb3_eight_multi_centralized_collision_free.py:148-152).
    The published horizon gives only 0.1 s of lookahead, so the antipodal
    crossing ends in a myopic standoff at the dmin ring (escape must stay off:
    the parking heuristic ignores collision rows). Assert the collision-free
    invariant plus the pre-standoff progress."""
    sc = get("eight_robot")
    ocp = sc.make()
    mpc = MPCConfig(max_steps=500, stop_tol=sc.stop_tol, escape=False)
    r = jax.jit(functools.partial(closed_loop, solver_cfg=STRONG, mpc=mpc))(ocp)
    assert float(np.min(np.asarray(r.min_dist_hist))) >= sc.dmin - 1e-2
    assert float(r.err_hist[-1]) < 0.7 * float(r.err_hist[0])


@pytest.mark.slow
def test_eight_robot_closed_loop_full_swap():
    """With a horizon that can see through the crossing (N=25, T=0.1 — the
    six-robot headline's 2.5 s of lookahead), the eight-robot antipodal swap
    completes collision-free and deadlock-free end to end. Uses the rt
    deployment recipe: the plain STRONG loop parks one robot short of the
    strict joint norm with the final control projection, while the seeded
    recipe arrives in ~209 steps."""
    from nmpc_tpu.mpc.driver import rt_closed_loop

    sc = get("eight_robot")
    ocp = sc.make(N=25, T=0.1)
    mpc = MPCConfig(max_steps=250, stop_tol=sc.stop_tol, escape=True)
    r = jax.jit(functools.partial(rt_closed_loop, mpc=mpc))(ocp)
    assert bool(r.reached)
    assert float(np.min(np.asarray(r.min_dist_hist))) >= sc.dmin - 1e-2


@pytest.mark.slow
def test_decentralized_first_scenario_tour_with_lidar_monitor():
    """The decentralized_first_scenario entry's COMBINED semantics
    (decentralized_first_scenario.py:36-43,94-95): the 6-waypoint tour at
    the longest reference horizon (N=200, T=0.05) with the script's passive
    LiDAR min-distance monitoring running alongside (its gradient-correction
    code is commented out in the reference, :67-80 — the scan only tracks
    clearance). The tour must complete through every waypoint and the
    monitored min ray distance must stay above the robot radius against an
    off-path obstacle map."""
    import jax.numpy as jnp

    from nmpc_tpu.mpc.driver import closed_loop_waypoints
    from nmpc_tpu.sim.lidar import ray_angles, raycast

    sc = get("decentralized_first_scenario")
    ocp = sc.make()
    assert ocp.N == 200 and ocp.m == 1
    wps = sc.waypoint_array
    # ~570 steps of pure travel (6.3 m at v_max*T = 0.011 m/step) plus
    # turn-in-place + full-pose parking at each of the 6 waypoints; 1.5x
    # margin over the observed step count (rounding-universe sensitivity)
    mpc = MPCConfig(max_steps=1400, advance_tol=0.075, escape=True)
    r = jax.jit(functools.partial(
        closed_loop_waypoints, waypoints=wps, solver_cfg=FAST, mpc=mpc))(ocp)
    assert bool(r.reached), f"tour did not complete in {int(r.steps_used)} steps"
    # every waypoint visited in order
    gidx = np.asarray(r.goal_idx_hist)
    assert gidx.max() >= wps.shape[0] - 1
    # passive LiDAR monitor over the realized trajectory: obstacles parked
    # off the tour's path; the monitored clearance never enters the robot
    # radius (the reference's lidar use is exactly this telemetry)
    obstacles = jnp.asarray([[1.8, -1.5, 0.3], [-1.6, 1.4, 0.25]], jnp.float32)
    angles = ray_angles(12)
    steps = int(r.steps_used)
    poses = jnp.asarray(r.X_hist)[: steps + 1, :3]
    scans = jax.vmap(lambda p: raycast(p, obstacles, angles))(poses)
    min_clear = float(jnp.min(scans))
    assert min_clear > sc.robot_radius, min_clear
