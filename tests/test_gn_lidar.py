"""Condensed GN solver (move blocking) + LiDAR-augmented family I tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nmpc_tpu.ocp.problem import make_ocp
from nmpc_tpu.scenarios import get
from nmpc_tpu.sim.lidar import obstacle_points, ray_angles, raycast
from nmpc_tpu.solver import gn
from nmpc_tpu.solver.alilqr import ALILQRConfig
from nmpc_tpu.solver.alilqr import solve as ilqr_solve


def test_gn_matches_ilqr_unblocked():
    ocp = make_ocp(m=1, N=50, T=0.01, x0=[0, 0, 0], x_goal=[1.0, 1.5, 0.0])
    r1 = jax.jit(functools.partial(
        ilqr_solve, cfg=ALILQRConfig(tol_cost=1e-9, n_inner=50, n_outer=20, tol_con=1e-5)
    ))(ocp)
    r2 = jax.jit(functools.partial(
        gn.solve, cfg=gn.GNConfig(tol_cost=1e-9, n_gn=40, n_outer=20, tol_con=1e-5)
    ))(ocp)
    assert abs(float(r1.cost) - float(r2.cost)) / (1 + float(r1.cost)) < 1e-4
    assert float(np.abs(np.array(r1.U) - np.array(r2.U)).max()) < 1e-2


def test_move_blocking_freezes_tail():
    # Nc=2 < N=5: u frozen after Nc (mpc_control_pose_py_modified.py:32-37)
    ocp = make_ocp(m=1, N=5, T=0.5, x0=[0, 0, 0], x_goal=[2.0, 2.0, 0.0])
    r = jax.jit(functools.partial(gn.solve, cfg=gn.GNConfig(Nc=2, n_gn=30, n_outer=10)))(ocp)
    U = np.array(r.U)
    for k in range(2, 5):
        np.testing.assert_allclose(U[k], U[1], rtol=1e-6)
    assert float(r.viol) < 1e-3


def test_raycast_geometry():
    angles = ray_angles(4)  # 0, 90, 180, 270 deg body frame
    pose = jnp.array([0.0, 0.0, 0.0])
    obstacles = jnp.array([[1.0, 0.0, 0.2]])
    rng = raycast(pose, obstacles, angles)
    np.testing.assert_allclose(rng[0], 0.8, rtol=1e-5)   # ahead: hits at 1-r
    np.testing.assert_allclose(rng[1], 3.5, rtol=1e-5)   # sideways: capped
    np.testing.assert_allclose(rng[2], 3.5, rtol=1e-5)
    # rotated pose: ray 2 (180 deg body) now faces the obstacle
    pose_r = jnp.array([0.0, 0.0, jnp.pi])
    rng_r = raycast(pose_r, obstacles, angles)
    np.testing.assert_allclose(rng_r[2], 0.8, rtol=1e-5)


def test_obstacle_points_roundtrip():
    angles = ray_angles(8)
    pose = jnp.array([0.3, -0.2, 0.7])
    scan = jnp.full((8,), 1.5)
    pts = obstacle_points(pose, scan, angles)
    d = jnp.linalg.norm(pts - pose[:2][None], axis=-1)
    np.testing.assert_allclose(d, 1.5, rtol=1e-5)


def test_lidar_closed_loop_avoids_and_reaches():
    from nmpc_tpu.mpc.lidar import closed_loop_lidar

    sc = get("lidar_v4")
    ocp = sc.make(N=40)
    obstacles = jnp.array([[0.5, 0.25, 0.1]], jnp.float32)
    wps = jnp.asarray(sc.waypoints[:1], jnp.float32)  # first goal (1.0, 0.5, 0)
    cfg = gn.GNConfig(Nc=20, n_gn=10, n_outer=6, tol_con=1e-3)
    X, U, clr, gidx, done = jax.jit(functools.partial(
        closed_loop_lidar, sim_obstacles=obstacles, waypoints=wps, cfg=cfg,
        max_steps=400))(ocp)
    # never hits the obstacle (robot radius 0.15)
    assert float(clr.min()) >= 0.15 - 1e-2
    # reaches the goal region
    assert int(gidx[-1]) >= 1
    # controls respect the v4 actuator limits (v<=0.15, w<=1.5)
    U = np.array(U)
    assert np.abs(U[:, 0]).max() <= 0.15 + 1e-3
    assert np.abs(U[:, 1]).max() <= 1.5 + 1e-3


def test_gn_closed_loop_waypoints():
    """Driver integration: the condensed GN engine (Nc blocking) drives the
    waypoint loop through solve_fn (slsqp_multigoal semantics: Nc=1)."""
    import jax.numpy as jnp

    from nmpc_tpu.mpc.driver import MPCConfig, closed_loop_waypoints

    sc = get("slsqp_multigoal")
    ocp = sc.make()
    cfg = gn.GNConfig(Nc=sc.Nc, n_gn=15, n_outer=6)
    solve_fn = lambda o, w: gn.solve(o, w, cfg)
    mpc = MPCConfig(max_steps=100, advance_tol=sc.advance_tol, escape=True)
    r = jax.jit(functools.partial(
        closed_loop_waypoints, waypoints=sc.waypoint_array,
        solver_cfg=gn.GNConfig(Nc=sc.Nc), mpc=mpc, solve_fn=solve_fn))(ocp)
    # reaches at least the first waypoint (2,2,0) with Dt=0.5 steps
    assert int(r.goal_idx_hist[-1]) >= 1


def test_gn_closed_loop_pose_multi():
    """slsqp_pose_multi (mpc_control_pose_multi_robot_py.py): single-robot
    pose stabilization with Nc=2 move blocking, reduced limits v<=0.1,
    w<=0.5, state box +-3. The reference solves it with scipy SLSQP each
    period; here the condensed GN engine drives the point loop."""
    from nmpc_tpu.mpc.driver import MPCConfig, closed_loop

    sc = get("slsqp_pose_multi")
    assert sc.Nc == 2 and sc.v_max == 0.1 and sc.pos_bound == 3.0
    ocp = sc.make()
    cfg = gn.GNConfig(Nc=sc.Nc, n_gn=15, n_outer=6)
    r = jax.jit(functools.partial(
        closed_loop, mpc=MPCConfig(max_steps=120, stop_tol=sc.stop_tol),
        solve_fn=lambda o, w: gn.solve(o, w, cfg)))(ocp)
    x_fin = np.array(r.X_hist[-1])
    assert np.linalg.norm(x_fin - np.array(sc.x_goal)) <= sc.stop_tol + 1e-3
    U = np.array(r.U_hist)
    assert np.abs(U[:, 0]).max() <= sc.v_max + 1e-4
    assert np.abs(U[:, 1]).max() <= sc.omega_max + 1e-4


def test_lidar_v3_closed_loop_ilqr_engine():
    """v3 semantics (obs_avoid_static_first_scenario_v3.py): full control
    horizon, no 1/d proximity cost, solved by AL-iLQR through the
    closed_loop_lidar solve_fn override instead of the condensed GN path."""
    from nmpc_tpu.mpc.lidar import closed_loop_lidar
    from nmpc_tpu.solver.alilqr import ALILQRConfig, solve as ilqr_solve

    sc = get("lidar_v3")
    assert sc.Nc is None and sc.inv_dist_weight == 0.0
    # v3 has no 1/d proximity cost, so avoidance rests on the d >= ray_lo
    # bound alone. 10 rays at 36 deg spacing both miss small circles and
    # strike obliquely (ray range overstates perpendicular clearance), so the
    # bound carries a discretization margin: ray_lo = 0.25 keeps the true
    # surface clearance above the 0.15 robot radius.
    ocp = sc.make(N=30, ray_lo=0.25)
    obstacles = jnp.array([[0.5, 0.25, 0.2]], jnp.float32)
    wps = jnp.asarray(sc.waypoints[:1], jnp.float32)
    icfg = ALILQRConfig(n_outer=10, n_inner=20, tol_con=1e-3)
    X, U, clr, gidx, done = jax.jit(functools.partial(
        closed_loop_lidar, sim_obstacles=obstacles, waypoints=wps,
        solve_fn=lambda o, w: ilqr_solve(o, w, icfg), max_steps=400))(ocp)
    assert float(clr.min()) >= 0.15 - 1e-2
    assert int(gidx[-1]) >= 1
    U = np.array(U)
    assert np.abs(U[:, 0]).max() <= 0.15 + 1e-3
    assert np.abs(U[:, 1]).max() <= 1.5 + 1e-3


def test_gn_batched_matches_per_scenario():
    """solve_batched (the family-I fleet engine: one dense [B, Nc*nu, Nc*nu]
    Cholesky per GN iteration on the MXU) equals element-wise gn.solve on a
    jittered lidar_v4 batch."""
    import dataclasses

    sc = get("lidar_v4")
    base = sc.make(N=30)
    # frozen obstacle points ahead-left of the path so rays actually bind
    import jax.numpy as jnp
    from nmpc_tpu.mpc.lidar import obstacle_points

    angles = jnp.arange(10) * 2 * jnp.pi / 10
    p_obs = obstacle_points(base.x0[:3], jnp.full((10,), 1.2), angles)
    base = dataclasses.replace(
        base,
        p_obs=p_obs,
        x0=base.x0.at[3:].set(1.2),
        xref=jnp.tile(
            jnp.concatenate([jnp.asarray(sc.waypoints[0], jnp.float32),
                             jnp.zeros((10,), jnp.float32)])[None],
            (30, 1)),
    )
    B = 3
    x0s = jnp.stack([base.x0, base.x0.at[0].add(0.05), base.x0.at[1].add(-0.05)])
    ob = dataclasses.replace(base, x0=x0s,
                             xref=jnp.broadcast_to(base.xref[None], (B, 30, 13)))
    cfg = gn.GNConfig(Nc=15, n_gn=12, n_outer=6, tol_con=1e-3)
    rb = jax.jit(functools.partial(gn.solve_batched, cfg=cfg))(ob)
    assert rb.U.shape == (B, 30, 2)
    r0 = jax.jit(functools.partial(gn.solve, cfg=cfg))(base)
    np.testing.assert_allclose(np.asarray(rb.cost[0]), np.asarray(r0.cost), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rb.U[0]), np.asarray(r0.U), atol=1e-4)


def test_lidar_v2_closed_loop():
    """v2 semantics (obs_avoid_static_first_scenario_v2.py): ray distances as
    their own decision rows with 1-norm equality dynamics and bound
    D >= robot_radius (:89,138-143,177) — the same transcription as the
    augmented-state model with no 1/d cost and full control horizon, which is
    how the registry encodes it. v2's faster actuator limits (0.22/2.84)
    and bigger radius (0.2) distinguish it from v3."""
    from nmpc_tpu.mpc.lidar import closed_loop_lidar
    from nmpc_tpu.solver.alilqr import ALILQRConfig, solve as ilqr_solve

    sc = get("lidar_v2")
    assert sc.Nc is None and sc.inv_dist_weight == 0.0
    assert sc.v_max == 0.22 and sc.robot_radius == 0.2
    ocp = sc.make(N=30, ray_lo=0.3)  # discretization margin (see v3 test)
    obstacles = jnp.array([[0.5, 0.25, 0.15]], jnp.float32)
    wps = jnp.asarray(sc.waypoints[:1], jnp.float32)
    icfg = ALILQRConfig(n_outer=10, n_inner=20, tol_con=1e-3)
    X, U, clr, gidx, done = jax.jit(functools.partial(
        closed_loop_lidar, sim_obstacles=obstacles, waypoints=wps,
        solve_fn=lambda o, w: ilqr_solve(o, w, icfg), max_steps=400))(ocp)
    assert float(clr.min()) >= 0.2 - 2e-2
    assert int(gidx[-1]) >= 1
    U = np.array(U)
    assert np.abs(U[:, 0]).max() <= 0.22 + 1e-3
    assert np.abs(U[:, 1]).max() <= 2.84 + 1e-3


def test_normal_scan_matches_dense_jacobian():
    """The forward-sensitivity scan (GNConfig.normal='scan') must produce
    the same normal equations as the materialized-Jacobian form — H = J'J,
    g = J'r to f32 tolerance at a random iterate, and the same optimum on
    the published lidar_v4 config. The scan form is what lifts the batched
    family-I fleet past the B~1024 HBM ceiling (the dense [B, n_res, nz]
    Jacobian; obs_avoid_static_first_scenario_v4.py:59-75)."""
    import dataclasses

    sc = get("lidar_v4")
    ocp = sc.make(N=40)
    R = sc.num_rays
    angles = ray_angles(R, jnp.float32)
    scan = np.full((R,), 3.5, np.float32)
    scan[1] = 0.9
    pose0 = np.asarray(sc.x0, np.float32)
    p_obs = obstacle_points(jnp.asarray(pose0), jnp.asarray(scan), angles)
    ocp = dataclasses.replace(
        ocp, p_obs=p_obs, x0=ocp.x0.at[3:].set(jnp.asarray(scan)))
    Nc = 20
    key = jax.random.PRNGKey(0)
    U_blk = 0.05 * jax.random.normal(key, (Nc, ocp.nu), ocp.x0.dtype)
    lam = 0.5 * jnp.abs(jax.random.normal(key, (ocp.N, ocp.n_con), ocp.x0.dtype))
    mu = jnp.asarray(10.0, ocp.x0.dtype)
    H1, g1 = gn._normal_scan(ocp, U_blk, lam, mu, Nc)
    flat = U_blk.reshape(-1)
    r = gn._residuals(ocp, U_blk, lam, mu)
    J = jax.jacfwd(
        lambda z: gn._residuals(ocp, z.reshape(Nc, ocp.nu), lam, mu))(flat)
    np.testing.assert_allclose(np.array(H1), np.array(J.T @ J),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.array(g1), np.array(J.T @ r),
                               rtol=2e-5, atol=2e-4)

    cfg_s = gn.GNConfig(Nc=Nc, n_gn=15, n_outer=6, normal="scan")
    cfg_d = gn.GNConfig(Nc=Nc, n_gn=15, n_outer=6, normal="dense")
    rs = jax.jit(functools.partial(gn.solve, cfg=cfg_s))(ocp)
    rd = jax.jit(functools.partial(gn.solve, cfg=cfg_d))(ocp)
    np.testing.assert_allclose(float(rs.cost), float(rd.cost), rtol=1e-3)
    assert float(rs.viol) < 1e-4
