"""Closed-loop parity: the f64 oracle AS THE MPC SOLVER in the same driver.

The reference's product is the closed loop — solve, apply u*[0], sense,
repeat (/root/reference/AllScripts/
mpc_online_casadi_tb3_six_multi_centralized_collision_free.py:338-427) —
and its only multi-robot validation was closed-loop (SURVEY.md §4).
docs/PARITY.md compares single open-loop solves; this harness closes the
remaining fidelity axis by running the SLSQP f64 oracle (tests/oracle.py)
inside a step-exact Python replica of mpc/driver.closed_loop — same latch ->
solve -> escape -> plant -> shift semantics, same escape controller, same
exact-Euler plant — and comparing realized trajectories, arrival steps, and
min clearance against the engine's jitted loop.

Caveat recorded in the output: symmetric configs (the antipodal circles)
break symmetry on solver-noise-level differences, so realized trajectories
can legitimately diverge (mirror/rotate) while both loops are correct; the
robust comparisons are arrival, clearance, and final error. Trajectory
deviation is reported for the asymmetric configs where it is meaningful.

Writes docs/CL_PARITY.md. Runtime: tens of minutes (dominated by the
five/six-robot oracle solves; each MPC step is one warm-started SLSQP).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

# Engine loop runs on CPU: the same jitted program the test suite validates,
# and long closed-loop scans compile in seconds there vs many minutes on the
# tunneled TPU (docs/LATENCY.md covers on-device speed; this tool is about
# semantics). Must be set after importing jax (sitecustomize force-registers
# the TPU plugin).
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nmpc_tpu.mpc.driver import (  # noqa: E402
    MPCConfig,
    _escape_control,
    closed_loop,
    closed_loop_waypoints,
    escape_state0,
)
from nmpc_tpu.scenarios import get  # noqa: E402
from nmpc_tpu.solver.alilqr import ALILQRConfig  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))
from oracle import rollout_np, solve_oracle  # noqa: E402

ENGINE_CFG = ALILQRConfig(n_outer=10, n_inner=20, tol_con=1e-4)


def _plant_np(x, u, T):
    m = x.shape[0] // 3
    rhs = np.zeros_like(x)
    for i in range(m):
        v, w = u[2 * i], u[2 * i + 1]
        th = x[3 * i + 2]
        rhs[3 * i: 3 * i + 3] = [v * np.cos(th), v * np.sin(th), w]
    return x + T * rhs


def _min_pair_dist(x, m):
    if m < 2:
        return np.inf
    p = x[: 3 * m].reshape(m, 3)[:, :2]
    d = np.inf
    for i in range(m):
        for j in range(i + 1, m):
            d = min(d, float(np.hypot(*(p[i] - p[j]))))
    return d


def oracle_loop(sc, ocp, mpc: MPCConfig, waypoints=None, maxiter=200,
                log_every=25, wall_budget_s=None):
    """Python replica of the driver loop with solve_oracle as the solver.

    wall_budget_s bounds the f64 oracle's total wall clock (the five-robot
    config pays ~5-10 s of SLSQP per MPC step); a budgeted-out run returns
    budget_hit=True with the trajectory measured so far."""
    m = ocp.m
    x = np.array(ocp.x0, float)
    goals = (np.array(waypoints, float) if waypoints is not None
             else np.array(ocp.xref[-1], float)[None])
    G = goals.shape[0]
    gidx = 0
    dmin = float(np.sqrt(float(ocp.dmin2))) if ocp.n_pairs else 0.0
    obstacles = ([tuple(map(float, row)) for row in np.array(ocp.obstacles)]
                 if ocp.n_obs else None)
    U0 = None
    esc = escape_state0(m)
    done = jnp.zeros((), bool)
    X_hist = [x.copy()]
    min_d = _min_pair_dist(x, m)
    steps = 0
    budget_hit = False
    t0 = time.time()
    for step in range(mpc.max_steps):
        if wall_budget_s is not None and time.time() - t0 > wall_budget_s:
            budget_hit = True
            break
        goal = goals[min(gidx, G - 1)]
        err = float(np.linalg.norm(x - goal))
        if waypoints is not None:
            if err < mpc.advance_tol:
                gidx += 1
                esc = escape_state0(m)
                if gidx >= G:
                    break
                goal = goals[gidx]
                err = float(np.linalg.norm(x - goal))
        elif err < mpc.stop_tol:
            break
        U, _X, cost = solve_oracle(
            x, goal, ocp.N, float(ocp.T), dmin=dmin,
            v_max=float(ocp.u_hi[0]), omega_max=float(ocp.u_hi[1]),
            U0=U0, maxiter=maxiter, obstacles=obstacles,
            robot_radius=float(ocp.robot_radius),
            obs_margin=float(ocp.obs_margin),
        )
        u0 = U[0].copy()
        if mpc.escape:
            tol = mpc.advance_tol if waypoints is not None else mpc.stop_tol
            u0_j, esc = _escape_control(
                ocp, mpc, jnp.asarray(x, jnp.float32),
                jnp.asarray(goal, jnp.float32),
                jnp.asarray(u0, jnp.float32), esc, done, tol=tol)
            u0 = np.array(u0_j, float)
        x = _plant_np(x, u0, float(ocp.T))
        X_hist.append(x.copy())
        min_d = min(min_d, _min_pair_dist(x, m))
        U0 = np.concatenate([U[1:], U[-1:]], axis=0)
        steps = step + 1
        if log_every and steps % log_every == 0:
            print(f"    oracle step {steps} err {err:.3f} cost {cost:.2f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    goal = goals[min(gidx, G - 1)]
    reached = (gidx >= G) if waypoints is not None else (
        float(np.linalg.norm(x - goal)) < mpc.stop_tol)
    return dict(X=np.array(X_hist), steps=steps, reached=bool(reached),
                min_dist=min_d, final_err=float(np.linalg.norm(x - goal)),
                wall_s=time.time() - t0, budget_hit=budget_hit)


def engine_loop(sc, ocp, mpc: MPCConfig, waypoints=None):
    if waypoints is not None:
        r = jax.jit(functools.partial(
            closed_loop_waypoints, waypoints=jnp.asarray(waypoints, jnp.float32),
            solver_cfg=ENGINE_CFG, mpc=mpc))(ocp)
    else:
        r = jax.jit(functools.partial(
            closed_loop, solver_cfg=ENGINE_CFG, mpc=mpc))(ocp)
    su = int(r.steps_used)
    X = np.array(r.X_hist, float)[: su + 1]
    md = float(np.min(np.array(r.min_dist_hist)[: su + 1]))
    return dict(X=X, steps=su, reached=bool(r.reached), min_dist=md,
                final_err=float(np.array(r.err_hist)[min(su, mpc.max_steps - 1)]))


CONFIGS = [
    # name, max_steps, symmetric?, oracle maxiter, oracle wall budget [s]
    ("single_robot", 2400, False, 200, None),
    ("two_robot_swap", 1300, False, 200, None),
    ("obstacle_scenario_1", 1400, False, 200, None),
    ("six_robot_antipodal", 220, True, 150, None),
    ("five_robot", 900, False, 150, 2400.0),
]


def main(names=None):
    rows = []
    for name, max_steps, symmetric, maxiter, wall_budget in CONFIGS:
        if names and name not in names:
            continue
        sc = get(name)
        ocp = sc.make()
        wps = (np.array(sc.waypoint_array, float)
               if getattr(sc, "waypoints", None) else None)
        mpc = MPCConfig(max_steps=max_steps, stop_tol=sc.stop_tol,
                        advance_tol=0.075, escape=True)
        print(f"{name}: engine loop...", flush=True)
        e = engine_loop(sc, ocp, mpc, wps)
        print(f"  engine: steps {e['steps']} reached {e['reached']} "
              f"min_dist {e['min_dist']:.3f}", flush=True)
        print(f"{name}: oracle-in-the-loop...", flush=True)
        o = oracle_loop(sc, ocp, mpc, wps, maxiter=maxiter,
                        wall_budget_s=wall_budget)
        n = min(e["X"].shape[0], o["X"].shape[0])
        dev = float(np.abs(e["X"][:n, : 3 * ocp.m]
                           - o["X"][:n, : 3 * ocp.m]).max())
        rows.append(dict(name=name, sym=symmetric, budget=o["budget_hit"],
                         e_steps=e["steps"], o_steps=o["steps"],
                         e_reached=e["reached"], o_reached=o["reached"],
                         e_md=e["min_dist"], o_md=o["min_dist"],
                         e_err=e["final_err"], o_err=o["final_err"],
                         dev=dev, o_wall=o["wall_s"]))
        print(f"  oracle: steps {o['steps']} reached {o['reached']} "
              f"min_dist {o['min_dist']:.3f} wall {o['wall_s']:.0f}s "
              f"| traj dev {dev:.3e}", flush=True)
        _write_doc(rows)  # incremental: a killed run still leaves the rows
                          # measured so far (same pattern as gen_parity)
    _write_doc(rows)


def _write_doc(rows):
    dmin_of = {r["name"]: float(np.sqrt(float(get(r["name"]).make().dmin2)))
               for r in rows}
    out = [
        "# Closed-loop parity: f64 oracle as the in-loop solver\n\n",
        "Generated by `tools/gen_cl_parity.py` (see its docstring). Same\n",
        "driver semantics on both sides (latch -> solve -> escape -> exact-\n",
        "Euler plant -> shift warm start); only the solver differs: the\n",
        "engine (AL-iLQR, f32, on this machine's default JAX backend) vs\n",
        "the condensed f64 SLSQP oracle with exact sensitivities\n",
        "(tests/oracle.py), warm-started across steps exactly like the\n",
        "reference warm-starts IPOPT.\n\n",
        "| config | arrived (eng/orc) | steps (eng/orc) | min clearance "
        "(eng/orc) | dmin | final err (eng/orc) | traj dev |\n",
        "|---|---|---|---|---|---|---|\n",
    ]
    for r in rows:
        dev_s = (f"{r['dev']:.2e}" if not r["sym"]
                 else f"{r['dev']:.2e} (symmetric config: mirrored "
                      "crossings are equally optimal)")
        o_mark = ("budget" if r.get("budget") else str(r["o_reached"]))
        out.append(
            f"| {r['name']} | {r['e_reached']}/{o_mark} "
            f"| {r['e_steps']}/{r['o_steps']} "
            f"| {r['e_md']:.3f}/{r['o_md']:.3f} | {dmin_of[r['name']]:.2f} "
            f"| {r['e_err']:.3f}/{r['o_err']:.3f} | {dev_s} |\n")
    out.append(
        "\nBoth loops must arrive, keep clearance above dmin, and land at\n"
        "comparable step counts; per-step trajectory deviation is the\n"
        "strictest check and is only meaningful for asymmetric configs.\n")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "docs", "CL_PARITY.md")
    with open(path, "w") as f:
        f.writelines(out)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or None)
