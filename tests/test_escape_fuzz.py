"""Property-style fuzz of the escape/parking/retreat state machine.

VERDICT r4 weak #4: the escape law (mpc/driver._escape_control) is
load-bearing for arrival on several reference configs, and every regression
in it so far (gate-less push-through r2, creep-latch winding r4,
bearing-chasing r4) was found one hand-tuned scenario at a time. This test
makes the next one surface in CI instead: randomized near-antipodal circle
geometries across robot counts and seeds, asserting the three invariants
every closed loop must satisfy:

  1. ARRIVAL — the loop reaches the joint goal (the raw-angle stop norm,
     so any 2*pi theta winding automatically fails this);
  2. SAFETY — realized min pairwise clearance never dips below dmin
     (evaluated on the true plant state);
  3. BOUNDED THETA — no heading ever winds beyond one wrap of where it
     started/needs to be (|theta| < 2*pi + margin given theta0, theta_goal
     in [-pi, pi]).

Geometry family: m robots on a circle of jittered radius with jittered
angular positions (minimum angular separation enforced so starts are
feasible), goals near-antipodal with positional jitter, headings uniform in
[-pi, pi] — the same class as the reference's hardest published formations
(six-robot antipodal swap), randomized. A noisy variant runs the
Gazebo-plausible noise model of tests/test_rt_mode.py over extra seeds.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmpc_tpu.mpc.driver import MPCConfig, closed_loop
from nmpc_tpu.ocp.problem import OCP_META, make_ocp
from nmpc_tpu.scenarios import get  # noqa: F401  (parity with other tests)
from nmpc_tpu.sim.plant import PlantConfig
from nmpc_tpu.solver.alilqr import ALILQRConfig

CFG = ALILQRConfig(n_outer=6, n_inner=12, tol_con=1e-4)
DMIN = 0.3


def _random_geometry(m: int, seed: int):
    """Jittered circle start, near-antipodal goals, random headings.

    Starts: equally spaced angles +- 25% of the half-spacing, radius in
    [0.9, 1.3] — min start separation 2*0.9*sin(pi/m * 0.75) (<- 0.62 m at
    m=6), comfortably above dmin. Goals: the antipodal point +- 8 cm of
    positional jitter (goal-goal separation stays > dmin + 0.2)."""
    rng = np.random.default_rng(seed)
    spacing = 2 * np.pi / m
    ang = np.arange(m) * spacing + rng.uniform(-0.25, 0.25, m) * spacing
    r = rng.uniform(0.9, 1.3)
    px, py = r * np.cos(ang), r * np.sin(ang)
    th = rng.uniform(-np.pi, np.pi, m)
    gx = -px + rng.uniform(-0.08, 0.08, m)
    gy = -py + rng.uniform(-0.08, 0.08, m)
    gth = rng.uniform(-np.pi, np.pi, m)
    x0 = np.stack([px, py, th], axis=1).reshape(-1)
    xg = np.stack([gx, gy, gth], axis=1).reshape(-1)
    return x0.astype(np.float32), xg.astype(np.float32)


def _batched_loops(m: int, seeds, mpc: MPCConfig, plant=PlantConfig(),
                   keys=None):
    """One compile per m: vmap the whole jitted closed loop over stacked
    (x0, xref) leaves (and noise keys when given)."""
    geoms = [_random_geometry(m, s) for s in seeds]
    base = make_ocp(m=m, N=12, T=0.2,
                    x0=geoms[0][0], x_goal=geoms[0][1],
                    dmin=DMIN, collision=True)
    x0s = jnp.stack([jnp.asarray(g[0]) for g in geoms])
    xrefs = jnp.stack([jnp.tile(jnp.asarray(g[1])[None], (base.N, 1))
                       for g in geoms])
    ocp_b = dataclasses.replace(base, x0=x0s, xref=xrefs)
    axes = dataclasses.replace(
        ocp_b, x0=0, xref=0,
        **{f.name: None for f in dataclasses.fields(ocp_b)
           if f.name not in ("x0", "xref") and f.name not in OCP_META})
    if keys is None:
        fn = jax.jit(jax.vmap(
            lambda o: closed_loop(o, solver_cfg=CFG, mpc=mpc, plant=plant),
            in_axes=(axes,)))
        return fn(ocp_b)
    fn = jax.jit(jax.vmap(
        lambda o, k: closed_loop(o, solver_cfg=CFG, mpc=mpc, plant=plant,
                                 key=k),
        in_axes=(axes, 0)))
    return fn(ocp_b, keys)


def _check_invariants(r, m: int, seeds, noisy: bool = False,
                      delay: bool = False):
    B = len(seeds)
    for i in range(B):
        su = int(r.steps_used[i])
        tag = (m, seeds[i])
        assert bool(r.reached[i]), (
            f"{tag}: no arrival (err {float(r.err_hist[i, su - 1]):.3f} "
            f"after {su} steps)")
        md = float(jnp.min(r.min_dist_hist[i, : su + 1]))
        # Slack calibration (measured, round 5): on random planned-touching
        # crossings the 6x12 solver leaves AL-transient violations up to
        # ~1.6e-2 (in d^2) on ~10% of steps mid-crossing, which realizes as
        # clearance dips of up to ~2e-2 below dmin — the same class as the
        # pinned reference configs (six-robot hw pin allows 1.5e-2). 3e-2
        # (4e-2 noisy, matching test_rt_mode's untightened pin) still fails
        # loudly on the actual historical law bugs (the r2 gate bug realized
        # 0.008 — 0.29 below the floor).
        slack = 4e-2 if noisy else 3e-2
        if delay:
            # uncompensated one-period actuation delay: two robots can close
            # at ~2*v_max*T = 0.088 m while the stale control is in flight
            # (docs/CL_PARITY.md six_robot_impl measures the same band).
            # The bound carries 25% headroom because it composes with the
            # AL transient non-additively (the planned pair can ALREADY sit
            # at the transient-eroded ring when the slide starts) and
            # backends legitimately pick different crossing orders:
            # measured worst erosion 0.072 on TPU, 0.120 on CPU (m=6
            # seed 20) vs the 0.140 allowance here. The historical law
            # bugs realized 0.008 — still 0.15 below this floor.
            slack += 1.25 * (2 * 0.22 * 0.2)
        assert md >= DMIN - slack, f"{tag}: clearance violated ({md:.3f})"
        thetas = np.asarray(r.X_hist[i, : su + 1]).reshape(su + 1, m, 3)[:, :, 2]
        # No winding latch: theta0/goals lie in [-pi, pi], so any |theta|
        # beyond 2*pi is wrong-way rotation. Transient crossing maneuvers
        # (and noisy dithering) measure up to ~1 rad of it; the historical
        # pathologies this guards against measured 7.3-11.8 rad (1-2 FULL
        # spurious turns: the wrapped-dth alignment bug and the
        # bearing-chase circulation, both fixed round 5).
        th_bound = 2 * np.pi + (2.0 if noisy else 0.5)
        assert np.abs(thetas).max() < th_bound, (
            f"{tag}: theta wound to {np.abs(thetas).max():.2f}")


@pytest.mark.slow
@pytest.mark.parametrize("m,seeds", [(2, (0, 1, 2, 3)),
                                     (3, (40, 41, 42)),
                                     (4, (10, 11, 12)),
                                     (5, (50, 51, 52)),
                                     (6, (20, 21, 22))])
def test_escape_law_fuzz_deterministic(m, seeds):
    """Randomized near-antipodal geometries, deterministic plant: arrival +
    zero realized-clearance violations + bounded theta for every seed."""
    mpc = MPCConfig(max_steps=400, stop_tol=1e-1, escape=True)
    r = _batched_loops(m, seeds, mpc)
    _check_invariants(r, m, seeds)


@pytest.mark.slow
@pytest.mark.parametrize("m,seeds", [(2, (0, 1, 2, 3)),
                                     (4, (10, 11, 12)),
                                     (6, (20, 21, 22))])
def test_escape_law_fuzz_delay(m, seeds):
    """Same geometry class at the reference's hardware timing — delay=1,
    the uncompensated one-period actuation lag of the real deployment
    (centralized_six_robots_implementation.py's solve-while-moving loop).
    Arrival and bounded theta must survive the lag; realized clearance may
    erode below dmin by at most the one-period closing bound (see
    _check_invariants). Calibrated round 5 on TPU: all seeds arrive within
    140 steps, worst erosion 0.072, worst |theta| 5.11."""
    mpc = MPCConfig(max_steps=600, stop_tol=1e-1, escape=True, delay=1)
    r = _batched_loops(m, seeds, mpc)
    _check_invariants(r, m, seeds, delay=True)


@pytest.mark.slow
def test_escape_law_fuzz_noisy():
    """Same property under the Gazebo-plausible noise model (process +
    odometry noise, actuator saturation — the test_rt_mode.py magnitudes):
    the state machine's debounce/deadband logic must hold its invariants
    when stalls flicker at noise scale."""
    m, seeds = 4, (30, 31, 32)
    pn = jnp.tile(jnp.asarray([5e-3, 5e-3, 1e-2], jnp.float32), m)
    on = jnp.tile(jnp.asarray([2e-3, 2e-3, 5e-3], jnp.float32), m)
    plant = PlantConfig(
        u_sat=jnp.tile(jnp.asarray([0.22, 2.84], jnp.float32), m),
        process_noise=pn, odom_noise=on)
    # noise roughly doubles arrival times (measured worst 684 steps on
    # seed 32); budget with the >= 1.5x margin rule
    mpc = MPCConfig(max_steps=1100, stop_tol=1e-1, escape=True)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds))
    r = _batched_loops(m, seeds, mpc, plant=plant, keys=keys)
    _check_invariants(r, m, seeds, noisy=True)
