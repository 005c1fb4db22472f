"""Closed-loop parity: the f64 oracle as the in-loop solver (slow suite).

The reference's product is the closed loop — solve, apply u*[0], sense,
repeat (/root/reference/AllScripts/
mpc_online_casadi_tb3_six_multi_centralized_collision_free.py:338-427) —
and its only multi-robot validation was closed-loop (SURVEY.md §4). This
pins the headline scenario's loop-level agreement between the engine and
the condensed f64 SLSQP oracle running inside the SAME driver semantics
(tools/gen_cl_parity.py; full table in docs/CL_PARITY.md).

The antipodal config is symmetric, so realized trajectories may
legitimately mirror between solvers; the pinned comparisons are the
scalar loop outcomes: arrival, arrival-step count class, and realized
min pairwise clearance vs dmin.
"""

import os
import sys

import numpy as np
import pytest

from nmpc_tpu.mpc.driver import MPCConfig
from nmpc_tpu.scenarios import get

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


@pytest.mark.slow
def test_cl_parity_six_robot_antipodal():
    from gen_cl_parity import engine_loop, oracle_loop

    sc = get("six_robot_antipodal")
    ocp = sc.make()
    dmin = float(np.sqrt(float(ocp.dmin2)))
    mpc = MPCConfig(max_steps=220, stop_tol=sc.stop_tol,
                    advance_tol=0.075, escape=True)
    e = engine_loop(sc, ocp, mpc)
    o = oracle_loop(sc, ocp, mpc, maxiter=150, log_every=0)
    # both loops complete the paper's headline maneuver...
    assert e["reached"], e
    assert o["reached"], o
    # ...collision-free against the true dmin...
    assert e["min_dist"] >= dmin - 1e-2, e["min_dist"]
    assert o["min_dist"] >= dmin - 1e-2, o["min_dist"]
    # ...in the same arrival-step class (neither solver is allowed to need
    # a qualitatively different maneuver; 2x covers symmetric-crossing
    # variation between distinct-but-equally-optimal rotations)
    hi, lo = max(e["steps"], o["steps"]), min(e["steps"], o["steps"])
    assert hi <= 2 * lo + 20, (e["steps"], o["steps"])
