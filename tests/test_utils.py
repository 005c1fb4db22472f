"""Timing + run-artifact utilities."""

import functools

import jax
import numpy as np

from nmpc_tpu.mpc.driver import MPCConfig, closed_loop
from nmpc_tpu.ocp.problem import make_ocp
from nmpc_tpu.solver.alilqr import ALILQRConfig
from nmpc_tpu.utils import PhaseTimer, latency_stats, load_run, save_run, time_fn


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("build"):
        sum(range(1000))
    with t.phase("build"):
        pass
    s = t.summary()
    assert s["build"]["count"] == 2
    assert s["build"]["total_s"] >= 0


def test_latency_stats():
    s = latency_stats([0.001, 0.002, 0.01])
    assert s["p50_ms"] <= s["p99_ms"] <= s["max_ms"]
    assert s["n"] == 3


def test_time_fn():
    f = jax.jit(lambda x: x * 2)
    out, stats = time_fn(f, np.ones(8), iters=3, warmup=1)
    assert stats["n"] == 3


def test_save_load_run(tmp_path):
    ocp = make_ocp(m=1, N=10, T=0.1, x0=[0, 0, 0], x_goal=[0.5, 0.5, 0])
    r = jax.jit(functools.partial(
        closed_loop,
        solver_cfg=ALILQRConfig(n_outer=3, n_inner=5),
        mpc=MPCConfig(max_steps=30, stop_tol=1e-1, escape=True),
    ))(ocp)
    p = tmp_path / "run.npz"
    log = save_run(p, r, meta={"scenario": "unit"})
    back = load_run(p)
    assert back.meta["scenario"] == "unit"
    np.testing.assert_allclose(back.X_hist, np.asarray(r.X_hist))
    assert isinstance(back.summary()["reached"], bool)
