"""float64 validation (SURVEY.md §7.3 hard part 2): the engine's math is
dtype-agnostic; running in f64 on CPU must reproduce the f32 solutions to
f32 accuracy and drive violations far below the f32 floor. Runs in a
subprocess so the global x64 flag can't leak into other tests."""

import subprocess
import sys

import pytest

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import functools
import numpy as np
import jax.numpy as jnp
from nmpc_tpu.ocp.problem import make_ocp
from nmpc_tpu.solver.alilqr import ALILQRConfig, solve

cfg = ALILQRConfig(tol_cost=1e-12, n_inner=60, n_outer=30, tol_con=1e-8, mu_max=1e8)
ocp = make_ocp(m=2, N=30, T=0.1,
               x0=[-0.4, 0, 0, 0.4, 0, np.pi],
               x_goal=[0.5, 0, 0, -0.5, 0, np.pi],
               dmin=0.3, collision=True, dtype=jnp.float64)
res = jax.jit(functools.partial(solve, cfg=cfg))(ocp)
assert res.U.dtype == jnp.float64
viol = float(res.viol)
assert viol < 1e-6, f"f64 viol {viol}"  # ~100x below the f32 floor
print("OK", float(res.cost), viol)
"""


@pytest.mark.slow
def test_f64_solve_subprocess():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True, text=True, timeout=480, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout
