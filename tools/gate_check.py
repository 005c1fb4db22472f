"""Compile-and-run smoke check of the megakernel gate for one scenario.

Usage: python tools/gate_check.py <scenario-name>
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if len(sys.argv) < 2:
    sys.exit("usage: python tools/gate_check.py <scenario-name>")

import jax, numpy as np
from nmpc_tpu.scenarios import get
from nmpc_tpu.solver.alilqr import ALILQRConfig
from nmpc_tpu.solver.alilqr_batched import solve_batched
from nmpc_tpu.parallel.batch import batch_ocp
from nmpc_tpu.ops.megasolve_pallas import mega_fits

name = sys.argv[1]
cfg = ALILQRConfig(n_outer=2, n_inner=4, tol_con=1e-3)
ocp = get(name).make()
assert mega_fits(ocp), name
ob = batch_ocp(ocp, ocp.x0[None])
t0 = time.time()
res = jax.jit(functools.partial(solve_batched, cfg=cfg))(ob)
c = float(res.cost[0])
assert np.isfinite(c), name
print(f"{name}: OK cost={c:.3f} compile+run {time.time()-t0:.1f}s")
