"""Paper headline demo: six robots swap antipodally on the unit circle,
collision-free and deadlock-free, entirely as one jitted program.

    python examples/six_robot_swap.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from nmpc_tpu.mpc.driver import MPCConfig, closed_loop
from nmpc_tpu.scenarios import get
from nmpc_tpu.solver.alilqr import ALILQRConfig
from nmpc_tpu.utils import save_run


def main():
    sc = get("six_robot_antipodal")
    ocp = sc.make()
    run = jax.jit(functools.partial(
        closed_loop,
        solver_cfg=ALILQRConfig(n_outer=15, n_inner=25, tol_con=1e-4),
        mpc=MPCConfig(max_steps=120, stop_tol=sc.stop_tol, escape=True),
    ))
    t0 = time.time()
    r = run(ocp)
    r.X_hist.block_until_ready()
    print(f"solved closed loop in {time.time() - t0:.1f} s wall "
          f"({int(r.steps_used)} MPC steps, {int(r.steps_used) * 0.2:.1f} s sim)")
    print(f"reached={bool(r.reached)}  min pair distance="
          f"{float(np.min(np.asarray(r.min_dist_hist))):.4f} (dmin={sc.dmin})")
    X = np.asarray(r.X_hist)
    # ASCII trace of robot 1's crossing
    for k in range(0, int(r.steps_used) + 1, 15):
        p = X[k].reshape(6, 3)
        print(f"  t={k * 0.2:5.1f}s  " + "  ".join(
            f"r{i}({p[i, 0]:+.2f},{p[i, 1]:+.2f})" for i in range(3)))
    save_run("artifacts/six_robot_swap", r, meta={"scenario": sc.name})
    print("trajectory artifact: artifacts/six_robot_swap.npz")


if __name__ == "__main__":
    main()
