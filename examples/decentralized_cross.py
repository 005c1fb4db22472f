"""Decentralized-mode demo: four robots cross the intersection with no
central solver — each runs its own 3-state NMPC against the neighbors'
exchanged plans (right-hand traffic rule breaks the symmetry).

    python examples/decentralized_cross.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nmpc_tpu.parallel.decentralized import decentralized_closed_loop


def main():
    x0 = jnp.array([-0.8, 0, 0, 0.8, 0, np.pi, 0, -0.8, np.pi / 2, 0, 0.8, -np.pi / 2],
                   jnp.float32)
    goals = jnp.array([[0.8, 0, 0], [-0.8, 0, np.pi], [0, 0.8, np.pi / 2],
                       [0, -0.8, -np.pi / 2]], jnp.float32)
    X, U, mind, done = jax.jit(functools.partial(
        decentralized_closed_loop, N=30, T=0.1, dmin=0.3, max_steps=250))(x0, goals)
    print(f"all reached: {bool(done)}   min inter-robot distance: "
          f"{float(mind.min()):.3f} (dmin=0.3)")
    Xn = np.asarray(X)
    for k in range(0, Xn.shape[0], 40):
        p = Xn[k].reshape(4, 3)
        print("  " + "  ".join(f"r{i}({p[i,0]:+.2f},{p[i,1]:+.2f})" for i in range(4)))


if __name__ == "__main__":
    main()
