"""Batched plant simulator — the Gazebo / real-TurtleBot3 replacement.

The reference closes its loop through ROS topics against Gazebo or hardware
(SURVEY.md §1 L1, §2.3). Here the plant is an on-device pure function so the
whole closed loop stays inside one jitted program:

  * model-in-loop mode reproduces `shift()` integrating the model
    (/root/reference/AllScripts/casadi_test.py:17-27,
     /root/reference/AllScripts/casadi_test_mpc.py:36-46);
  * `substeps` integrates the plant on a finer grid than the controller
    period, standing in for Gazebo's higher-rate physics;
  * actuator saturation models the TB3 velocity limits;
  * optional odometry/process noise emulates sensing imperfections.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from nmpc_tpu.models.unicycle import discrete_dynamics


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("u_sat", "process_noise", "odom_noise"),
    meta_fields=("substeps", "integrator"),
)
@dataclasses.dataclass(frozen=True)
class PlantConfig:
    substeps: int = 1
    integrator: str = "euler"
    u_sat: jax.Array | None = None       # [nu] actuator saturation, None = off
    process_noise: jax.Array | None = None  # [nx] std-dev, None = off
    odom_noise: jax.Array | None = None     # [nx] measurement std-dev, None = off


def plant_step(x: jax.Array, u: jax.Array, dt, cfg: PlantConfig = PlantConfig(), key=None):
    """Advance the true state one control period; returns (x_next, odom)."""
    if cfg.u_sat is not None:
        u = jnp.clip(u, -cfg.u_sat, cfg.u_sat)
    h = dt / cfg.substeps
    for _ in range(cfg.substeps):
        x = discrete_dynamics(x, u, h, cfg.integrator)
    if key is not None and cfg.process_noise is not None:
        key, sub = jax.random.split(key)
        x = x + cfg.process_noise * jax.random.normal(sub, x.shape, x.dtype)
    odom = x
    if key is not None and cfg.odom_noise is not None:
        _, sub = jax.random.split(key)
        odom = x + cfg.odom_noise * jax.random.normal(sub, x.shape, x.dtype)
    return x, odom
