"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(mesh/pjit/shard_map/ppermute) are exercised without TPU hardware — the
pattern SURVEY.md §4 prescribes.

Note: this environment's sitecustomize force-registers a TPU PJRT plugin and
overrides the jax_platforms config, so we must re-force "cpu" via
jax.config *after* importing jax (env vars alone are not honored).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# NMPC_TPU_TESTS=1 leaves the platform alone so @pytest.mark.tpu tests
# (run with `NMPC_TPU_TESTS=1 pytest -m tpu`) exercise real hardware —
# e.g. the megakernel VMEM-gate admission test actually compiles on chip.
if not os.environ.get("NMPC_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
