from nmpc_tpu.scenarios.registry import REGISTRY, Scenario, get  # noqa: F401
