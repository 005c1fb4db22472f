from nmpc_tpu.ops.assoc_lqr import parallel_lqr_gains, sequential_lqr_gains  # noqa: F401
