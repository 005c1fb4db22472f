from nmpc_tpu.solver.alilqr import (  # noqa: F401
    ALILQRConfig,
    SolveResult,
    WarmStart,
    cold_start,
    solve,
)
