from nmpc_tpu.solver.alilqr import (  # noqa: F401
    ALILQRConfig,
    SolveResult,
    WarmStart,
    cold_start,
    solve,
)
from nmpc_tpu.solver.gn import GNConfig  # noqa: F401
from nmpc_tpu.solver.gn import solve as gn_solve  # noqa: F401
from nmpc_tpu.solver.admm import ADMMConfig, qp_setup, qp_solve  # noqa: F401
from nmpc_tpu.solver.alilqr_batched import solve_batched, solve_one  # noqa: F401
