from nmpc_tpu.utils.timing import PhaseTimer, latency_stats, time_fn  # noqa: F401
from nmpc_tpu.utils.runlog import RunLog, load_run, load_warm, save_run, save_warm  # noqa: F401
