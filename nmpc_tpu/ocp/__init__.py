from nmpc_tpu.ocp.problem import (  # noqa: F401
    OCP,
    default_weights,
    num_pairs,
    stage_cost,
    stage_constraints,
    pairwise_sq_distances,
    al_penalty,
    rollout,
)
