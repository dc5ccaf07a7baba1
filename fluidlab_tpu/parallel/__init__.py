from fluidlab_tpu.parallel.planner import (  # noqa: F401
    MultiStartPlanner,
    make_rollout_mesh,
)
