from fluidlab_tpu.optimizer.optim import Adam, Optimizer  # noqa: F401
from fluidlab_tpu.optimizer.policies import (  # noqa: F401
    ActionsPolicy,
    TrainablePolicy,
)
from fluidlab_tpu.optimizer.solver import Solver, solve_policy  # noqa: F401
