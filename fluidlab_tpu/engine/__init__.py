from fluidlab_tpu.engine.types import (  # noqa: F401
    EffectorState,
    ParticleState,
    SimState,
    SmokeState,
)
