from fluidlab_tpu.losses.base import Loss  # noqa: F401
from fluidlab_tpu.losses.shapematching import ShapeMatchingLoss  # noqa: F401
from fluidlab_tpu.losses.tasks import (  # noqa: F401
    CirculationLoss,
    GatheringEasyLoss,
    GatheringOLoss,
    IceCreamDynamicLoss,
    IceCreamStaticLoss,
    LatteArtLoss,
    LatteArtStirLoss,
    MixingLoss,
    PouringLoss,
    RLTestLoss,
    ScoopingLoss,
    StabilizingLoss,
    TransportingLoss,
)
