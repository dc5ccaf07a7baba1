from fluidlab_tpu.config import materials  # noqa: F401
from fluidlab_tpu.config.materials import *  # noqa: F401,F403
