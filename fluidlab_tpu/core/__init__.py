from fluidlab_tpu.core import bspline, quat, svd3  # noqa: F401
