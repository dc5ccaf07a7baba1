"""fluidlab_tpu — a TPU-native differentiable multi-material fluid framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of FluidLab
(zhouxian/FluidLab, ICLR 2023): FluidEngine (differentiable MLS-MPM +
Eulerian smoke) and the FluidLab task suite (gym envs + differentiable
trajectory optimization), built TPU-first:

- functional `SimState` pytrees threaded through `lax.scan` (the autodiff
  tape comes from scan + `jax.checkpoint`, replacing the reference's
  frame-window Taichi fields, cf. reference mpm_simulator.py:73-117),
- XLA scatter/gather particle-grid transfers with a Pallas fast path,
- batched multi-start trajectory optimization sharded over a
  `jax.sharding.Mesh` (the distributed layer the reference lacks).
"""

__version__ = "0.1.0"

import jax as _jax

# Physics integrity: the engine's hot path is huge batches of 3x3 matmuls
# (deformation gradients, stress, SVD) whose error compounds over tens of
# thousands of substeps and their gradients.  TPU default matmul precision
# is bf16-ish; force true f32 multiply-accumulate framework-wide.  Modules
# that want MXU-speed bf16 (e.g. future learned models) can override with
# a local ``jax.default_matmul_precision`` context.
_jax.config.update("jax_default_matmul_precision", "float32")

from fluidlab_tpu.config import materials  # noqa: F401,E402
