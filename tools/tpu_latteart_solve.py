"""Full-stack LatteArt trajectory-optimization iterations on real TPU.

Round-1 status: env build + target recording run on hardware (pallas
transfers, ~0.3 s/step at 46k particles), but the first fwd+bwd solve
iteration crashes the TPU worker — with BOTH pallas and portable
transfers and remat windows 50/20, while agent-free fwd+bwd at the same
N works (tools/bench_grad.py).  Prime suspects: injection-AD or the
loss-target scan xs.  Kept as the round-2 repro."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from fluidlab_tpu.envs.tasks import LatteArtEnv
from fluidlab_tpu.optimizer.recorder import Recorder
from fluidlab_tpu.optimizer.solver import Solver

class SmallLatte(LatteArtEnv):
    horizon = 100
    horizon_action = 80
    max_substeps_local = 20  # remat window 2 steps: bound bwd residency
    def __init__(self, **kw):
        kw.setdefault("particle_density", 4e5)
        super().__init__(**kw)
    def setup_renderer(self):
        self.sim.renderer = None
    def setup_loss(self):
        self.target_file = "/tmp/latte_tpu_target.pkl"
        super().setup_loss()

t0 = time.time()
env = SmallLatte(loss=False, seed=0)
env.target_file = "/tmp/latte_tpu_target.pkl"
print(f"env: N={env.sim.cfg.n_particles} transfers={env.sim.cfg.p2g_impl}/"
      f"{env.sim.cfg.g2p_impl} binning={env.sim.cfg.binning_mode} "
      f"({time.time()-t0:.0f}s)", flush=True)
Recorder(env).record()
print(f"target recorded ({time.time()-t0:.0f}s)", flush=True)

env2 = SmallLatte(loss=True, seed=0)
solver = Solver(env2, cfg=dict(
    n_iters=3,
    init_range=dict(v=((0.,0.,0.),(0.,0.,0.)), p=((0.15,0.65,0.5),(0.15,0.65,0.5))),
    optim=dict(type="Adam", lr=1e-3, beta_1=0.9, beta_2=0.99),
))
solver.solve()
print("LATTEART TPU SOLVE: DONE", flush=True)
