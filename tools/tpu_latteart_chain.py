"""Chained full-spec LatteArt trajectory optimization on real TPU.

Drives the reference's complete LatteArt configuration
(exp_latteart.yaml: particle density 1e6 -> 115,480 particles, horizon
330, action horizon 250, Adam lr 1e-3, n_iters 500) toward the full
500-iteration budget by running SEGMENTS of FL_CHAIN_SEG iterations per
process and persisting the complete resume state (actions + Adam
moments + curriculum + iteration counter) between processes — the
course is identical to an uninterrupted run
(tests/test_envs_solver.py::test_chained_solve_matches_uninterrupted).

State: FL_CHAIN_STATE (default /tmp/latte_chain_state.pkl).
Course:  FL_CHAIN_COURSE (default /tmp/latte_chain_course.log), one
"iter loss seconds" line per iteration.  Run under tools/tpu_retry.sh
in a loop (tools/r4_latte_chain.sh) until iter >= FL_CHAIN_TARGET.

Reference anchor: fluidlab/optimizer/solver.py:17-71, exp_latteart.yaml.
"""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

from fluidlab_tpu.envs.tasks import LatteArtEnv
from fluidlab_tpu.optimizer.recorder import Recorder
from fluidlab_tpu.optimizer.solver import Solver

STATE = os.environ.get("FL_CHAIN_STATE", "/tmp/latte_chain_state.pkl")
COURSE = os.environ.get("FL_CHAIN_COURSE", "/tmp/latte_chain_course.log")
TARGET_PKL = os.environ.get("FL_CHAIN_TARGET_PKL", "/tmp/latte_tpu_target.pkl")
SEG = int(os.environ.get("FL_CHAIN_SEG", 10))
TARGET_ITERS = int(os.environ.get("FL_CHAIN_TARGET", 500))


class FullLatte(LatteArtEnv):
    horizon = int(os.environ.get("FL_LATTE_H", 330))
    horizon_action = int(os.environ.get("FL_LATTE_HA", 250))
    max_substeps_local = 20

    def __init__(self, **kw):
        kw.setdefault("particle_density",
                      float(os.environ.get("FL_LATTE_DENSITY", 1e6)))
        super().__init__(**kw)

    def setup_renderer(self):
        self.sim.renderer = None

    def setup_loss(self):
        self.target_file = TARGET_PKL
        super().setup_loss()


from _task_spec import ChainCourseLogger  # noqa: E402

BEST = os.environ.get(
    "FL_SOLVE_BEST_OUT", STATE.replace(".pkl", "_best_policy.pkl")
)


resume = None
if os.path.exists(STATE):
    with open(STATE, "rb") as f:
        resume = pickle.load(f)
    print(f"resuming at iteration {resume['iteration']}", flush=True)
    if resume["iteration"] >= TARGET_ITERS:
        print("CHAIN COMPLETE", flush=True)
        sys.exit(0)

t0 = time.time()
if not os.path.exists(TARGET_PKL):
    env0 = FullLatte(loss=False, seed=0)
    env0.target_file = TARGET_PKL
    Recorder(env0).record()
    print(f"target recorded ({time.time()-t0:.0f}s)", flush=True)
    del env0

env = FullLatte(loss=True, seed=0)
print(f"env: N={env.sim.cfg.n_particles} seg_len={env.sim.auto_seg_len()} "
      f"({time.time()-t0:.0f}s)", flush=True)

n_left = TARGET_ITERS - (resume["iteration"] if resume else 0)
solver = Solver(env, logger=ChainCourseLogger(COURSE, BEST), cfg=dict(
    n_iters=min(SEG, n_left),
    init_range=dict(v=((0., 0., 0.), (0., 0., 0.)),
                    p=((0.15, 0.65, 0.5), (0.15, 0.65, 0.5))),
    optim=dict(type="Adam", lr=1e-3, beta_1=0.9, beta_2=0.99),
    resume=resume,
))
policy = solver.solve()
snap = solver.snapshot()
tmp = STATE + ".tmp"
with open(tmp, "wb") as f:
    pickle.dump(snap, f)
os.replace(tmp, STATE)
print(f"SEGMENT DONE at iteration {snap['iteration']}", flush=True)
