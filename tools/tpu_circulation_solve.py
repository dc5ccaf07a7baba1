"""Circulation trajectory-optimization iterations on real TPU — the
end-to-end exercise of the smoke kernels' hand-written adjoints
(ops/smoke_pallas.py) inside the solver loop.

Mini config: reference scene (128^3 smoke, 50 Jacobi iters, AirCon
8-D agent, thermometer-voxel loss) at horizon 20 instead of 1000.

Env: FL_SOLVE_ITERS (default 3).  Chaining: FL_CHAIN_STATE (resume
snapshot pkl, written on exit; resumes Adam moments + curriculum +
iteration counter + CirculationPolicy's plateau-lr schedule state) and
FL_CHAIN_COURSE (per-iteration "iter loss seconds lr" lines).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fluidlab_tpu.envs.tasks import CirculationEnv  # noqa: E402
from fluidlab_tpu.optimizer.solver import Solver  # noqa: E402


class MiniCirculation(CirculationEnv):
    horizon = int(os.environ.get("FL_CIRC_H", 20))
    horizon_action = int(os.environ.get("FL_CIRC_H", 20))
    max_substeps_local = 10

    def setup_renderer(self):
        self.sim.renderer = None


t0 = time.time()
env = MiniCirculation(loss=True, seed=0)
print(f"env built: smoke res={env.smoke_res} jacobi="
      f"{env.smoke_solver_iters} H={env.horizon} ({time.time()-t0:.0f}s)",
      flush=True)
cfg = __import__('fluidlab_tpu.config.experiments', fromlist=['load_config']).load_config('circulation')
warmstart = None
ws_pkl = os.environ.get("FL_SOLVE_WARMSTART")
if ws_pkl:
    import pickle as _pkl
    with open(ws_pkl, "rb") as f:
        warmstart = _pkl.load(f)
    print(f"warm-starting from {ws_pkl}", flush=True)

STATE = os.environ.get("FL_CHAIN_STATE")
COURSE = os.environ.get("FL_CHAIN_COURSE")
resume = None
if STATE and os.path.exists(STATE):
    import pickle as _pkl
    with open(STATE, "rb") as f:
        resume = _pkl.load(f)
    warmstart = None
    print(f"resuming at iteration {resume['iteration']}", flush=True)


from _task_spec import ChainCourseLogger  # noqa: E402

OUT_PKL = os.environ.get("FL_SOLVE_POLICY_OUT")
BEST = os.environ.get("FL_SOLVE_BEST_OUT") or (
    OUT_PKL.replace(".pkl", "_best.pkl") if OUT_PKL else None
)


solver = Solver(env, logger=ChainCourseLogger(COURSE, BEST), cfg=dict(
    n_iters=int(os.environ.get("FL_SOLVE_ITERS", 3)),
    init_range=cfg["SOLVER"]["init_range"],
    optim=cfg["SOLVER"]["optim"],
    warmstart=warmstart,
    resume=resume,
))
policy = solver.solve()
if STATE:
    import pickle as _pkl
    snap = solver.snapshot()
    with open(STATE + ".tmp", "wb") as f:
        _pkl.dump(snap, f)
    os.replace(STATE + ".tmp", STATE)
    print(f"SEGMENT DONE at iteration {snap['iteration']}", flush=True)
out_pkl = OUT_PKL
if out_pkl:
    import pickle
    import numpy as np
    with open(out_pkl, "wb") as f:
        pickle.dump({"actions_v": np.asarray(policy.actions_v),
                     "actions_p": np.asarray(policy.actions_p)}, f)
    print(f"policy -> {out_pkl}", flush=True)
print("CIRCULATION TPU SOLVE: DONE", flush=True)
