"""Generic hardware task solve: any registered task env at
reduced-but-honest spec (fraction of reference particle density, FULL
reference horizon), with chained resume state.

Env knobs:
  FL_TASK          experiment short name (config/experiments.py), e.g.
                   pouring | gathering_easy | icecream_static
  FL_TASK_DENSITY  particle_density override (default: class default/4)
  FL_TASK_FRAC     density fraction of the class default (default 0.25;
                   ignored when FL_TASK_DENSITY set)
  FL_TASK_POOL     pool_scale override (injector tasks)
  FL_SOLVE_ITERS   iterations this process (default 20)
  FL_CHAIN_STATE / FL_CHAIN_COURSE   resume pkl / course log
  FL_SEGLEN        forces the host-segmented backward length

Records the demo target first when the task's loss needs one (same
density).  Reference anchor: exp.sh solve lines; optimizer/solver.py:17-71.
"""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
import jax

if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

from fluidlab_tpu.optimizer.recorder import Recorder
from fluidlab_tpu.optimizer.solver import Solver
from _task_spec import ChainCourseLogger, make_spec_cls, resolve_task

NAME = os.environ.get("FL_TASK", "pouring")

# FL_TASK_COLLIDE overrides the agent's collide_type before env build
# (r5: the grid-site collide adjoint kernel-faults the TPU worker —
# 13-gate dossier in RESULTS.md; 'particle' is the hardware-validated
# formulation: same collision constraint enforced at the particle site
# each substep, reference AgentRigid's standard mode).
if os.environ.get("FL_TASK_COLLIDE"):
    from fluidlab_tpu.engine import sim as _sim_mod

    for _at, _d in _sim_mod._AGENT_TYPE_DEFAULTS.items():
        if _d.get("collide_type") in ("grid", "both"):
            _d["collide_type"] = os.environ["FL_TASK_COLLIDE"]

cfg, env_id, base_cls = resolve_task(NAME)

STATE = os.environ.get("FL_CHAIN_STATE", f"/tmp/{NAME}_chain_state.pkl")
COURSE = os.environ.get("FL_CHAIN_COURSE", f"/tmp/{NAME}_chain_course.log")
TARGET = f"/tmp/{NAME}_tpu_target.pkl"


class HwTask(make_spec_cls(base_cls, renderer=False)):
    def build_env(self):
        # target_file is set by the task __init__ before build
        # (envs/tasks.py) — tasks without one never define it
        if getattr(self, "target_file", None) is not None:
            self.target_file = TARGET
        super().build_env()

t0 = time.time()
needs_target = False
probe = HwTask(loss=False, seed=0)
needs_target = getattr(probe, "target_file", None) is not None
print(f"env: {env_id} N={probe.sim.cfg.n_particles} H={probe.horizon} "
      f"target={needs_target} ({time.time()-t0:.0f}s)", flush=True)

if needs_target and not os.path.exists(TARGET):
    probe.target_file = TARGET
    Recorder(probe).record()
    print(f"target recorded ({time.time()-t0:.0f}s)", flush=True)
del probe

resume = None
if os.path.exists(STATE):
    with open(STATE, "rb") as f:
        resume = pickle.load(f)
    print(f"resuming at iteration {resume['iteration']}", flush=True)


OUT_PKL = os.environ.get("FL_SOLVE_POLICY_OUT")
BEST = os.environ.get("FL_SOLVE_BEST_OUT") or (
    OUT_PKL.replace(".pkl", "_best.pkl") if OUT_PKL else None
)


env = HwTask(loss=True, seed=0)
print(f"solve env built seg_len={env.sim.auto_seg_len()} "
      f"({time.time()-t0:.0f}s)", flush=True)
solver = Solver(env, logger=ChainCourseLogger(COURSE, BEST), cfg=dict(
    n_iters=int(os.environ.get("FL_SOLVE_ITERS", 20)),
    init_range=cfg["SOLVER"]["init_range"],
    optim=cfg["SOLVER"]["optim"],
    resume=resume,
))
policy = solver.solve()
snap = solver.snapshot()
with open(STATE + ".tmp", "wb") as f:
    pickle.dump(snap, f)
os.replace(STATE + ".tmp", STATE)
out_pkl = OUT_PKL
if out_pkl:
    with open(out_pkl, "wb") as f:
        pickle.dump({"actions_v": np.asarray(policy.actions_v),
                     "actions_p": np.asarray(policy.actions_p)}, f)
print(f"SEGMENT DONE at iteration {snap['iteration']}", flush=True)
