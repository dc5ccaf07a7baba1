"""Bisect the Pouring TPU worker fault (open item (d), RESULTS.md r4b).

Pouring (agent collide_type='both' + collector + live gradient) kernel-
faults the v5e worker even at FL_SEGLEN=50; LatteArt's injector+grad
chain is fine, so the trigger is one of the grid/particle agent-coupling
gates under grad.  This tool runs a short fwd+bwd Pouring solve
(FL_BISECT_ITERS, default 1) with a single gate configuration selected
by FL_BISECT_GATE:

  both       collide_type='both', collector on   (baseline: FAULTS)
  grid       collide_type='grid', collector on
  particle   collide_type='particle', collector on
  none       collide_type=None,  collector on
  nocollect  collide_type='both', collector OFF
  fwdonly    baseline gates, gradient OFF        (control: should pass)

Prints "GATE <name> SURVIVED" on success; a worker kernel fault kills
the process before that line.  Drive under tools/tpu_retry.sh with
120 s pauses between gates (a crashed worker poisons the next
process's first dispatch for ~1-2 min) — see tools/r5_pouring_bisect.sh.

Reference anchor: pouring_env.py:12-97, agent_pouring.py (collide
dispatch + collect), mpm_simulator.py:331-426 (grid/particle collide
call sites).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
# Short horizon: the r4b fault fired within the FIRST backward segment
# (2,000 substeps); H=150 x 20 substeps = 3,000 covers it at 1/4
# density while keeping each gate run to a couple of minutes.
# unconditional: a stray FL_TASK_H in the environment must not silently
# change the substep budget the fault-repro claim depends on (the 'env:'
# line below echoes the effective H as ground truth)
os.environ["FL_TASK_H"] = os.environ.get("FL_BISECT_H", "150")

# Gate selection BEFORE any engine import: level-2 gates set build-time
# env knobs (FL_GRIDPHASE is read when the grid phase is built).
GATE = os.environ.get("FL_BISECT_GATE", "both")
GATES = {
    "both": dict(collide_type="both", collector=True, grad=True),
    "grid": dict(collide_type="grid", collector=True, grad=True),
    "particle": dict(collide_type="particle", collector=True, grad=True),
    "none": dict(collide_type=None, collector=True, grad=True),
    "nocollect": dict(collide_type="both", collector=False, grad=True),
    "fwdonly": dict(collide_type="both", collector=True, grad=False),
    # level 2 (r5): same collide gates under the SPLIT grid phase —
    # identical math/kernels, separate custom VJPs per transfer, gridop
    # adjoint built by whole-graph XLA AD instead of the merged phase's
    # jax.vjp composition.  If these survive while merged faults, the
    # trigger is the merged-phase adjoint composition and split is a
    # semantically exact workaround.
    "grid_split": dict(collide_type="grid", collector=True, grad=True,
                       env={"FL_GRIDPHASE": "split"}),
    "both_split": dict(collide_type="both", collector=True, grad=True,
                       env={"FL_GRIDPHASE": "split"}),
    # level 3 (r5): both_split FAULTED -> the grid-site collide adjoint
    # faults under either phase schedule.  Sub-op isolation:
    #   both_hostinv  removes the on-device linalg.inv custom-call
    #                 (host-precomputed R_vox_to_mesh) — exact semantics;
    #                 SURVIVES => the custom-call was the faulter and
    #                 FL_COLLIDE_INV=host is the fix.
    #   both_sticky   forces the sticky branch (friction>10): no
    #                 trilerp-grad, no inv, no friction projection —
    #                 isolates the non-sticky collide tail (semantics
    #                 deviation, diagnosis only).
    "both_hostinv": dict(collide_type="both", collector=True, grad=True,
                         env={"FL_COLLIDE_INV": "host"}),
    "both_sticky": dict(collide_type="both", collector=True, grad=True,
                        friction_sticky=True),
    #   both_remat    jax.checkpoint around dynamic_collide — identical
    #                 math, different fusion/scheduling of the adjoint
    #                 (exact-semantics route-around candidate).
    "both_remat": dict(collide_type="both", collector=True, grad=True,
                       env={"FL_COLLIDE_REMAT": "1"}),
    #   grid_dummy    NO collide at all, but an epsilon-weighted
    #                 effector-pose-dependent term in the region gridop
    #                 (engine FL_COLLIDE_DUMMY) — discriminates "any
    #                 differentiable eff-dependence in the gridop
    #                 faults" from "collide-specific".
    "grid_dummy": dict(collide_type=None, collector=True, grad=True,
                       env={"FL_COLLIDE_DUMMY": "1"}),
    #   both_matrix   matrix-form collide (FL_COLLIDE_IMPL=matrix):
    #                 quats -> rotation matrices once, per-cell work is
    #                 3x3 algebra, pose cotangents reduce via matmuls —
    #                 the restructuring candidate FIX (exact semantics).
    "both_matrix": dict(collide_type="both", collector=True, grad=True,
                        env={"FL_COLLIDE_IMPL": "matrix"}),
    #   both_gridsg   formulation decomposition: grid-site collide with
    #                 stop_gradient on the POSE inputs only — forward
    #                 exact, velocity adjoint kept (static_collide-like,
    #                 known-good), pose grads flow via the particle
    #                 site.  The VERDICT-sanctioned "collide gate
    #                 decomposition" candidate.
    "both_gridsg": dict(collide_type="both", collector=True, grad=True,
                        env={"FL_COLLIDE_GRID_SG": "1"}),
    #   both_precomp  pose-dependent collide auxiliaries precomputed
    #                 OUTSIDE the grid phase (stop_gradient), gridop
    #                 keeps only the velocity blend — removes ALL
    #                 trilerp/where collide machinery from the backward
    #                 program.  Forward exact; grid-site pose grads
    #                 dropped (flow via particle site), mat_v grads
    #                 kept.
    "both_precomp": dict(collide_type="both", collector=True, grad=True,
                         env={"FL_COLLIDE_GRID_PRECOMP": "1"}),
}
spec = GATES[GATE]
for _k, _v in spec.get("env", {}).items():
    os.environ[_k] = _v

import jax

if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

from fluidlab_tpu.engine import sim as sim_mod
from fluidlab_tpu.optimizer.solver import Solver
from _task_spec import make_spec_cls, resolve_task

# Gate 1/2: the agent-coupling collide mode (sim.setup_agent reads
# _AGENT_TYPE_DEFAULTS at build time — patch before env construction).
sim_mod._AGENT_TYPE_DEFAULTS["AgentPouring"] = dict(
    collide_type=spec["collide_type"]
)

if spec.get("friction_sticky"):
    from fluidlab_tpu.config import materials as M2

    M2.FRICTION[M2.BOTTLE] = 20.0  # sticky-contact branch (diagnosis)

cfg, env_id, base_cls = resolve_task("pouring")
Base = make_spec_cls(base_cls, renderer=False)


class BisectPouring(Base):
    def setup_agent(self):
        if spec["collector"]:
            return super().setup_agent()
        # Gate 3: strip the collector (the same-substep out-of-boundary
        # particle collection path) before the sim builds AgentCfg
        orig = self.sim.setup_agent

        def patched(agent_cfg):
            agent_cfg.get("params", {}).pop("collector_boundary", None)
            return orig(agent_cfg)

        self.sim.setup_agent = patched
        try:
            super().setup_agent()
        finally:
            self.sim.setup_agent = orig


class _PrintLogger:
    def save_policy(self, policy, iteration):
        pass

    def log(self, iteration, info):
        print(f"iter {iteration} loss {info.get('loss')}", flush=True)


t0 = time.time()
env = BisectPouring(loss=True, seed=0)
print(f"env: {env_id} gate={GATE} N={env.sim.cfg.n_particles} "
      f"H={env.horizon} collide={spec['collide_type']} "
      f"collector={spec['collector']} grad={spec['grad']} "
      f"({time.time()-t0:.0f}s)", flush=True)

if spec["grad"]:
    solver = Solver(env, logger=_PrintLogger(), cfg=dict(
        n_iters=int(os.environ.get("FL_BISECT_ITERS", 1)),
        init_range=cfg["SOLVER"]["init_range"],
        optim=cfg["SOLVER"]["optim"],
    ))
    solver.solve()
else:
    env.reset()
    a = np.zeros(env.sim.action_dim, np.float32)
    for _ in range(env.horizon):
        _, reward, done, _ = env.step(a)
        if done:
            break
    print(f"fwd reward tail {reward}", flush=True)

print(f"GATE {GATE} SURVIVED", flush=True)
