"""Full-stack LatteArt trajectory-optimization iterations on real TPU.

Records a demo target, then runs 3 Adam iterations of the trajectory
optimizer (46k particles, H=100, agent + injection).  The round-1
worker crash at this scale was fixed by the host-segmented backward
(engine/rollout.py make_segmented_fwd_bwd, auto-selected on TPU);
measured 86.2 s/iter steady state with pallas transfers (RESULTS.md)."""
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
    horizon = int(os.environ.get("FL_LATTE_H", 100))
    horizon_action = int(os.environ.get("FL_LATTE_HA", 80))
    max_substeps_local = 20  # remat window 2 steps: bound bwd residency
    def __init__(self, **kw):
        kw.setdefault("particle_density",
                      float(os.environ.get("FL_LATTE_DENSITY", 4e5)))
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
if os.environ.get("FL_SKIP_RECORD") and os.path.exists("/tmp/latte_tpu_target.pkl"):
    print("target exists, skipping record", flush=True)
else:
    Recorder(env).record()
    print(f"target recorded ({time.time()-t0:.0f}s)", flush=True)

warmstart = None
ws_pkl = os.environ.get("FL_SOLVE_WARMSTART")
if ws_pkl:
    import pickle as _pkl
    with open(ws_pkl, "rb") as f:
        warmstart = _pkl.load(f)
    print(f"warm-starting from {ws_pkl}", flush=True)

env2 = SmallLatte(loss=True, seed=0)
solver = Solver(env2, cfg=dict(
    n_iters=int(os.environ.get("FL_SOLVE_ITERS", 3)),
    init_range=dict(v=((0.,0.,0.),(0.,0.,0.)), p=((0.15,0.65,0.5),(0.15,0.65,0.5))),
    optim=dict(type="Adam", lr=1e-3, beta_1=0.9, beta_2=0.99),
    warmstart=warmstart,
))
policy = solver.solve()
out_pkl = os.environ.get("FL_SOLVE_POLICY_OUT", "/tmp/latte_solved_policy.pkl")
import pickle
with open(out_pkl, "wb") as f:
    pickle.dump({"actions_v": np.asarray(policy.actions_v),
                 "actions_p": np.asarray(policy.actions_p)}, f)
print(f"policy -> {out_pkl}", flush=True)
print("LATTEART TPU SOLVE: DONE", flush=True)

# optional visual artifact: replay the optimized actions and write frames
art_dir = os.environ.get("FL_SOLVE_ARTIFACT")
if art_dir:
    os.makedirs(art_dir, exist_ok=True)
    sim = env2.sim
    env2.reset()
    ap = policy.get_actions_p()
    if ap is not None:
        sim.apply_agent_action_p(ap)
    sim.setup_renderer(
        kind="native", res=(640, 640), camera_pos=(0.5, 2.2, 0.7),
        camera_lookat=(0.5, 0.5, 0.5), fov=32,
    )
    sim.renderer.build(sim)
    every = max(1, env2.horizon // 10)
    for t in range(env2.horizon):
        a = policy.get_action_v(t) if t < env2.horizon_action else None
        sim.step(a)
        if t % every == 0 or t == env2.horizon - 1:
            frame = np.asarray(sim.render("rgb_array"))
            try:
                from PIL import Image

                Image.fromarray(frame[..., :3].astype(np.uint8)).save(
                    os.path.join(art_dir, f"{t:04d}.png")
                )
            except ImportError:
                np.save(os.path.join(art_dir, f"{t:04d}.npy"), frame)
    print(f"artifact frames -> {art_dir}", flush=True)
