"""Worker process for the 2-process jax.distributed CPU test.

Launched by test_distributed.py with DIST_COORD / DIST_NPROC / DIST_PID
env vars.  Each process exposes 2 virtual CPU devices, joins the
localhost coordinator, builds the (host, rollout) mesh from
parallel/distributed.py, and runs one MultiStartPlanner step with the
rollout axis sharded across processes.  Prints machine-checkable lines
the parent asserts on.

Exercises SURVEY.md §2.13.5 (multi-host orchestration) — the reference
is single-process (reference fluidlab/fluidengine/taichi_env.py:12), so
this layer has no reference analogue; the contract is BASELINE.json's
host+rollout layout.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from fluidlab_tpu.parallel.distributed import (  # noqa: E402
    initialize_distributed,
    is_primary_host,
    make_host_rollout_mesh,
)


def main():
    coord = os.environ["DIST_COORD"]
    nproc = int(os.environ["DIST_NPROC"])
    pid = int(os.environ["DIST_PID"])

    initialize_distributed(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    assert (pid == 0) == is_primary_host()
    print(f"devices: global={jax.device_count()} "
          f"local={jax.local_device_count()}", flush=True)

    mesh = make_host_rollout_mesh()
    assert mesh.axis_names == ("host", "rollout")
    assert mesh.devices.shape == (nproc, jax.local_device_count())
    print(f"mesh: {mesh.devices.shape}", flush=True)

    from fluidlab_tpu.parallel.planner import MultiStartPlanner
    from fluidlab_tpu.utils.bench_scenes import liquid_agent_scene

    sim = liquid_agent_scene(n_particles=256, horizon=3)
    # K=4 rollouts sharded over the 2-device 'rollout' axis, replicated
    # over 'host': inside the hot scan there is zero cross-process
    # traffic; the argmin/winner-gather collective crosses hosts once
    # per MPC iteration (the BASELINE.json layout).
    planner = MultiStartPlanner(
        sim, horizon_action=3, action_range=(-0.05, 0.05), n_rollouts=4,
        mesh=mesh,
    )
    v = np.zeros((3, 3), np.float32)
    p = np.full((3,), 0.5, np.float32)
    opt = planner.init_opt_state()
    v, p, opt, best, losses = planner.step(v, p, opt)
    v, p, opt, best, losses = planner.step(v, p, opt)
    # both processes must agree bit-for-digit on the replicated outputs
    print(f"result: best={best:.9e} vsum={float(np.sum(np.asarray(v))):.9e} "
          f"t={int(opt[2])}", flush=True)
    print("DIST WORKER OK", flush=True)


if __name__ == "__main__":
    main()
