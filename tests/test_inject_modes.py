"""Injection formulations (FL_INJECT=cond | mask | dense) must agree on
forward values AND gradients.  The knob is read at import time, so each
mode runs in a subprocess that builds a tiny ball-injector env, rolls
out a differentiable horizon, and prints the loss + action gradient.

`dense` is the TPU-default candidate: the cond/mask scatter-set's
BACKWARD faults the TPU worker at large N x horizon (RESULTS.md
round-2 bisection), while dense is scatter-free in both directions.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_SCRIPT = r"""
import json
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from fluidlab_tpu.envs.tasks import IceCreamDynamicEnv

class TinyEnv(IceCreamDynamicEnv):
    horizon = 3
    horizon_action = 3
    pool_scale = 0.01

    def __init__(self, **kw):
        kw.setdefault("particle_density", 2e4)
        kw.setdefault("loss", False)
        super().__init__(**kw)

    def setup_statics(self):
        pass

    def setup_renderer(self):
        self.sim.renderer = None

env = TinyEnv(seed=0)
sim = env.sim
H, A = env.horizon, sim.action_dim

def loss_fn(state, params, aux_t):
    x = state.particles.x
    u = state.particles.used.astype(x.dtype)
    return {"step_loss": jnp.sum(x * x * u[None, :])}

from fluidlab_tpu.engine.rollout import make_rollout
rollout = make_rollout(sim.cfg, loss_fn=loss_fn,
                       smoke_step_fn=sim._smoke_step_fn, window=sim.window)
actions = jnp.asarray(
    np.random.default_rng(1).uniform(-0.01, 0.01, (H, A)).astype(np.float32))
mask = jnp.ones((H,), bool)
p0 = jnp.zeros((A,), jnp.float32)

def total(a):
    final, outs = rollout(sim.init_state, sim.params, a, mask, p0, None)
    return jnp.sum(outs["step_loss"])

val, g = jax.jit(jax.value_and_grad(total))(actions)
out = [float(val)] + [float(v) for v in np.asarray(g).ravel()]
print("RESULT " + json.dumps(out))
"""


def _run(mode):
    env = dict(os.environ)
    env["FL_INJECT"] = mode
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT], capture_output=True, text=True,
        env=env, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")][-1]
    return np.asarray(json.loads(line[len("RESULT "):]))


@pytest.fixture(scope="module")
def baseline():
    return _run("cond")


@pytest.mark.parametrize("mode", ["mask", "dense"])
def test_inject_mode_matches_cond(baseline, mode):
    got = _run(mode)
    np.testing.assert_allclose(got, baseline, rtol=2e-5, atol=1e-6)
