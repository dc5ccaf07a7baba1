"""The transfer-kernel perf knobs (FL_PACK, FL_CPAD, FL_BWD_IMPL,
FL_MASKS, FL_DOT_PREC) must all preserve numerics.  Each knob is read
at import time, so each combination runs in a subprocess computing a
fwd value + gradient through the pallas transfer path and comparing
against the in-process default-config result."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_SCRIPT = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
# persistent compile cache: each knob combo re-runs this script in a
# fresh subprocess — without the cache every combo recompiles the
# pallas transfer path (~6 min each on these 4 vCPUs)
import os as _os
_os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from fluidlab_tpu.core.bspline import base_and_fx_soa, quadratic_weights_soa
from fluidlab_tpu.ops.p2g_pallas import p2g_pallas
from fluidlab_tpu.ops.g2p_pallas import g2p_pallas

G, N = 32, 500
rng = np.random.RandomState(0)
x = jnp.asarray(rng.uniform(0.1, 0.9, (3, N)), jnp.float32)
v = jnp.asarray(rng.normal(size=(3, N)), jnp.float32)
aff = jnp.asarray(rng.normal(size=(9, N)), jnp.float32)
mass = jnp.ones((N,), jnp.float32)
usedf = jnp.ones((N,), jnp.float32)
vout = jnp.asarray(rng.normal(size=(3, G * G * G)), jnp.float32)
dx = 1.0 / G

def f(v_, aff_, vout_):
    base, fx = base_and_fx_soa(x, float(G))
    base = jnp.clip(base, 0, G - 3)
    w = quadratic_weights_soa(fx)
    grid = p2g_pallas(base, fx, w, usedf, mass, v_, aff_, G, dx,
                      interpret=True)
    nv, nC = g2p_pallas(base, fx, w, vout_, G, float(G), interpret=True)
    return jnp.sum(grid ** 2) * 1e-4 + jnp.sum(nv * v_) + jnp.sum(nC[:3] * aff_[:3])

val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(v, aff, vout)
out = [float(val)] + [float(jnp.sum(jnp.abs(g))) for g in grads]
print("RESULT " + json.dumps(out))
"""


def _run(env_extra):
    env = dict(os.environ)
    env.update(env_extra)
    env.pop("FL_ABLATE", None)
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
    return _run({})


@pytest.mark.parametrize(
    "env",
    [
        {"FL_PACK": "scatter"},
        {"FL_CPAD": "13"},
        {"FL_BWD_IMPL": "v1"},
        {"FL_MASKS": "vpu"},
        {"FL_DOT_PREC": "highest"},
        {"FL_PACK": "scatter", "FL_CPAD": "13"},
        {"FL_ACC_DOT": "3x", "FL_MASK_DOT_PREC": "3x"},
        {"FL_ACC_DOT": "1x"},
    ],
    ids=lambda e: ",".join(f"{k}={v}" for k, v in e.items()),
)
def test_knob_preserves_numerics(baseline, env):
    got = _run(env)
    np.testing.assert_allclose(got, baseline, rtol=2e-5, atol=1e-5)
