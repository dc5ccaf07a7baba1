"""auto_seg_len policy: the host-segmented-backward threshold.

Pins the budget anchoring documented in engine/sim.py auto_seg_len
(ADVICE r3: the monolithic bound must stay within ~2x of the largest
configuration measured safe on hardware, 46k x 10 x 100 ~ 4.6e7).
"""
import numpy as np
import pytest

from fluidlab_tpu.config import materials as M
from fluidlab_tpu.engine.sim import FluidSim


def _sim(n_target, horizon, monkeypatch, on_tpu):
    sim = FluidSim(particle_density=3e4, horizon=horizon)
    sim.add_body(
        type="cube", lower=(0.2, 0.2, 0.2), upper=(0.8, 0.8, 0.8),
        material=M.WATER,
    )
    sim.build()
    # pin the particle count / TPU detection without needing hardware
    import dataclasses

    sim.cfg = dataclasses.replace(sim.cfg, n_particles=n_target)
    if on_tpu:
        import fluidlab_tpu.engine.sim as sim_mod

        class _FakeTPU:
            def __str__(self):
                return "TPU_0"

        monkeypatch.setattr(
            sim_mod.jax, "devices", lambda *a, **k: [_FakeTPU()]
        )
    return sim


def test_cpu_always_monolithic(monkeypatch):
    sim = _sim(65536, 1000, monkeypatch, on_tpu=False)
    assert sim.auto_seg_len() is None


def test_tpu_measured_working_point_stays_monolithic(monkeypatch):
    # 46k x 10 substeps x H=100 ~ 4.6e7 ran monolithic on hardware
    # (RESULTS.md r3); the budget must keep it monolithic
    sim = _sim(46080, 100, monkeypatch, on_tpu=True)
    assert sim.auto_seg_len() is None


def test_tpu_far_beyond_bound_segments(monkeypatch):
    # full LatteArt spec (115k x 20 x 330 ~ 7.6e8) must segment: the
    # monolithic program also exceeds the remote-compile upload cap
    sim = _sim(115480, 330, monkeypatch, on_tpu=True)
    sim.cfg = __import__("dataclasses").replace(sim.cfg, n_substeps=20)
    L = sim.auto_seg_len(horizon=330)
    assert L is not None and 1 <= L <= 330 and 330 % L == 0


def test_forced_override(monkeypatch):
    sim = _sim(115480, 330, monkeypatch, on_tpu=True)
    monkeypatch.setenv("FL_SEGLEN", "0")
    assert sim.auto_seg_len() is None
    monkeypatch.setenv("FL_SEGLEN", "25")
    assert sim.auto_seg_len() == 25
