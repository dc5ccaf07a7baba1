"""Numeric parity of the functional Adam + TrainablePolicy masking.

The update rule must match textbook bias-corrected Adam (the rule the
reference uses, reference fluidlab/optimizer/optim.py:28-41) so loss
courses stay comparable.  The textbook form below is written
independently of fluidlab_tpu.optimizer.optim's incremental-EMA form.
"""

import numpy as np

from fluidlab_tpu.optimizer.optim import Adam, adam_direction, adam_init
from fluidlab_tpu.optimizer.policies import TrainablePolicy


def textbook_adam_course(params, grads_seq, lr, b1, b2, eps):
    """Independent reference implementation (convex-combination EMAs)."""
    m = np.zeros_like(params)
    v = np.zeros_like(params)
    out = []
    for t, g in enumerate(grads_seq, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g**2
        mh = m / (1 - b1**t)
        vh = v / (1 - b2**t)
        params = params - lr * mh / (np.sqrt(vh) + eps)
        out.append(params.copy())
    return out


class TestAdamParity:
    def test_matches_textbook_course(self):
        rng = np.random.default_rng(3)
        shape = (7, 4)
        p0 = rng.normal(size=shape)
        grads = [rng.normal(size=shape) for _ in range(12)]
        lr, b1, b2, eps = 3e-3, 0.9, 0.99, 1e-8

        opt = Adam(shape, dict(lr=lr, beta_1=b1, beta_2=b2, epsilon=eps))
        p = p0.copy()
        mine = []
        for g in grads:
            p = opt.step(p, g)
            mine.append(p.copy())

        ref = textbook_adam_course(p0.copy(), grads, lr, b1, b2, eps)
        for a, b in zip(mine, ref):
            np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-14)

    def test_functional_core_stateless(self):
        s0 = adam_init((3,))
        g = np.ones(3)
        d1, s1 = adam_direction(s0, g)
        d1b, _ = adam_direction(s0, g)
        np.testing.assert_array_equal(d1, d1b)  # s0 untouched
        assert s1.count == 1 and s0.count == 0

    def test_lr_mutation_respected(self):
        opt = Adam((2,), dict(lr=1.0))
        p = np.zeros(2)
        p1 = opt.step(p, np.ones(2))
        opt.lr = 0.0
        p2 = opt.step(p1, np.ones(2))
        np.testing.assert_array_equal(p1, p2)
        assert opt.init_lr == 1.0


class TestTrainablePolicy:
    def _mk(self, horizon=5, dim=3, fix_dim=None):
        cfg = dict(type="Adam", lr=1e-2)
        init_range = dict(v=(0.0, 0.0), p=((0.4, 0.4, 0.4), (0.4, 0.4, 0.4)))
        return TrainablePolicy(
            cfg, init_range, dim, horizon, action_range=(-0.01, 0.01),
            fix_dim=fix_dim,
        )

    def test_layout_views(self):
        pol = self._mk()
        assert pol.comp_actions_shape == (6, 3)
        np.testing.assert_array_equal(pol.actions_v, pol.params[:-1])
        np.testing.assert_array_equal(pol.actions_p, pol.params[-1])
        np.testing.assert_array_equal(pol.get_action_v(2), pol.params[2])

    def test_trainable_mask_freezes_rows(self):
        pol = self._mk()
        pol.trainable[:2] = False
        before = pol.params.copy()
        g = np.ones(pol.comp_actions_shape)
        pol.optimize(g, {})
        np.testing.assert_array_equal(pol.params[:2], before[:2])
        assert np.all(pol.params[2:-1] != before[2:-1])

    def test_fix_dim_freezes_columns(self):
        pol = self._mk(fix_dim=[1])
        before = pol.params.copy()
        pol.optimize(np.ones(pol.comp_actions_shape), {})
        np.testing.assert_array_equal(pol.params[:, 1], before[:, 1])
        assert np.all(pol.params[:, 0] != before[:, 0])

    def test_velocity_rows_clipped_pose_row_not(self):
        pol = self._mk()
        pol.optim.lr = 10.0  # force a huge step
        pol.optimize(np.ones(pol.comp_actions_shape), {})
        assert np.all(pol.actions_v >= -0.01 - 1e-12)
        assert np.all(pol.actions_v <= 0.01 + 1e-12)
        assert np.all(np.abs(pol.actions_p - 0.4) > 0.01)  # unclipped

    def test_gradient_shape_checked(self):
        pol = self._mk()
        try:
            pol.optimize(np.ones((2, 3)), {})
        except ValueError:
            return
        raise AssertionError("shape mismatch not rejected")


class TestCirculationSchedule:
    """Plateau-halving lr schedule on CirculationPolicy (r4: the r3
    H=500 hardware course diverged after iter 41 at constant lr —
    artifacts/circulation_r3_course.log)."""

    def _mk(self):
        from fluidlab_tpu.optimizer.policies import CirculationPolicy

        cfg = dict(type="Adam", lr=1e-2)
        init_range = dict(v=(0.0, 0.0), p=((0.4,) * 8, (0.4,) * 8))
        pol = CirculationPolicy(
            cfg, init_range, 8, 5, action_range=(-1.0, 1.0)
        )
        pol.patience = 3
        return pol

    def test_lr_halves_on_plateau_and_floors(self):
        pol = self._mk()
        g = np.zeros(pol.comp_actions_shape)
        pol.optimize(g, {"loss": 100.0})  # improvement (inf -> 100)
        assert pol.optim.lr == pol.optim.init_lr
        for _ in range(3):  # 3 non-improving iters = patience
            pol.optimize(g, {"loss": 100.0})
        assert pol.optim.lr == pol.optim.init_lr * 0.5
        for _ in range(30):
            pol.optimize(g, {"loss": 100.0})
        assert pol.optim.lr >= pol.optim.init_lr / 32.0 - 1e-15

    def test_improvement_resets_stall(self):
        pol = self._mk()
        g = np.zeros(pol.comp_actions_shape)
        losses = [100.0, 99.0, 98.0, 97.0, 96.0, 95.0]
        for lo in losses:  # always improving: no decay
            pol.optimize(g, {"loss": lo})
        assert pol.optim.lr == pol.optim.init_lr

    def test_schedule_state_survives_resume(self):
        pol = self._mk()
        g = np.zeros(pol.comp_actions_shape)
        pol.optimize(g, {"loss": 100.0})
        pol.optimize(g, {"loss": 100.0})  # stall = 1
        d = pol.state_dict()
        pol2 = self._mk()
        pol2.load_state_dict(d)
        assert pol2._best_loss == 100.0 and pol2._stall == 1
        pol2.optimize(g, {"loss": 100.0})
        pol2.optimize(g, {"loss": 100.0})  # stall reaches patience=3
        assert pol2.optim.lr == pol2.optim.init_lr * 0.5
