"""Interactive policy semantics (reference policies.py:21-128) without
pynput (headless image): the listener-starting __init__ is bypassed and
the direction-map / mouse-delta math is exercised directly."""

import numpy as np

from fluidlab_tpu.optimizer import policies as P


def _kb(cls, keys, v_lin=0.003, v_ang=0.03):
    pol = cls.__new__(cls)
    pol.keys_activated = set(keys)
    pol.linear_v_mag = v_lin
    pol.angular_v_mag = v_ang
    return pol


def test_keyboard_vxy_wz_mapping():
    pol = _kb(P.KeyboardPolicy_vxy_wz, {"6", "8", "z"})
    a = pol.get_action_v(0)
    np.testing.assert_allclose(a, [0.003, 0.003, 0, 0, 0, 0.03])
    pol = _kb(P.KeyboardPolicy_vxy_wz, {"4", "2", "x"}, v_ang=0.003)
    np.testing.assert_allclose(
        pol.get_action_v(0), [-0.003, -0.003, 0, 0, 0, -0.003]
    )


def test_keyboard_wz_only_rotates():
    pol = _kb(P.KeyboardPolicy_wz, {"4", "6", "z"}, v_ang=0.015)
    np.testing.assert_allclose(pol.get_action_v(0), [0, 0, 0, 0, 0, 0.015])


def test_keyboard_vxy_dim3():
    pol = _kb(P.KeyboardPolicy_vxy, {"8"})
    a = pol.get_action_v(0)
    assert a.shape == (3,)
    np.testing.assert_allclose(a, [0, 0.003, 0])


def _mouse(cls):
    pol = cls.__new__(cls)
    pol.actions_p = np.zeros(3)
    pol.mouse_pos = np.zeros(2)
    pol.mouse_pos_last = None
    pol.mouse_pressed = False
    pol.started = False
    return pol


def test_mouse_vxz_delta():
    pol = _mouse(P.MousePolicy_vxz)
    # before any motion: zero action (reference policies.py:117-119)
    np.testing.assert_allclose(pol.get_action_v(0), np.zeros(3))
    pol._on_move(100.0, 200.0)
    # first sample after motion: last initialized to current -> zero
    np.testing.assert_allclose(pol.get_action_v(0), np.zeros(3))
    pol._on_move(110.0, 180.0)
    np.testing.assert_allclose(
        pol.get_action_v(1), [10 * 5e-4, 0.0, -20 * 5e-4]
    )
    # no further motion -> zero again
    np.testing.assert_allclose(pol.get_action_v(2), np.zeros(3))
