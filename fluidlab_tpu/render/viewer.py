"""Interactive viewer: orbit-camera window around any rgb_array renderer.

Fills the reference GGUIRenderer's interactive role (reference
fluidlab/fluidengine/renderers/ggui_renderer.py:83-129: WASD/QE camera
translation, mouse-drag look, per-frame redraw) for this framework's
headless-first renderers: the window shows ``renderer.render_frame``
output and the keys move the camera via ``renderer.set_camera``.

Keys (matplotlib key events — no extra deps):
    a / d     orbit azimuth around the lookat point
    w / s     orbit elevation
    q / e     dolly in / out
    i/j/k/l   pan the lookat point in the horizontal plane
    escape    close

Headless environments (no $DISPLAY / no GUI backend) raise a clear
error at construction; use mode='rgb_array' rendering there instead
(the default everywhere in this repo).
"""

from __future__ import annotations

import os

import numpy as np


def display_available() -> bool:
    """True when an interactive matplotlib backend can plausibly open a
    window (X11/Wayland present)."""
    return bool(os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY"))


def orbit_camera(pos, lookat, d_az=0.0, d_el=0.0, d_r=0.0, pan=(0.0, 0.0)):
    """Spherical-orbit camera update around ``lookat`` (pure math — the
    key handler applies it; unit-tested headless)."""
    rel = np.asarray(pos, np.float32) - np.asarray(lookat, np.float32)
    rad = float(np.linalg.norm(rel)) + 1e-9
    az = float(np.arctan2(rel[0], rel[2]))
    el = float(np.arcsin(np.clip(rel[1] / rad, -1.0, 1.0)))
    az += d_az
    el = float(np.clip(el + d_el, -1.45, 1.45))
    rad = max(0.05, rad + d_r)
    new_lookat = np.asarray(lookat, np.float32) + np.asarray(
        [pan[0], 0.0, pan[1]], np.float32
    )
    new_pos = new_lookat + rad * np.asarray(
        [np.cos(el) * np.sin(az), np.sin(el), np.cos(el) * np.cos(az)],
        np.float32,
    )
    return new_pos, new_lookat


class InteractiveViewer:
    """Orbit-camera window around a renderer with ``render_frame`` +
    ``set_camera`` (NativeRenderer, PointRenderer)."""

    def __init__(self, renderer, sim, title="fluidlab_tpu"):
        if not display_available():
            raise RuntimeError(
                "InteractiveViewer needs a display; this environment is "
                "headless — render with mode='rgb_array' instead (see "
                "render/native_renderer.py)."
            )
        import matplotlib

        try:
            matplotlib.use("TkAgg")
        except Exception:
            pass  # fall back to whatever interactive backend exists
        import matplotlib.pyplot as plt

        self.renderer = renderer
        self.sim = sim
        self._plt = plt
        self.fig, self.ax = plt.subplots(num=title)
        self.ax.axis("off")
        self._im = None
        self.fig.canvas.mpl_connect("key_press_event", self._on_key)
        self._closed = False
        self.fig.canvas.mpl_connect(
            "close_event", lambda e: setattr(self, "_closed", True)
        )

    # --- camera orbit state -------------------------------------------
    def _orbit(self, d_az=0.0, d_el=0.0, d_r=0.0, pan=(0.0, 0.0)):
        r = self.renderer
        pos, lookat = orbit_camera(
            r.camera_pos, r.camera_lookat, d_az, d_el, d_r, pan
        )
        r.set_camera(pos=pos, lookat=lookat)

    def _on_key(self, event):
        step, pan = 0.08, 0.03
        k = event.key
        if k == "a":
            self._orbit(d_az=+step)
        elif k == "d":
            self._orbit(d_az=-step)
        elif k == "w":
            self._orbit(d_el=+step)
        elif k == "s":
            self._orbit(d_el=-step)
        elif k == "q":
            self._orbit(d_r=-pan)
        elif k == "e":
            self._orbit(d_r=+pan)
        elif k == "i":
            self._orbit(pan=(0.0, -pan))
        elif k == "k":
            self._orbit(pan=(0.0, +pan))
        elif k == "j":
            self._orbit(pan=(-pan, 0.0))
        elif k == "l":
            self._orbit(pan=(+pan, 0.0))
        elif k == "escape":
            self._plt.close(self.fig)
        self.draw()

    # --- frame loop ----------------------------------------------------
    def draw(self, frame=None):
        """Show ``frame`` (or render one) — pass an already-rendered
        rgb_array to avoid rasterizing twice per frame."""
        if self._closed:
            return False
        if frame is None:
            frame = self.renderer.render_frame(self.sim)
        frame = np.asarray(frame)
        if self._im is None:
            self._im = self.ax.imshow(frame)
            self.fig.show()
        else:
            self._im.set_data(frame)
        self.fig.canvas.draw_idle()
        self.fig.canvas.flush_events()
        return True

    def run(self, step_fn=None, max_frames=None):
        """Show frames until the window closes; ``step_fn()`` (optional)
        advances the simulation between frames."""
        import itertools

        for _ in itertools.islice(
            itertools.count(), max_frames
        ) if max_frames else itertools.count():
            if step_fn is not None:
                step_fn()
            if not self.draw():
                break
            self._plt.pause(0.001)
