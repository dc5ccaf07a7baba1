"""Headless SDF inspector (reference fluidlab/utils/visualize_sdf.py):
renders orthogonal slices of a mesh's SDF voxels to a PNG.

Usage: python tools/visualize_sdf.py cup.obj [--res 64] [--out /tmp/sdf.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mesh")
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--out", default="/tmp/sdf_slices.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from fluidlab_tpu.engine import meshio

    data = meshio.compute_sdf_data(args.mesh, args.res)
    v = data["voxels"]
    mid = args.res // 2
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, (sl, title) in zip(
        axes,
        [(v[mid], "x-slice"), (v[:, mid], "y-slice"), (v[:, :, mid], "z-slice")],
    ):
        im = ax.imshow(sl.T, origin="lower", cmap="RdBu", vmin=-0.1, vmax=0.1)
        ax.contour(sl.T, levels=[0.0], colors="k")
        ax.set_title(f"{args.mesh} {title}")
    fig.colorbar(im, ax=axes, shrink=0.8)
    fig.savefig(args.out, dpi=110)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
