"""Offline asset pipeline: precompute SDF voxels + occupancy for all
meshes (reference fluidlab/utils/process_obj.py CLI equivalent).

Usage: python tools/process_meshes.py [--res 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SDF_MESHES = [
    # meshes used with has_dynamics=True (need SDFs)
    "cup.obj", "tank.obj", "tank_O.obj", "cone.obj", "cone_tip.obj",
    "glass.obj", "stirrer.obj", "plate.obj", "room.obj", "bowl.obj",
]
VOX_MESHES = [
    # meshes used as particle-filled bodies (need occupancy voxels)
    "duck.obj", "cube.obj",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    args = ap.parse_args()

    from fluidlab_tpu.engine import meshio

    for name in SDF_MESHES:
        t = time.time()
        try:
            data = meshio.compute_sdf_data(name, args.res)
            print(f"sdf  {name:28s} res={args.res} "
                  f"range=[{data['voxels'].min():+.3f},"
                  f"{data['voxels'].max():+.3f}] {time.time()-t:.1f}s")
        except FileNotFoundError as e:
            print(f"sdf  {name:28s} SKIP ({e})")
    for name in VOX_MESHES:
        t = time.time()
        try:
            vox = meshio.compute_voxels(name, args.res)
            print(f"vox  {name:28s} filled={vox.inside.mean():.3f} "
                  f"{time.time()-t:.1f}s")
        except FileNotFoundError as e:
            print(f"vox  {name:28s} SKIP ({e})")


if __name__ == "__main__":
    main()
