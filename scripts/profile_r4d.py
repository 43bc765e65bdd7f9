"""Depth-marginal decomposition of the config-3 frame: md=1..4 frames.

md=1: 1 unsorted closest sweep + shading (no NEE at last bounce).
md=k adds per extra depth: 1 sorted-shadow sweep + 1 carry co-sort +
1 closest sweep (carry-sorted) + NEE/BSDF math -> the deltas give the
real in-frame cost of each stage combination at true shapes/liveness.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def frame(md):
    from pbrt_tpu.testscenes import mesh_scene_renderer

    r, n_tris = mesh_scene_renderer(
        xres=256, yres=256, spp=8, maxdepth=md, ray_batch=1 << 18
    )
    state = r.render(progress=False)
    dts = []
    for _ in range(3):
        t0 = time.time()
        state = r.render(state=r.film.initial_state(), progress=False)
        jax.block_until_ready(state["weight"])
        dts.append(time.time() - t0)
    dt = sorted(dts)[1]
    print(f"md={md}: {dt*1000:.1f} ms/frame (spread "
          f"{min(dts)*1000:.0f}-{max(dts)*1000:.0f})", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    for md in (1, 2, 3, 4):
        frame(md)


if __name__ == "__main__":
    main()
