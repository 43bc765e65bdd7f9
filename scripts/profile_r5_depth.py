"""Config-3 maxdepth-marginal decomposition for the r5 (wide-walk) tree.

One process, three frame programs (md = 1, 2, 3); with the md=4 number
from profile_r5_bvh8.py this gives the per-depth marginal cost (shadow
co-sort + any-hit sweep + carry co-sort + closest sweep + shading) that
the RESULTS roofline update needs.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from pbrt_tpu.testscenes import mesh_scene_renderer

    out = {}
    for md in (1, 2, 3):
        r, _ = mesh_scene_renderer(
            xres=256, yres=256, spp=8, maxdepth=md, ray_batch=1 << 18
        )
        state = r.render(progress=False)
        jax.block_until_ready(state["weight"])
        dts = []
        for _ in range(3):
            t0 = time.time()
            state = r.render(state=r.film.initial_state(), progress=False)
            jax.block_until_ready(state["weight"])
            dts.append(time.time() - t0)
        out[f"md{md}_ms"] = round(sorted(dts)[1] * 1e3, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
