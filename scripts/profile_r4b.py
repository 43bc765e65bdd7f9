"""Round-4 on-chip A/B part 2: co-sort machinery + fused-leaf kernel.

D. new default: lax.sort co-sort carry permutes + co-sort/scatter shadow
   and closest machinery (replaces argsort+inverse+gathers+unsort)
E. D + fused-leaf walk (leaf children resolved at the parent)
F. E with unsorted shadows (recheck the shadow-sort tradeoff now that
   sorting is cheaper)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def frame(tag):
    from pbrt_tpu.testscenes import mesh_scene_renderer

    r, n_tris = mesh_scene_renderer(
        xres=256, yres=256, spp=8, maxdepth=4, ray_batch=1 << 18
    )
    state = r.render(progress=False)
    dts = []
    for _ in range(3):
        t0 = time.time()
        state = r.render(state=r.film.initial_state(), progress=False)
        jax.block_until_ready(state["weight"])
        dts.append(time.time() - t0)
    dt = sorted(dts)[1]
    rays = 256 * 256 * 8 * 7
    print(f"{tag}: {dt*1000:.1f} ms/frame = {rays/dt/1e6:.2f} Mray/s "
          f"(spread {min(dts)*1000:.0f}-{max(dts)*1000:.0f})", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    frame("D cosort-machinery")
    os.environ["PBRT_TPU_FUSED_LEAF"] = "1"
    frame("E cosort+fused-leaf")
    os.environ["PBRT_TPU_SC_NOSORT_SHADOW"] = "1"
    frame("F fused+unsorted-shadows")


if __name__ == "__main__":
    main()
