"""r5 merged shadow+carry sort A/B on chip (config 3 frames).

Variant A: PBRT_TPU_SC_MERGED=1 (default) — shadow columns ride the carry
co-sort, occlusion sweep runs sort-free in next-bounce order.
Variant B: PBRT_TPU_SC_MERGED=0 — r4 per-call shadow key-sorts.

Run:  python scripts/profile_r5g.py   (one TPU job at a time)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _frame(r, reps=5):
    import jax

    state = r.render(progress=False)
    jax.block_until_ready(state["weight"])
    dts = []
    for _ in range(reps):
        t0 = time.time()
        state = r.render(state=r.film.initial_state(), progress=False)
        jax.block_until_ready(state["weight"])
        dts.append(time.time() - t0)
    img = np.asarray(r.film.to_rgb(state))
    return sorted(dts)[len(dts) // 2], float(img.sum()), [
        round(x * 1e3, 1) for x in sorted(dts)
    ]


def main():
    import jax

    from pbrt_tpu.testscenes import mesh_scene_renderer

    out = {"device": str(jax.devices()[0])}

    def c3():
        r, _ = mesh_scene_renderer(
            xres=256, yres=256, spp=8, maxdepth=4, ray_batch=1 << 18
        )
        return r

    for name, env in (("merged", "1"), ("percall", "0")):
        os.environ["PBRT_TPU_SC_MERGED"] = env
        dt, s, spread = _frame(c3())
        out[f"{name}_ms"] = round(dt * 1e3, 1)
        out[f"{name}_sum"] = s
        out[f"{name}_spread"] = spread
        print(json.dumps(out), flush=True)
    n_pix = 256 * 256
    rays = n_pix * 8 * (2 * 4 - 1)
    out["merged_mray_s"] = round(rays / (out["merged_ms"] / 1e3) / 1e6, 2)
    out["identical"] = out["merged_sum"] == out["percall_sum"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
