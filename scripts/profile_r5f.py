"""r5 session-2 frame decomposition: where do the post-BVH8 315 ms go?

One chip process, several measurements:
  1. config3 frame, current default (sorted carry + per-call shadow sorts)
  2. config3 frame, PBRT_TPU_SC_NOSORT_SHADOW=1 (shadow sweeps ride carry
     order) -- re-evaluates the r4 "shadow sorts win" verdict now that the
     BVH8 walk halved the traversal penalty the sorts buy down
  3. config3 frame at md=1 (fixed camera+interaction+film cost)
  4. bare co_sort of the 22-operand carry at 262k lanes (the per-sort cost
     the frame pays ~6x per chunk)
  5. bare 1-key+lane sort (the key-sort floor inside 4)
  6. bare occluded() sorted vs unsorted on a captured bounce-1 shadow
     wavefront would need integrator surgery; the frame A/B (1 vs 2)
     carries that signal end-to-end instead.

Run:  python scripts/profile_r5f.py   (one TPU job at a time)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _frame(r, reps=3):
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
    return sorted(dts)[len(dts) // 2], float(img.sum())


def main():
    import jax
    import jax.numpy as jnp

    from pbrt_tpu.testscenes import mesh_scene_renderer

    out = {"device": str(jax.devices()[0])}

    def c3(md=4):
        r, _ = mesh_scene_renderer(
            xres=256, yres=256, spp=8, maxdepth=md, ray_batch=1 << 18
        )
        return r

    dt, s = _frame(c3())
    out["base_ms"] = round(dt * 1e3, 1)
    out["base_sum"] = s
    print(json.dumps(out), flush=True)

    os.environ["PBRT_TPU_SC_NOSORT_SHADOW"] = "1"
    dt, s = _frame(c3())
    out["nosort_shadow_ms"] = round(dt * 1e3, 1)
    out["nosort_shadow_sum"] = s
    del os.environ["PBRT_TPU_SC_NOSORT_SHADOW"]
    print(json.dumps(out), flush=True)

    dt, s = _frame(c3(md=1))
    out["md1_ms"] = round(dt * 1e3, 1)
    print(json.dumps(out), flush=True)

    # --- bare sorts at 262k lanes -----------------------------------------
    from pbrt_tpu.ops.sortnet import co_sort

    n = 1 << 18
    rng = np.random.default_rng(1)
    keys = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int64).astype(np.uint32))
    cols = [jnp.asarray(rng.standard_normal(n).astype(np.float32)) for _ in range(21)]

    def timed(fn, *args):
        f = jax.jit(fn)
        r = f(*args)
        jax.block_until_ready(r)
        dts = []
        for _ in range(5):
            t0 = time.time()
            r = f(*args)
            jax.block_until_ready(r)
            dts.append(time.time() - t0)
        return sorted(dts)[len(dts) // 2]

    out["cosort22_ms"] = round(
        timed(lambda k, *c: co_sort((k,) + c, num_keys=1), keys, *cols) * 1e3, 2
    )
    out["cosort9_ms"] = round(
        timed(lambda k, *c: co_sort((k,) + c, num_keys=1), keys, *cols[:8]) * 1e3, 2
    )
    lane = jnp.arange(n, dtype=jnp.int32)
    out["keysort_ms"] = round(
        timed(lambda k, l: co_sort((k, l), num_keys=1), keys, lane) * 1e3, 2
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
