"""r5 A/B: BVH8 wide walk vs binary walk, end-to-end config 3 frames.

Run on the real chip (one TPU job at a time).  Each variant renders the
BASELINE config-3 scene (50k-tri displaced torus, 256x256 @ 8spp,
maxdepth 4) for `reps` timed frames.  The variant is selected by
PBRT_TPU_WIDE before import, so run this script once per variant:

    python scripts/profile_r5_bvh8.py            # wide (default)
    PBRT_TPU_WIDE=0 python scripts/profile_r5_bvh8.py   # binary

Also prints the raw 1M-tri intersector sweep (config-5 regime) for the
same variant, plus whole-image checksums so the two variants can be
diffed for equality at render level.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    wide = os.environ.get("PBRT_TPU_WIDE", "1") not in ("", "0")
    from pbrt_tpu.testscenes import mesh_scene_renderer, torus_triangle_data

    out = {"wide": wide, "device": str(jax.devices()[0])}

    # --- config 3 end-to-end ---------------------------------------------
    spp, maxdepth = 8, 4
    r, n_tris = mesh_scene_renderer(
        xres=256, yres=256, spp=spp, maxdepth=maxdepth, ray_batch=1 << 18
    )
    t0 = time.time()
    state = r.render(progress=False)
    jax.block_until_ready(state["weight"])
    out["config3_compile_s"] = round(time.time() - t0, 1)
    dts = []
    for _ in range(5):
        t0 = time.time()
        state = r.render(state=r.film.initial_state(), progress=False)
        jax.block_until_ready(state["weight"])
        dts.append(time.time() - t0)
    dt = sorted(dts)[len(dts) // 2]
    img = np.asarray(r.film.to_rgb(state))
    n_pix = r.film.get_sample_bounds().area()
    rays = n_pix * spp * (2 * maxdepth - 1)
    out["config3_ms_frame"] = round(dt * 1e3, 1)
    out["config3_mray_s"] = round(rays / dt / 1e6, 2)
    out["config3_spread_ms"] = [round(x * 1e3, 1) for x in sorted(dts)]
    out["config3_img_sum"] = float(img.sum())
    out["config3_img_ok"] = bool(np.isfinite(img).all() and img.max() > 0)
    print(json.dumps(out), flush=True)  # partial line: config5 may OOM in A/Bs

    # --- config 5 raw intersector ----------------------------------------
    from pbrt_tpu.accel.bvh import BVHIntersector

    td = torus_triangle_data(1000, 500)
    bvh = BVHIntersector(td, None, use_pallas=None)
    n = 1 << 18
    rng = np.random.default_rng(0)
    o = np.tile(np.asarray([3.0, 2.4, 2.2], np.float32), (n, 1))
    tgt = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    import bench

    o, d = bench._presort_coherent(o, d)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tm = jnp.full((n,), 1e8, jnp.float32)
    fn = jax.jit(lambda o, d, tm: bvh.intersect(o, d, tm, sort=False))
    res = fn(o, d, tm)
    jax.block_until_ready(res["t"])
    dts5 = []
    for _ in range(5):
        t0 = time.time()
        res = fn(o, d, tm)
        jax.block_until_ready(res["t"])
        dts5.append(time.time() - t0)
    dt5 = sorted(dts5)[len(dts5) // 2]
    out["config5_mray_s"] = round(n / dt5 / 1e6, 2)
    out["config5_ms"] = round(dt5 * 1e3, 2)
    out["config5_hits"] = int(np.asarray(res["hit"]).sum())
    out["config5_t_sum"] = float(np.asarray(res["t"])[np.asarray(res["hit"])].sum())

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
