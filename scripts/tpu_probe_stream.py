"""Real-TPU probe for the streaming BVH (round-3 perf work).

Measures, on the attached accelerator:
  1. raw StreamBVH traversal throughput on the 50k-tri torus (coherent
     camera-style rays and incoherent random rays), vs the old PallasBVH2
     whole-tree kernel where it still fits;
  2. end-to-end config-3 render rays/s;
  3. raw traversal throughput on the 1M-tri torus (the >VMEM regime).

Run: python scripts/tpu_probe_stream.py [--skip-1m]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def rays_camera_like(n, seed=0, origin=(2.8, 2.2, 2.8)):
    rng = np.random.default_rng(seed)
    o = np.tile(np.asarray(origin, np.float32), (n, 1))
    # look-at jitter toward the origin
    tgt = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def rays_random(n, seed=1, extent=2.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def bench_traverse(bvh_intersector, o, d, label, reps=5):
    n = o.shape[0]
    tm = jnp.full((n,), 1e8, jnp.float32)
    fn = jax.jit(lambda o, d, tm: bvh_intersector.intersect(o, d, tm))
    t0 = time.time()
    out = fn(o, d, tm)
    jax.block_until_ready(out["t"])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(o, d, tm)
    jax.block_until_ready(out["t"])
    dt = (time.time() - t0) / reps
    mray = n / dt / 1e6
    hits = float(jnp.mean(out["hit"]))
    print(f"{label}: {mray:.2f} Mray/s ({dt*1e3:.1f} ms, {n} rays, "
          f"hit rate {hits:.2f}, compile {compile_s:.0f}s)", flush=True)
    return mray


def main():
    print("device:", jax.devices()[0], flush=True)
    from pbrt_tpu.accel.bvh import BVHIntersector
    from pbrt_tpu.testscenes import torus_triangle_data

    # --- 50k torus, stream kernel ---------------------------------------
    td = torus_triangle_data(224, 112)
    print(f"50k mesh: {td.count} tris", flush=True)
    bvh = BVHIntersector(td, None, use_pallas=True)
    kind = type(bvh._pallas).__name__
    print("kernel:", kind,
          "clusters:", getattr(bvh._pallas, "n_clusters", 1),
          "vmem:", getattr(bvh._pallas, "vmem_bytes", 0) // 1024, "KiB",
          flush=True)
    n = 1 << 18
    oc, dc = rays_camera_like(n)
    orr, drr = rays_random(n)
    bench_traverse(bvh, oc, dc, "50k coherent")
    bench_traverse(bvh, orr, drr, "50k incoherent")

    # --- 1M torus --------------------------------------------------------
    if "--skip-1m" not in sys.argv:
        td1m = torus_triangle_data(1000, 500)
        print(f"1M mesh: {td1m.count} tris", flush=True)
        t0 = time.time()
        bvh1m = BVHIntersector(td1m, None, use_pallas=True)
        print(f"build+pack: {time.time()-t0:.1f}s, "
              f"clusters: {bvh1m._pallas.n_clusters}", flush=True)
        bench_traverse(bvh1m, *rays_camera_like(n, origin=(3.0, 2.4, 2.2)),
                       "1M coherent")
        bench_traverse(bvh1m, *rays_random(n), "1M incoherent")

    # --- config-3 end-to-end ---------------------------------------------
    from pbrt_tpu.testscenes import mesh_scene_renderer

    r, n_tris = mesh_scene_renderer(xres=256, yres=256, spp=8, maxdepth=4,
                                    ray_batch=1 << 18)
    t0 = time.time()
    state = r.render(progress=False)
    print(f"config3 compile+first: {time.time()-t0:.0f}s", flush=True)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        state = r.render(state=r.film.initial_state(), progress=False)
    jax.block_until_ready(state["weight"])
    dt = (time.time() - t0) / reps
    n_pix = r.film.get_sample_bounds().area()
    rays = n_pix * 8 * (2 * 4 - 1)
    img = np.asarray(r.film.to_rgb(state))
    print(f"config3 ({n_tris} tris): {rays/dt/1e6:.2f} Mray/s "
          f"({dt*1e3:.0f} ms/frame, image ok: "
          f"{bool(np.isfinite(img).all() and img.max() > 0)})", flush=True)


if __name__ == "__main__":
    main()
