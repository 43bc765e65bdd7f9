"""Benchmark: rays/s/chip, sustained path trace (BASELINE.json metric).

Primary metric (the JSON line's "value"): the Cornell-box scene
(BASELINE config 2: diffuse quads + spheres, path integrator) at 256x256,
32 spp, maxdepth 5 — sustained intersection-query throughput over several
frames.

The same line also carries the HARD paths as extra keys (VERDICT r2: the
bench must track the BVH path, not just the easy scene):
  config3_mray_s — end-to-end render of the 50k-triangle displaced torus
      (textured matte, point + area lights, MIS) through the two-level
      streaming BVH kernel;
  config5_mray_s — raw closest-hit throughput on a 1,000,000-triangle
      torus (the >VMEM regime: clusters stream HBM->VMEM via the Pallas
      pipeline), coherent single-origin rays.

"Rays" counts every ray cast into the intersector (camera + bounce +
shadow): per pixel-sample the wavefront issues ``maxdepth`` closest-hit
queries and ``maxdepth-1`` any-hit shadow queries.

``vs_baseline``: the reference (wathiede/pbrt) publishes no performance
numbers and cannot render at all (BASELINE.md), so the ratio is reported
against a nominal 100 Mray/s/chip production path-tracing target.
"""

import json
import sys
import time

import numpy as np

TARGET_RAYS_PER_S = 1.0e8


def bench_cornell():
    import jax

    from pbrt_tpu.testscenes import cornell_renderer

    xres = yres = 256
    spp = 32
    maxdepth = 5
    reps = 3
    # one dispatch per 256k lanes: dispatch latency through the accelerator
    # tunnel dominates small launches, so measure sustained (production)
    # throughput: a real spp count and several frames per timing block
    r = cornell_renderer(
        xres=xres, yres=yres, spp=spp, maxdepth=maxdepth, ray_batch=1 << 18
    )
    state = r.render(spp=spp, progress=False)  # warmup/compile
    t0 = time.time()
    for _ in range(reps):
        state = r.render(spp=spp, state=r.film.initial_state(), progress=False)
    jax.block_until_ready(state["weight"])
    dt = (time.time() - t0) / reps
    n_pix = r.film.get_sample_bounds().area()
    rays = n_pix * spp * (2 * maxdepth - 1)
    img = np.asarray(r.film.to_rgb(state))
    ok = bool(np.isfinite(img).all() and img.max() > 0)
    return rays / dt, dt, ok


def bench_config3():
    import jax

    from pbrt_tpu.testscenes import mesh_scene_renderer

    spp, maxdepth, reps = 8, 4, 3
    r, n_tris = mesh_scene_renderer(
        xres=256, yres=256, spp=spp, maxdepth=maxdepth, ray_batch=1 << 18
    )
    state = r.render(progress=False)
    t0 = time.time()
    for _ in range(reps):
        state = r.render(state=r.film.initial_state(), progress=False)
    jax.block_until_ready(state["weight"])
    dt = (time.time() - t0) / reps
    n_pix = r.film.get_sample_bounds().area()
    rays = n_pix * spp * (2 * maxdepth - 1)
    img = np.asarray(r.film.to_rgb(state))
    ok = bool(np.isfinite(img).all() and img.max() > 0)
    return rays / dt, n_tris, ok


def bench_config5():
    import jax
    import jax.numpy as jnp

    from pbrt_tpu.accel.bvh import BVHIntersector
    from pbrt_tpu.testscenes import torus_triangle_data

    td = torus_triangle_data(1000, 500)
    bvh = BVHIntersector(td, None, use_pallas=None)
    n = 1 << 18
    rng = np.random.default_rng(0)
    o = np.tile(np.asarray([3.0, 2.4, 2.2], np.float32), (n, 1))
    tgt = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tm = jnp.full((n,), 1e8, jnp.float32)
    fn = jax.jit(lambda o, d, tm: bvh.intersect(o, d, tm))
    out = fn(o, d, tm)
    jax.block_until_ready(out["t"])
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = fn(o, d, tm)
    jax.block_until_ready(out["t"])
    dt = (time.time() - t0) / reps
    return n / dt, td.count


def main():
    import jax

    value, dt, ok = bench_cornell()
    result = {
        "metric": "rays/s/chip (cornell 256x256, 32spp, path maxdepth=5)",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / TARGET_RAYS_PER_S, 4),
        "seconds": round(dt, 3),
        "image_ok": ok,
        "device": str(jax.devices()[0]),
    }
    # failsafe: emit the primary metric NOW so a driver timeout during the
    # (compile-heavy) hard-path configs still leaves a parseable tail line;
    # the enriched line printed at the end supersedes it when we get there
    print(json.dumps(result), flush=True)
    try:
        c3, n_tris3, ok3 = bench_config3()
        result["config3_mray_s"] = round(c3 / 1e6, 2)
        result["config3_tris"] = int(n_tris3)
        result["image_ok"] = bool(result["image_ok"] and ok3)
    except Exception as e:  # noqa: BLE001 - report, keep primary metric
        result["config3_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        c5, n_tris5 = bench_config5()
        result["config5_mray_s"] = round(c5 / 1e6, 2)
        result["config5_tris"] = int(n_tris5)
    except Exception as e:  # noqa: BLE001
        result["config5_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(result))
    return 0 if result["image_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
