"""Benchmark: rays/s/chip, sustained path trace (BASELINE.json metric).

Renders the built-in Cornell-box scene (BASELINE config 2: diffuse quads +
spheres, path integrator) at 256x256, 32 spp, maxdepth 5 on the available
accelerator and reports sustained intersection-query throughput over
several frames.

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


def main():
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

    # warmup / compile (same lane-batch shape as the timed run)
    state = r.render(spp=spp, progress=False)

    t0 = time.time()
    for _ in range(reps):
        state = r.render(spp=spp, state=r.film.initial_state(), progress=False)
    jax.block_until_ready(state["weight"])
    dt = (time.time() - t0) / reps

    n_pix = r.film.get_sample_bounds().area()
    rays = n_pix * spp * (2 * maxdepth - 1)
    value = rays / dt

    img = np.asarray(r.film.to_rgb(state))
    ok = bool(np.isfinite(img).all() and img.max() > 0)

    print(
        json.dumps(
            {
                "metric": "rays/s/chip (cornell 256x256, 32spp, path maxdepth=5)",
                "value": round(value, 1),
                "unit": "rays/s",
                "vs_baseline": round(value / TARGET_RAYS_PER_S, 4),
                "seconds": round(dt, 3),
                "image_ok": ok,
                "device": str(jax.devices()[0]),
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
