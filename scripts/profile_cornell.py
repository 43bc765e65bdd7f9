"""Microbenchmark: decompose Cornell bench frame time (TPU).

Times, per 262144-lane chunk: closest-hit sweep alone, any-hit sweep
alone, full path step; reports implied rays/s for each.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu import float_t
from pbrt_tpu.testscenes import cornell_renderer


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    n = 1 << 18
    r = cornell_renderer(xres=256, yres=256, spp=8, maxdepth=5, ray_batch=n)
    c = r.compiled
    key = jax.random.PRNGKey(0)
    o = jnp.zeros((n, 3), float_t) + jnp.asarray([0.5, 0.5, -1.0], float_t)
    d = jax.random.normal(key, (n, 3), float_t)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full((n,), 1e8, float_t)

    isect = jax.jit(lambda o, d, t: c.intersector.intersect(o, d, t))
    occl = jax.jit(lambda o, d, t: c.intersector.occluded(o, d, t))

    dt_i = timeit(isect, o, d, tmax)
    dt_o = timeit(occl, o, d, tmax)
    print(f"closest-hit sweep: {dt_i*1e3:.2f} ms/chunk -> {n/dt_i/1e6:.1f} Mray/s")
    print(f"any-hit sweep:     {dt_o*1e3:.2f} ms/chunk -> {n/dt_o/1e6:.1f} Mray/s")

    # full step (render path), 2 chunks/frame
    state = r.film.initial_state()
    t0 = time.time()
    state = r.render(spp=8, state=state, progress=False)
    dt_f = time.time() - t0
    rays = 65536 * 8 * 9
    print(f"full frame:        {dt_f*1e3:.1f} ms -> {rays/dt_f/1e6:.1f} Mray/s")
    # implied: 9 sweeps/lane-depth vs measured sweep cost
    sweeps = 2 * (5 * dt_i + 4 * dt_o)
    print(f"pure-sweep lower bound/frame: {sweeps*1e3:.1f} ms "
          f"({100*sweeps/dt_f:.0f}% of frame)")


if __name__ == "__main__":
    main()
