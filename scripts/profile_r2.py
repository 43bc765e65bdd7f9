"""Round-2 profile: whole-step + ablations on the real TPU.

Times (a) the full dense step (what bench.py runs), (b) the same step with
the Halton sampler swapped for hash randoms, (c) intersection-only x9,
(d) sampler-only draws for all path dims, (e) everything-but-intersect.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu import float_t
from pbrt_tpu.testscenes import cornell_renderer
from pbrt_tpu.samplers import RandomSampler


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / reps


def main():
    n = 1 << 18
    spp = 8
    r = cornell_renderer(xres=256, yres=256, spp=spp, maxdepth=5, ray_batch=n)
    c = r.compiled

    pixels = r.film.get_sample_bounds().offsets().astype(np.int32)
    lane_pixels = np.repeat(pixels, spp, axis=0)[:n]
    lane_sidx = np.tile(np.arange(spp, dtype=np.uint32), len(pixels))[:n]
    pxy = jnp.asarray(lane_pixels)
    sidx = jnp.asarray(lane_sidx)
    mask = jnp.ones((n,), bool)

    flat = {
        "fx": jnp.zeros((n // spp, 3), float_t),
        "fw": jnp.zeros((n // spp,), float_t),
    }
    stepj = jax.jit(r._step_impl_dense, static_argnames=("spp",))
    t_full = timeit(stepj, flat, pxy, sidx, mask, jnp.int32(0), spp)
    print(f"full dense step (halton):   {t_full*1e3:8.2f} ms", flush=True)

    # ---- same with hash sampler ----
    halton = r.sampler
    rnd = RandomSampler(spp)
    r.sampler = rnd
    r.integrator.sampler = rnd
    stepj2 = jax.jit(r._step_impl_dense, static_argnames=("spp",))
    t_rand = timeit(stepj2, flat, pxy, sidx, mask, jnp.int32(0), spp)
    print(f"full dense step (random):   {t_rand*1e3:8.2f} ms", flush=True)
    r.sampler = halton

    # ---- sampler draws only (35 dims, like 5 bounces) ----
    def draws(sampler):
        def f(pxy, sidx):
            acc = jnp.zeros((n,), float_t)
            for dim in range(35):
                acc = acc + sampler.get(pxy, sidx, dim)
            return acc
        return f

    t_hal = timeit(jax.jit(draws(halton)), pxy, sidx)
    t_rnd = timeit(jax.jit(draws(rnd)), pxy, sidx)
    print(f"35 halton draws:            {t_hal*1e3:8.2f} ms", flush=True)
    print(f"35 random draws:            {t_rnd*1e3:8.2f} ms", flush=True)

    # ---- intersect x9 (5 closest + 4 shadow ~ per-path queries) ----
    u = halton.get2(pxy, sidx, 0)
    o, d, w = jax.jit(lambda p, u: r.camera.generate_rays(p, u))(
        pxy.astype(float_t) + u, u
    )
    tmax = jnp.full((n,), 1e8, float_t)

    def isect9(o, d, tmax):
        acc = jnp.zeros((n,), float_t)
        oo, dd = o, d
        for i in range(9):
            h = c.intersector.intersect(oo, dd, tmax)
            acc = acc + h["t"]
            # rotate dirs so XLA can't CSE the 9 queries
            dd = jnp.roll(dd, 1, axis=-1)
        return acc

    t_is = timeit(jax.jit(isect9), o, d, tmax)
    print(f"intersect x9:               {t_is*1e3:8.2f} ms", flush=True)

    rays = n * 9
    print(f"-> full-step rays/s:        {rays / t_full / 1e6:8.1f} M", flush=True)
    print(f"-> random-step rays/s:      {rays / t_rand / 1e6:8.1f} M", flush=True)


if __name__ == "__main__":
    main()
