"""Stage-level timing of the Cornell bench chunk on TPU."""
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
    integ = r.integrator
    sampler = r.sampler

    pixels = r.film.get_sample_bounds().offsets().astype(np.int32)
    lane_pixels = np.repeat(pixels, 8, axis=0)[:n]
    lane_sidx = np.tile(np.arange(8, dtype=np.uint32), len(pixels))[:n]
    pxy = jnp.asarray(lane_pixels)
    sidx = jnp.asarray(lane_sidx)

    # camera rays
    def gen(pxy, sidx):
        u_film = sampler.get2(pxy, sidx, 0)
        p_film = pxy.astype(float_t) + u_film
        u_lens = sampler.get2(pxy, sidx, 2)
        return r.camera.generate_rays(p_film, u_lens)

    genj = jax.jit(gen)
    o, d, w = genj(pxy, sidx)
    dt_gen = timeit(genj, pxy, sidx)

    # full li
    lij = jax.jit(lambda pxy, sidx, o, d: integ.li(sampler, pxy, sidx, o, d))
    dt_li = timeit(lij, pxy, sidx, o, d)

    # sampler draws: 40 dims like the path loop uses
    def draws(pxy, sidx):
        acc = jnp.zeros((n,), float_t)
        for dim in range(40):
            acc = acc + sampler.get(pxy, sidx, dim)
        return acc

    dt_smp = timeit(jax.jit(draws), pxy, sidx)

    # one intersection + interaction + material eval
    from pbrt_tpu.scene.builder import compute_interaction
    from pbrt_tpu.materials import eval_material_params

    def shade_once(o, d):
        hit = c.intersector.intersect(o, d, jnp.full((n,), 1e8, float_t))
        si = compute_interaction(c.tables, hit, o, d)
        params = eval_material_params(c.materials, si["mat"], si, None)
        return params["type"], si["p"]

    dt_sh = timeit(jax.jit(shade_once), o, d)

    # full dense step
    flat = {"fx": jnp.zeros((n // 8, 3), float_t), "fw": jnp.zeros((n // 8,), float_t)}
    stepj = jax.jit(r._step_impl_dense, static_argnames=("spp",))
    mask = jnp.ones((n,), bool)
    dt_step = timeit(
        lambda f: stepj(f, pxy, sidx, mask, jnp.int32(0), 8), flat
    )

    print(f"camera raygen:            {dt_gen*1e3:8.2f} ms")
    print(f"40 sampler draws:         {dt_smp*1e3:8.2f} ms")
    print(f"isect+interaction+mat:    {dt_sh*1e3:8.2f} ms")
    print(f"integrator li (5 bounce): {dt_li*1e3:8.2f} ms")
    print(f"full dense step:          {dt_step*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
