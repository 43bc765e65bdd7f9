"""Finer decomposition: interaction vs material vs NEE vs bsdf sample."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu import float_t
from pbrt_tpu.testscenes import cornell_renderer
from pbrt_tpu.scene.builder import compute_interaction
from pbrt_tpu.materials import eval_material_params
from pbrt_tpu.materials import bsdf as B
from pbrt_tpu.core.geometry import shading_frame
from pbrt_tpu.integrators.path import _to_local, _to_world


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

    u_film = sampler.get2(pxy, sidx, 0)
    p_film = pxy.astype(float_t) + u_film
    o, d, w = jax.jit(lambda p, u: r.camera.generate_rays(p, u))(
        p_film, sampler.get2(pxy, sidx, 2)
    )
    tmax = jnp.full((n,), 1e8, float_t)

    hitj = jax.jit(lambda o, d, t: c.intersector.intersect(o, d, t))
    hit = hitj(o, d, tmax)
    jax.block_until_ready(hit["t"])

    sij = jax.jit(lambda h, o, d: compute_interaction(c.tables, h, o, d))
    si = sij(hit, o, d)
    jax.block_until_ready(si["p"])

    def mat_fn(si):
        p = eval_material_params(c.materials, si["mat"], si, None)
        return {k: v for k, v in p.items() if k != "_active"}

    matj = jax.jit(mat_fn)
    params = matj(si)
    jax.block_until_ready(params["kd"])
    params["_active"] = frozenset(e.type_id for e in c.materials)
    params["outside"] = jnp.sum(si["ns"] * si["wo"], axis=-1) > 0.0

    def nee(si):
        wo = si["wo"]
        ns, ss, ts = shading_frame(si, wo)
        wo_l = _to_local(ns, ss, ts, wo)
        u_sel = sampler.get(pxy, sidx, 12)
        u_l = sampler.get2(pxy, sidx, 13)
        wi_w, li, l_pdf, l_dist, l_delta = integ._sample_one_light(
            si["p"], u_sel, u_l, None
        )
        wi_l = _to_local(ns, ss, ts, wi_w)
        f = B.bsdf_eval(params, wo_l, wi_l)
        b_pdf = B.bsdf_pdf(params, wo_l, wi_l)
        return f, b_pdf, wi_w, l_dist

    neej = jax.jit(nee)

    def bs(si):
        wo = si["wo"]
        ns, ss, ts = shading_frame(si, wo)
        wo_l = _to_local(ns, ss, ts, wo)
        u_lobe = sampler.get(pxy, sidx, 15)
        u_b = sampler.get2(pxy, sidx, 16)
        wi_l, f, pdf, spec = B.bsdf_sample(params, wo_l, u_lobe, u_b)
        return _to_world(ns, ss, ts, wi_l), f, pdf

    bsj = jax.jit(bs)

    print(f"intersect:        {timeit(hitj, o, d, tmax)*1e3:8.2f} ms")
    print(f"interaction:      {timeit(sij, hit, o, d)*1e3:8.2f} ms")
    print(f"material eval:    {timeit(matj, si)*1e3:8.2f} ms")
    print(f"NEE (light+f+pdf):{timeit(neej, si)*1e3:8.2f} ms")
    print(f"bsdf_sample:      {timeit(bsj, si)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
