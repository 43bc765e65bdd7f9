"""Round-2 stage profile: time each pipeline stage of the Cornell step.

The whole-step profile (profile_r2.py) showed intersect x9 = 4.8ms and
sampler = 5.0ms out of 26.6ms; this breaks down the remaining ~17ms:
interaction decode, material params, bsdf eval/pdf/sample, light sampling,
emission + MIS pdf, shading frames.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu import float_t
from pbrt_tpu.testscenes import cornell_renderer
from pbrt_tpu.core.geometry import shading_frame
from pbrt_tpu.materials import eval_material_params
from pbrt_tpu.materials import bsdf as B
from pbrt_tpu.scene.builder import compute_interaction


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
    integ = r.integrator

    pixels = r.film.get_sample_bounds().offsets().astype(np.int32)
    lane_pixels = np.repeat(pixels, spp, axis=0)[:n]
    lane_sidx = np.tile(np.arange(spp, dtype=np.uint32), len(pixels))[:n]
    pxy = jnp.asarray(lane_pixels)
    sidx = jnp.asarray(lane_sidx)

    u = r.sampler.get2(pxy, sidx, 0)
    o, d, w = jax.jit(lambda p, u: r.camera.generate_rays(p, u))(
        pxy.astype(float_t) + u, u
    )
    tmax = jnp.full((n,), 1e8, float_t)
    hit = jax.jit(lambda o, d, t: c.intersector.intersect(o, d, t))(o, d, tmax)
    hit = jax.tree_util.tree_map(lambda x: jax.block_until_ready(x), hit)

    # interaction decode x5
    def inter5(hit, o, d):
        acc = jnp.zeros((n,), float_t)
        for i in range(5):
            si = compute_interaction(c.tables, hit, o, d)
            acc = acc + si["p"][:, 0] + si["ng"][:, i % 3] + si["uv"][:, 0]
            o = o + 1e-6
        return acc
    t_int = timeit(jax.jit(inter5), hit, o, d)
    print(f"interaction x5:            {t_int*1e3:8.2f} ms", flush=True)

    si = jax.jit(lambda h, o, d: compute_interaction(c.tables, h, o, d))(hit, o, d)
    si = jax.tree_util.tree_map(jax.block_until_ready, si)
    wo = si["wo"]

    # shading frame + to-local x4
    def frames4(si, wo):
        acc = jnp.zeros((n,), float_t)
        for i in range(4):
            ns, ss, ts = shading_frame(si, wo)
            acc = acc + ns[:, i % 3] + ss[:, 0] + ts[:, 1]
            wo = wo + 1e-6
        return acc
    t_fr = timeit(jax.jit(frames4), si, wo)
    print(f"shading frames x4:         {t_fr*1e3:8.2f} ms", flush=True)

    # material params x4
    def mat4(si):
        acc = jnp.zeros((n,), float_t)
        for i in range(4):
            p = eval_material_params(c.materials, si["mat"], si, None)
            acc = acc + p["kd"][:, i % 3] + p["roughness"]
            si = dict(si, uv=si["uv"] + 1e-6)
        return acc
    t_mat = timeit(jax.jit(mat4), si)
    print(f"material params x4:        {t_mat*1e3:8.2f} ms", flush=True)

    ns, ss, ts = jax.jit(lambda si, wo: shading_frame(si, wo))(si, wo)
    wo_l = jnp.stack([
        jnp.sum(wo * ss, -1), jnp.sum(wo * ts, -1), jnp.sum(wo * ns, -1)
    ], -1)
    wi_l = jnp.roll(wo_l, 1, axis=-1)

    # bsdf eval + pdf x4  (the NEE pair)
    def evalpdf4(si, wo_l, wi_l):
        params = eval_material_params(c.materials, si["mat"], si, None)
        acc = jnp.zeros((n,), float_t)
        for i in range(4):
            f = B.bsdf_eval(params, wo_l, wi_l)
            pdf = B.bsdf_pdf(params, wo_l, wi_l)
            acc = acc + f[:, i % 3] + pdf
            wi_l = jnp.roll(wi_l, 1, axis=-1)
        return acc
    t_ev = timeit(jax.jit(evalpdf4), si, wo_l, wi_l) - t_mat / 4
    print(f"bsdf eval+pdf x4:          {t_ev*1e3:8.2f} ms", flush=True)

    # bsdf sample x4
    u1 = r.sampler.get(pxy, sidx, 8)
    u2 = r.sampler.get2(pxy, sidx, 9)

    def sample4(si, wo_l, u1, u2):
        params = eval_material_params(c.materials, si["mat"], si, None)
        acc = jnp.zeros((n,), float_t)
        for i in range(4):
            wi, f, pdf, spec = B.bsdf_sample(params, wo_l, u1, u2)
            acc = acc + wi[:, i % 3] + f[:, 0] + pdf
            u1 = u1 * 0.999
        return acc
    t_sm = timeit(jax.jit(sample4), si, wo_l, u1, u2) - t_mat / 4
    print(f"bsdf sample x4:            {t_sm*1e3:8.2f} ms", flush=True)

    # light sampling x4 (NEE): pick + sample + eval geometry
    def light4(p, u1, u2):
        acc = jnp.zeros((n,), float_t)
        for i in range(4):
            wi, li, pdf, dist, delta = integ._sample_one_light(p, u1, u2, None)
            acc = acc + wi[:, i % 3] + li[:, 0] + pdf + dist
            u1 = u1 * 0.999
        return acc
    t_li = timeit(jax.jit(light4), si["p"], u1, u2)
    print(f"light sample x4:           {t_li*1e3:8.2f} ms", flush=True)

    # emission + area pdf x5
    def emit5(si, wo, d):
        acc = jnp.zeros((n,), float_t)
        for i in range(5):
            le = integ._emitted(si, wo, None)
            ap = integ._area_light_pdf(o, si, d)
            acc = acc + le[:, i % 3] + ap
            wo = wo + 1e-6
        return acc
    t_em = timeit(jax.jit(emit5), si, wo, d)
    print(f"emitted+areapdf x5:        {t_em*1e3:8.2f} ms", flush=True)

    total = t_int + t_fr + t_mat + t_ev + t_sm + t_li + t_em
    print(f"stage sum:                 {total*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
