"""r5 session-2: piece-wise decomposition of the config-3 bounce at 262k.

The bare-sort discovery (lax.sort 22 operands = 0.5 ms on chip, NOT the
~11 ms the r4 depth-marginal attribution assumed — those microbenches
were tunnel-RTT-bound that day) invalidates the "sorts dominate" model.
This times every bounce ingredient in isolation, warm, median of 5:

  - co_sort of the 22-operand carry
  - triangle-table packed row gather ([49k, C] x 262k idx), coherent+random
  - BVH8 closest sweep / any-hit sweep on pre-sorted rays (config-3 torus)
  - compute_interaction on a real hit wavefront
  - shading+NEE math block (frame, material params, bsdf eval/pdf/sample,
    light sampling, MIS weights) with no sweeps inside

Run:  python scripts/profile_r5h.py   (one TPU job at a time)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=5):
    import jax

    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    dts = []
    for _ in range(reps):
        t0 = time.time()
        r = f(*args)
        jax.block_until_ready(r)
        dts.append(time.time() - t0)
    return sorted(dts)[len(dts) // 2] * 1e3, r


def main():
    import jax
    import jax.numpy as jnp

    from pbrt_tpu.testscenes import mesh_scene_renderer

    out = {"device": str(jax.devices()[0])}
    n = 1 << 18
    rng = np.random.default_rng(7)

    r, n_tris = mesh_scene_renderer(
        xres=256, yres=256, spp=8, maxdepth=4, ray_batch=n
    )
    c = r.compiled
    itx = c.intersector
    dt32 = jnp.float32

    # camera-like rays at the torus (coherent, pre-sorted by construction)
    o = np.tile(np.asarray([2.8, 2.2, 2.8], np.float32), (n, 1))
    tgt = rng.uniform(-1.1, 1.1, (n, 3)).astype(np.float32)
    tgt[:, 2] *= 0.4
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    key = np.asarray(itx.sort_keys(jnp.asarray(o), jnp.asarray(d)))
    order = np.argsort(key)
    o, d = jnp.asarray(o[order]), jnp.asarray(d[order])
    tm = jnp.full((n,), 1e8, jnp.float32)

    # 1. carry co-sort, 22 operands
    from pbrt_tpu.ops.sortnet import co_sort

    keys = jnp.asarray(
        rng.integers(0, 2**31, n, dtype=np.int64).astype(np.uint32)
    )
    cols = tuple(
        jnp.asarray(rng.standard_normal(n).astype(np.float32))
        for _ in range(21)
    )
    ms, _ = timed(lambda k, *cc: co_sort((k,) + cc, num_keys=1), keys, *cols)
    out["cosort22_ms"] = round(ms, 2)
    print(json.dumps(out), flush=True)

    # 2. closest + any-hit sweeps (the BVH8 walk, sort outside)
    ms, hit = timed(lambda oo, dd, t: itx.intersect(oo, dd, t, sort=False), o, d, tm)
    out["closest_ms"] = round(ms, 2)
    out["hit_frac"] = round(float(np.asarray(hit["hit"]).mean()), 3)
    ms, _ = timed(lambda oo, dd, t: itx.occluded(oo, dd, t, sort=False), o, d, tm)
    out["anyhit_ms"] = round(ms, 2)
    print(json.dumps(out), flush=True)

    # 3. triangle-table packed row gather at the config-3 scale
    cols_t = jnp.asarray(
        rng.standard_normal((n_tris + 2, 28)).astype(np.float32)
    )
    idx_rand = jnp.asarray(rng.integers(0, n_tris, n).astype(np.int32))
    idx_coh = jnp.sort(idx_rand)
    ms, _ = timed(lambda cc, ii: cc[ii], cols_t, idx_coh)
    out["rowgather_coherent_ms"] = round(ms, 2)
    ms, _ = timed(lambda cc, ii: cc[ii], cols_t, idx_rand)
    out["rowgather_random_ms"] = round(ms, 2)
    print(json.dumps(out), flush=True)

    # 4. compute_interaction on the real hit wavefront
    from pbrt_tpu.scene.builder import compute_interaction

    ms, si = timed(
        lambda oo, dd: compute_interaction(c.tables, hit, oo, dd), o, d
    )
    out["interaction_ms"] = round(ms, 2)
    print(json.dumps(out), flush=True)

    # 5. shading + NEE math block (no sweeps): mirrors the _bounce body
    from pbrt_tpu.core.geometry import shading_frame
    from pbrt_tpu.core.sampling import power_heuristic
    from pbrt_tpu.materials import eval_material_params
    from pbrt_tpu.materials import bsdf as B
    from pbrt_tpu.integrators.path import _to_local, _to_world

    integ = r.integrator
    u1 = jnp.asarray(rng.random(n).astype(np.float32))
    u2 = jnp.asarray(rng.random((n, 2)).astype(np.float32))

    def shade(si, u1, u2):
        wo = si["wo"]
        ns, ss, ts = shading_frame(si, wo)
        wo_l = _to_local(ns, ss, ts, wo)
        params = eval_material_params(c.materials, si["mat"], si, None)
        params["outside"] = jnp.sum(si["ns"] * wo, axis=-1) > 0.0
        wi_w, li, l_pdf, l_dist, l_delta = integ._sample_one_light(
            si["p"], u1, u2, None
        )
        wi_l = _to_local(ns, ss, ts, wi_w)
        f = B.bsdf_eval(params, wo_l, wi_l)
        b_pdf = B.bsdf_pdf(params, wo_l, wi_l)
        w_l = jnp.where(l_delta, 1.0, power_heuristic(1, l_pdf, 1, b_pdf))
        contrib = f * li * (jnp.abs(wi_l[..., 2]) * w_l
                            / jnp.maximum(l_pdf, 1e-12))[..., None]
        wi_l2, f2, pdf2, spec2 = B.bsdf_sample(params, wo_l, u1, u2)
        wi_w2 = _to_world(ns, ss, ts, wi_l2)
        return contrib, wi_w2, f2, pdf2, spec2

    ms, _ = timed(shade, si, u1, u2)
    out["shading_ms"] = round(ms, 2)
    print(json.dumps(out), flush=True)

    # 6. camera raygen + sampler + film add (the md=1 fixed parts)
    samp = r.sampler
    pixel_xy = jnp.asarray(
        np.stack(np.meshgrid(np.arange(512), np.arange(512)), -1)
        .reshape(-1, 2)[:n].astype(np.int32)
    )
    sidx = jnp.zeros((n,), jnp.uint32)

    def raygen(px, si_):
        u_film = samp.get2(px, si_, 0)
        p_film = px.astype(dt32) + u_film
        u_lens = samp.get2(px, si_, 2)
        return c.camera.generate_rays(p_film, u_lens)

    ms, _ = timed(raygen, pixel_xy, sidx)
    out["raygen_ms"] = round(ms, 2)
    L = jnp.abs(jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)))
    state0 = r.film.initial_state()

    def film_add(st, px, LL):
        u_film = samp.get2(px, sidx, 0)
        p_film = px.astype(dt32) + u_film
        return r.film.add_samples(st, p_film, LL)

    ms, _ = timed(film_add, state0, pixel_xy, L)
    out["film_ms"] = round(ms, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
