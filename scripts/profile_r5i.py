"""r5 session-2 definitive piece costs: in-graph chained reps.

The one-dispatch microbenches of profile_r5h carry a ~25 ms additive
per-dispatch overhead in renderer-loaded processes (the bare-process
sort bench measured the same 22-operand sort at 0.52 ms), so absolute
one-shot timings are useless.  Here every op is timed twice inside ONE
jit — chained x1 and x5 with value-preserving data dependencies — and
the marginal cost (t5 - t1) / 4 cancels the dispatch constant.

Pieces: carry co-sort (22 ops), closest sweep, any-hit sweep, packed row
gather, row scatter (the occluded/intersect unsort), boolean scatter,
compute_interaction, shading+NEE math, film scatter-add.

Run:  python scripts/profile_r5i.py   (one TPU job at a time)
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

    from pbrt_tpu.testscenes import mesh_scene_renderer

    out = {"device": str(jax.devices()[0])}
    n = 1 << 18
    rng = np.random.default_rng(7)

    r, n_tris = mesh_scene_renderer(
        xres=256, yres=256, spp=8, maxdepth=4, ray_batch=n
    )
    c = r.compiled
    itx = c.intersector

    def timed(fn, *args, reps=5):
        f = jax.jit(fn)
        rr = f(*args)
        jax.block_until_ready(rr)
        dts = []
        for _ in range(reps):
            t0 = time.time()
            rr = f(*args)
            jax.block_until_ready(rr)
            dts.append(time.time() - t0)
        return sorted(dts)[len(dts) // 2] * 1e3

    def marginal(make_chain, *args):
        t1 = timed(make_chain(1), *args)
        t5 = timed(make_chain(5), *args)
        return (t5 - t1) / 4.0, t1

    # rays: coherent sweep at the torus, pre-sorted
    o = np.tile(np.asarray([2.8, 2.2, 2.8], np.float32), (n, 1))
    tgt = rng.uniform(-1.1, 1.1, (n, 3)).astype(np.float32)
    tgt[:, 2] *= 0.4
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    key = np.asarray(itx.sort_keys(jnp.asarray(o), jnp.asarray(d)))
    order = np.argsort(key)
    o, d = jnp.asarray(o[order]), jnp.asarray(d[order])
    tm = jnp.full((n,), 1e8, jnp.float32)

    def dep(x, t):
        # value-preserving data dependency: t is a traversal t (finite,
        # < 1e30), so the predicate is always False and XLA cannot fold
        z = 0.0 * jnp.where(t > 1e30, 1.0, 0.0)
        return x + (z[..., None] if x.ndim > t.ndim else z)

    # R5I_SKIP_BASE=1 skips pieces 1-4 (already measured) and jumps to
    # the interaction/shading/film pieces
    skip_base = os.environ.get("R5I_SKIP_BASE", "0") not in ("", "0")

    # 1. carry co-sort (22 operands)
    from pbrt_tpu.ops.sortnet import co_sort

    if not skip_base:
        keys = jnp.asarray(
            rng.integers(0, 2**31, n, dtype=np.int64).astype(np.uint32)
        )
        cols = tuple(
            jnp.asarray(rng.standard_normal(n).astype(np.float32))
            for _ in range(21)
        )

        def mk_sort(k_):
            def f(kk, *cc):
                for i in range(k_):
                    srt = co_sort((kk,) + cc, num_keys=1)
                    kk = srt[0] ^ jnp.uint32(i + 1)  # dep + re-randomize a bit
                    cc = srt[1:]
                return srt
            return f

        m, t1 = marginal(mk_sort, keys, *cols)
        out["cosort22_marg_ms"] = round(m, 2)
        out["dispatch_floor_ms"] = round(t1 - m, 2)
        print(json.dumps(out), flush=True)

        # 2. closest sweep
        def mk_closest(k_):
            def f(oo, dd, t):
                h = None
                for _ in range(k_):
                    h = itx.intersect(oo, dd, t, sort=False)
                    t = jnp.full((n,), 1e8, jnp.float32) + 0.0 * jnp.where(
                        h["t"] > 1e30, 1.0, 0.0
                    )
                return h["t"]
            return f

        m, _ = marginal(mk_closest, o, d, tm)
        out["closest_marg_ms"] = round(m, 2)

        # 3. any-hit sweep
        def mk_anyhit(k_):
            def f(oo, dd, t):
                acc = jnp.zeros((n,), bool)
                for _ in range(k_):
                    occ = itx.occluded(oo, dd, t, sort=False)
                    acc = acc ^ occ
                    t = jnp.full((n,), 1e8, jnp.float32) + 0.0 * jnp.where(
                        occ, 0.0, 0.0
                    )
                return acc
            return f

        m, _ = marginal(mk_anyhit, o, d, tm)
        out["anyhit_marg_ms"] = round(m, 2)
        print(json.dumps(out), flush=True)

        # 4. packed row gather + row scatter + bool scatter
        tbl = jnp.asarray(rng.standard_normal((n_tris + 2, 24)).astype(np.float32))
        idx = jnp.asarray(np.sort(rng.integers(0, n_tris, n)).astype(np.int32))
        lane = jnp.asarray(rng.permutation(n).astype(np.int32))

        def mk_gather(k_):
            def f(tt, ii):
                rr = None
                for _ in range(k_):
                    rr = tt[ii]
                    ii = ii + jnp.where(rr[:, 0] > 1e30, 1, 0)
                return rr
            return f

        m, _ = marginal(mk_gather, tbl, idx)
        out["rowgather_marg_ms"] = round(m, 2)

        rows2 = jnp.asarray(rng.integers(0, 100, (n, 2)).astype(np.int32))

        def mk_scatter2(k_):
            def f(rr, ll):
                s = None
                for _ in range(k_):
                    s = jnp.zeros((n, 2), jnp.int32).at[ll].set(
                        rr, unique_indices=True
                    )
                    rr = rr + jnp.where(s[:, :1] > 2**30, 1, 0)
                return s
            return f

        m, _ = marginal(mk_scatter2, rows2, lane)
        out["rowscatter2_marg_ms"] = round(m, 2)

        bits = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))

        def mk_scatterb(k_):
            def f(bb, ll):
                s = None
                for _ in range(k_):
                    s = jnp.full((n,), -1, jnp.int32).at[ll].set(
                        bb, unique_indices=True
                    )
                    bb = bb + jnp.where(s > 2**30, 1, 0)
                return s
            return f

        m, _ = marginal(mk_scatterb, bits, lane)
        out["scatter1_marg_ms"] = round(m, 2)
        print(json.dumps(out), flush=True)

    # 5. interaction + shading math
    from pbrt_tpu.scene.builder import compute_interaction
    from pbrt_tpu.core.geometry import shading_frame
    from pbrt_tpu.core.sampling import power_heuristic
    from pbrt_tpu.materials import eval_material_params
    from pbrt_tpu.materials import bsdf as B
    from pbrt_tpu.integrators.path import _to_local, _to_world

    hit = jax.jit(lambda oo, dd, t: itx.intersect(oo, dd, t, sort=False))(
        o, d, tm
    )
    jax.block_until_ready(hit["t"])

    def mk_inter(k_):
        def f(h, oo, dd):
            si = None
            for _ in range(k_):
                si = compute_interaction(c.tables, h, oo, dd)
                oo = dep(oo, si["p"][:, 0])
            return si["p"]
        return f

    m, _ = marginal(mk_inter, hit, o, d)
    out["interaction_marg_ms"] = round(m, 2)

    integ = r.integrator
    u1 = jnp.asarray(rng.random(n).astype(np.float32))
    u2 = jnp.asarray(rng.random((n, 2)).astype(np.float32))
    si0 = jax.jit(
        lambda h, oo, dd: compute_interaction(c.tables, h, oo, dd)
    )(hit, o, d)
    jax.block_until_ready(si0["p"])

    def shade_once(si, uu1, uu2):
        wo = si["wo"]
        ns, ss, ts = shading_frame(si, wo)
        wo_l = _to_local(ns, ss, ts, wo)
        params = eval_material_params(c.materials, si["mat"], si, None)
        params["outside"] = jnp.sum(si["ns"] * wo, axis=-1) > 0.0
        wi_w, li, l_pdf, l_dist, l_delta = integ._sample_one_light(
            si["p"], uu1, uu2, None
        )
        wi_l = _to_local(ns, ss, ts, wi_w)
        f = B.bsdf_eval(params, wo_l, wi_l)
        b_pdf = B.bsdf_pdf(params, wo_l, wi_l)
        w_l = jnp.where(l_delta, 1.0, power_heuristic(1, l_pdf, 1, b_pdf))
        contrib = f * li * (jnp.abs(wi_l[..., 2]) * w_l
                            / jnp.maximum(l_pdf, 1e-12))[..., None]
        wi_l2, f2, pdf2, spec2 = B.bsdf_sample(params, wo_l, uu1, uu2)
        return contrib + _to_world(ns, ss, ts, wi_l2) * pdf2[..., None]

    def mk_shade(k_):
        def f(si, uu1, uu2):
            acc = None
            for _ in range(k_):
                acc = shade_once(si, uu1, uu2)
                uu1 = uu1 + 0.0 * jnp.where(acc[:, 0] > 1e30, 1.0, 0.0)
            return acc
        return f

    m, _ = marginal(mk_shade, si0, u1, u2)
    out["shading_marg_ms"] = round(m, 2)
    print(json.dumps(out), flush=True)

    # 6. film scatter-add
    samp = r.sampler
    pixel_xy = jnp.asarray(
        np.stack(np.meshgrid(np.arange(512), np.arange(512)), -1)
        .reshape(-1, 2)[:n].astype(np.int32)
    )
    sidx = jnp.zeros((n,), jnp.uint32)
    L = jnp.abs(jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)))
    state0 = r.film.initial_state()
    u_film = jax.jit(lambda px: samp.get2(px, sidx, 0))(pixel_xy)
    jax.block_until_ready(u_film)
    p_film = pixel_xy.astype(jnp.float32) + u_film

    def mk_film(k_):
        def f(st, pf, LL):
            for _ in range(k_):
                st = r.film.add_samples(st, pf, LL)
                pf = dep(pf, st["weight"][0, 0])
            return st["weight"]
        return f

    m, _ = marginal(mk_film, state0, p_film, L)
    out["film_marg_ms"] = round(m, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
