"""r5 session-2: closest/any-hit sweep cost vs wavefront coherence.

The 9.3 ms closest-sweep marginal (profile_r5i) was measured on
camera-like rays (shared origin, focused cone) — the best case.  Bounce
wavefronts are surface-origin + cosine-hemisphere directions; even
key-sorted they have less packet coherence.  This measures the walk on
exactly that regime (sorted and unsorted), because the frame model needs
the real per-bounce sweep cost, not the best case.

Also: dot-product layout A/B — the same 16-dot chain on [N,3] arrays vs
3x[N] component arrays (the CLAUDE.md SoA rule) at 262k lanes.

Run:  python scripts/profile_r5j.py
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
    rng = np.random.default_rng(11)

    r, n_tris = mesh_scene_renderer(
        xres=256, yres=256, spp=8, maxdepth=4, ray_batch=n
    )
    itx = r.compiled.intersector

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
        return (t5 - t1) / 4.0

    # bounce-like wavefront: origins on the torus surface (from a real
    # camera sweep's hit points), cosine-hemisphere directions
    o0 = np.tile(np.asarray([2.8, 2.2, 2.8], np.float32), (n, 1))
    tgt = rng.uniform(-1.1, 1.1, (n, 3)).astype(np.float32)
    tgt[:, 2] *= 0.4
    d0 = tgt - o0
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    tm = jnp.full((n,), 1e8, jnp.float32)
    hit = jax.jit(
        lambda oo, dd, t: itx.intersect(oo, dd, t, sort=False)
    )(jnp.asarray(o0), jnp.asarray(d0), tm)
    jax.block_until_ready(hit["t"])
    t_np = np.asarray(hit["t"])
    hit_np = np.asarray(hit["hit"])
    p = o0 + d0 * t_np[:, None]
    # cosine directions about +z then flipped to the upper side of d0
    u1, u2 = rng.random(n).astype(np.float32), rng.random(n).astype(np.float32)
    rr_ = np.sqrt(u1)
    phi = 2 * np.pi * u2
    dloc = np.stack(
        [rr_ * np.cos(phi), rr_ * np.sin(phi), np.sqrt(1 - u1)], -1
    ).astype(np.float32)
    db = np.where((dloc * -d0).sum(-1, keepdims=True) > 0, -dloc, dloc)
    ob = (p + 1e-3 * db).astype(np.float32)
    # dead-lane mix like a real bounce-2 wavefront (~40% dead)
    alive = hit_np & (rng.random(n) < 0.75)
    tmb = np.where(alive, 1e8, 0.0).astype(np.float32)

    key = np.asarray(
        itx.sort_keys(jnp.asarray(ob), jnp.asarray(db), jnp.asarray(tmb))
    )
    order = np.argsort(key)
    ob_s, db_s, tmb_s = (jnp.asarray(x[order]) for x in (ob, db, tmb))
    ob_u, db_u, tmb_u = (jnp.asarray(x) for x in (ob, db, tmb))

    def mk_closest(oo, dd):
        def make(k_):
            def f(t):
                h = None
                for _ in range(k_):
                    h = itx.intersect(oo, dd, t, sort=False)
                    t = t + 0.0 * jnp.where(h["t"] > 1e30, 1.0, 0.0)
                return h["t"]
            return f
        return make

    out["bounce_sorted_closest_ms"] = round(
        marginal(mk_closest(ob_s, db_s), tmb_s), 2
    )
    print(json.dumps(out), flush=True)
    out["bounce_unsorted_closest_ms"] = round(
        marginal(mk_closest(ob_u, db_u), tmb_u), 2
    )
    print(json.dumps(out), flush=True)

    def mk_anyhit(oo, dd):
        def make(k_):
            def f(t):
                acc = jnp.zeros((n,), bool)
                for _ in range(k_):
                    occ = itx.occluded(oo, dd, t, sort=False)
                    acc = acc ^ occ
                    t = t + 0.0 * jnp.where(occ, 0.0, 0.0)
                return acc
            return f
        return make

    out["bounce_sorted_anyhit_ms"] = round(
        marginal(mk_anyhit(ob_s, db_s), tmb_s), 2
    )
    print(json.dumps(out), flush=True)

    # --- dot-product layout A/B ------------------------------------------
    a3 = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    b3 = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    ax, ay, az = (jnp.asarray(np.asarray(a3)[:, i]) for i in range(3))
    bx, by, bz = (jnp.asarray(np.asarray(b3)[:, i]) for i in range(3))

    def mk_dots3(k_):
        def f(aa, bb):
            s = jnp.zeros((n,), jnp.float32)
            for _ in range(k_):
                for _ in range(16):
                    s = s + jnp.sum(aa * bb, axis=-1)
                    aa = aa + s[:, None] * 1e-30
            return s
        return f

    out["dots_n3_marg_ms"] = round(marginal(mk_dots3, a3, b3), 2)

    def mk_dotsf(k_):
        def f(x1, y1, z1, x2, y2, z2):
            s = jnp.zeros((n,), jnp.float32)
            for _ in range(k_):
                for _ in range(16):
                    s = s + (x1 * x2 + y1 * y2 + z1 * z2)
                    x1 = x1 + s * 1e-30
            return s
        return f

    out["dots_flat_marg_ms"] = round(
        marginal(mk_dotsf, ax, ay, az, bx, by, bz), 2
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
