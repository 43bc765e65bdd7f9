"""r5 session-2: sort-key bit-budget A/B on bounce-like wavefronts.

The 31-bit traversal key (origin Morton | octant | direction Morton)
defaults to 5 origin + 4 direction bits per axis — tuned for
shared-origin wavefronts (camera, point-light shadows).  Bounce
wavefronts are surface-origin + hemisphere directions, and their packet
union is ~80% of the config-3 frame (profile_r5j).  This A/Bs
PBRT_TPU_KEY_OBITS on the bounce harness (sorted closest-sweep marginal)
and on the camera-coherent case, same methodology as profile_r5i.

Run:  python scripts/profile_r5k.py
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

    # camera-like + bounce-like wavefronts (profile_r5j construction)
    o0 = np.tile(np.asarray([2.8, 2.2, 2.8], np.float32), (n, 1))
    tgt = rng.uniform(-1.1, 1.1, (n, 3)).astype(np.float32)
    tgt[:, 2] *= 0.4
    d0 = tgt - o0
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    tm_full = jnp.full((n,), 1e8, jnp.float32)
    hit = jax.jit(
        lambda oo, dd, t: itx.intersect(oo, dd, t, sort=False)
    )(jnp.asarray(o0), jnp.asarray(d0), tm_full)
    jax.block_until_ready(hit["t"])
    t_np = np.asarray(hit["t"])
    hit_np = np.asarray(hit["hit"])
    p = o0 + d0 * t_np[:, None]
    u1, u2 = rng.random(n).astype(np.float32), rng.random(n).astype(np.float32)
    rr_ = np.sqrt(u1)
    phi = 2 * np.pi * u2
    dloc = np.stack(
        [rr_ * np.cos(phi), rr_ * np.sin(phi), np.sqrt(1 - u1)], -1
    ).astype(np.float32)
    db = np.where((dloc * -d0).sum(-1, keepdims=True) > 0, -dloc, dloc)
    ob = (p + 1e-3 * db).astype(np.float32)
    alive = hit_np & (rng.random(n) < 0.75)
    tmb = np.where(alive, 1e8, 0.0).astype(np.float32)

    def mk_closest(oo, dd, nn):
        def make(k_):
            def f(t):
                h = None
                for _ in range(k_):
                    h = itx.intersect(oo, dd, t, sort=False)
                    t = t + 0.0 * jnp.where(h["t"] > 1e30, 1.0, 0.0)
                return h["t"]
            return f
        return make

    for obits in (0, 2, 4, 5):
        os.environ["PBRT_TPU_KEY_OBITS"] = str(obits)
        key_b = np.asarray(itx.sort_keys(
            jnp.asarray(ob), jnp.asarray(db), jnp.asarray(tmb)
        ))
        ordb = np.argsort(key_b)
        obs, dbs, tmbs = (jnp.asarray(x[ordb]) for x in (ob, db, tmb))
        out[f"bounce_obits{obits}_ms"] = round(
            marginal(mk_closest(obs, dbs, n), tmbs), 2
        )
        key_c = np.asarray(itx.sort_keys(jnp.asarray(o0), jnp.asarray(d0)))
        ordc = np.argsort(key_c)
        ocs, dcs = jnp.asarray(o0[ordc]), jnp.asarray(d0[ordc])
        out[f"camera_obits{obits}_ms"] = round(
            marginal(mk_closest(ocs, dcs, n), tm_full), 2
        )
        print(json.dumps(out), flush=True)
    del os.environ["PBRT_TPU_KEY_OBITS"]


if __name__ == "__main__":
    main()
