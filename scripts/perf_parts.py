"""Time individual pipeline stages on the attached accelerator."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from pbrt_tpu.testscenes import cornell_renderer


def timeit(fn, *args, n=8):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / n


def main():
    n_lanes = 1 << 18
    r = cornell_renderer(xres=256, yres=256, spp=4, maxdepth=5, ray_batch=n_lanes)
    c = r.compiled

    x = jnp.ones((n_lanes, 3), jnp.float32)

    t_ew = timeit(jax.jit(lambda v: v * 2.0 + 1.0), x)
    print(f"elementwise [{n_lanes},3]: {t_ew*1e3:.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1, 1, (n_lanes, 3)).astype(np.float32) * 200 + 275)
    d = jnp.asarray(rng.normal(size=(n_lanes, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tm = jnp.full((n_lanes,), 1e8, jnp.float32)

    t_int = timeit(jax.jit(lambda o, d, tm: c.intersector.intersect(o, d, tm)["t"]), o, d, tm)
    print(f"intersect sweep: {t_int*1e3:.2f} ms -> {n_lanes/t_int/1e6:.1f} Mray/s", flush=True)

    pix = jnp.asarray(
        np.tile(r.film.get_sample_bounds().offsets()[: n_lanes // 4], (4, 1)).astype(np.int32)
    )
    sidx = jnp.zeros((n_lanes,), jnp.uint32)

    t_smp = timeit(jax.jit(lambda p, s: r.sampler.get2(p, s, 0)), pix, sidx)
    print(f"sampler get2: {t_smp*1e3:.2f} ms", flush=True)

    state = r.film.initial_state()
    pf = pix.astype(jnp.float32) + 0.5
    L = jnp.ones((n_lanes, 3), jnp.float32)
    t_film = timeit(jax.jit(lambda s, p, l: r.film.add_samples(s, p, l)["xyz"]), state, pf, L)
    print(f"film scatter-add: {t_film*1e3:.2f} ms", flush=True)

    mask = jnp.ones((n_lanes,), bool)
    t_full = timeit(lambda s, p, si, m: r._step(s, p, si, m), state, pix, sidx, mask, n=4)
    print(f"full step: {t_full*1e3:.2f} ms -> {n_lanes*9/t_full/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
