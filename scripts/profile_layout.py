"""[N,3] vs component-SoA layout cost for typical shading chains (v5e)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 18


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


rng = np.random.default_rng(0)
a3 = jnp.asarray(rng.normal(0, 1, (N, 3)).astype(np.float32))
b3 = jnp.asarray(rng.normal(0, 1, (N, 3)).astype(np.float32))
ax, ay, az = (jnp.asarray(np.asarray(a3)[:, i].copy()) for i in range(3))
bx, by, bz = (jnp.asarray(np.asarray(b3)[:, i].copy()) for i in range(3))


# chain: normalize(a), dot(a,b), cross, face-forward, frame, to_local
def chain_aos(a, b):
    n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    d = jnp.sum(n * b, axis=-1)
    n = jnp.where(d[..., None] < 0, -n, n)
    sign = jnp.where(n[..., 2] >= 0, 1.0, -1.0)
    c = -1.0 / (sign + n[..., 2])
    bb = n[..., 0] * n[..., 1] * c
    ss = jnp.stack([1 + sign * n[..., 0] ** 2 * c, sign * bb, -sign * n[..., 0]], -1)
    ts = jnp.stack([bb, sign + n[..., 1] ** 2 * c, -n[..., 1]], -1)
    wl = jnp.stack(
        [jnp.sum(b * ss, -1), jnp.sum(b * ts, -1), jnp.sum(b * n, -1)], -1
    )
    return wl.sum(-1) + d


def chain_soa(ax, ay, az, bx, by, bz):
    inv = 1.0 / jnp.sqrt(ax * ax + ay * ay + az * az)
    nx, ny, nz = ax * inv, ay * inv, az * inv
    d = nx * bx + ny * by + nz * bz
    fl = d < 0
    nx = jnp.where(fl, -nx, nx); ny = jnp.where(fl, -ny, ny); nz = jnp.where(fl, -nz, nz)
    sign = jnp.where(nz >= 0, 1.0, -1.0)
    c = -1.0 / (sign + nz)
    bb = nx * ny * c
    sx, sy, sz = 1 + sign * nx * nx * c, sign * bb, -sign * nx
    tx, ty, tz = bb, sign + ny * ny * c, -ny
    l0 = bx * sx + by * sy + bz * sz
    l1 = bx * tx + by * ty + bz * tz
    l2 = bx * nx + by * ny + bz * nz
    return l0 + l1 + l2 + d


t1 = timeit(jax.jit(chain_aos), a3, b3)
t2 = timeit(jax.jit(chain_soa), ax, ay, az, bx, by, bz)
print(f"shading chain [N,3]:    {t1*1e3:8.3f} ms")
print(f"shading chain SoA [N]:  {t2*1e3:8.3f} ms   ({t1/t2:.1f}x)")

# where-select on [N,3] vs [N] components
m = jnp.asarray(rng.random(N) < 0.5)
t3 = timeit(jax.jit(lambda m, a, b: jnp.where(m[:, None], a, b)), m, a3, b3)
t4 = timeit(jax.jit(lambda m, x, y: jnp.where(m, x, y)), m, ax, bx)
print(f"where [N,3]:            {t3*1e3:8.3f} ms")
print(f"where [N] x1:           {t4*1e3:8.3f} ms")
