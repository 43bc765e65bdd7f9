"""Measure fixed dispatch cost + HBM/VPU throughput floors on the chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 18


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


x = jnp.arange(N, dtype=jnp.float32)

t_triv = timeit(jax.jit(lambda x: x + 1.0), x)
print(f"trivial [N] add:        {t_triv*1e3:8.3f} ms")


def chain30(x):
    for i in range(30):
        x = x * 1.000001 + 0.5
    return x


t_ch = timeit(jax.jit(chain30), x)
print(f"30-op fused chain:      {t_ch*1e3:8.3f} ms")


def chain300(x):
    for i in range(300):
        x = x * 1.000001 + 0.5
    return x


t_ch3 = timeit(jax.jit(chain300), x)
print(f"300-op fused chain:     {t_ch3*1e3:8.3f} ms")


def chain3000(x):
    for i in range(3000):
        x = x * 1.000001 + 0.5
    return x


t_ch30 = timeit(jax.jit(chain3000), x)
print(f"3000-op fused chain:    {t_ch30*1e3:8.3f} ms")

# one-hot matmul (the select_rows form) vs where-chain select
T, C = 14, 28
cols = jnp.asarray(np.random.rand(T, C).astype(np.float32))
idx = jnp.asarray(np.random.randint(0, T, N).astype(np.int32))


def onehot(idx):
    oh = (idx[:, None] == jnp.arange(T, dtype=idx.dtype)[None, :]).astype(jnp.float32)
    return jax.lax.dot(oh, cols, precision=jax.lax.Precision.HIGHEST)


def wherechain(idx):
    cols_h = np.asarray(cols)
    out = [jnp.zeros((N,), jnp.float32) for _ in range(C)]
    for k in range(T):
        m = idx == k
        for c in range(C):
            out[c] = jnp.where(m, cols_h[k, c], out[c])
    return jnp.stack(out, axis=-1)


t_oh = timeit(jax.jit(onehot), idx)
t_wc = timeit(jax.jit(wherechain), idx)
print(f"one-hot matmul select:  {t_oh*1e3:8.3f} ms")
print(f"where-chain select:     {t_wc*1e3:8.3f} ms")

# 9 transcendentals
t_tr = timeit(jax.jit(lambda x: jnp.arctan2(jnp.sin(x), jnp.cos(x))), x)
print(f"sin+cos+atan2:          {t_tr*1e3:8.3f} ms")
