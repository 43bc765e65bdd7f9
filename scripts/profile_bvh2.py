"""Production mesh-traversal throughput on the torus50k mesh (sorted packets)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.accel.bvh import BVHIntersector
from pbrt_tpu.shapes import TriangleData
from pbrt_tpu.testscenes import _torus_mesh_params


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out[0] if isinstance(out, tuple) else out["t"])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out[0] if isinstance(out, tuple) else out["t"])
    return (time.time() - t0) / reps


def main():
    ps, n_tris = _torus_mesh_params()
    pts = np.asarray(ps.find_point3f("P")).reshape(-1, 3)
    idx = np.asarray(ps.find_int("indices")).reshape(-1, 3)
    p0, p1, p2 = pts[idx[:, 0]], pts[idx[:, 1]], pts[idx[:, 2]]
    uv = np.zeros((len(p0), 2), np.float32)
    tri = TriangleData(p0=p0.astype(np.float32), p1=p1.astype(np.float32),
                       p2=p2.astype(np.float32), uv0=uv, uv1=uv, uv2=uv)
    print(f"{len(p0)} tris", flush=True)
    bvh = BVHIntersector(tri, None)
    print(f"pallas vmem {bvh._pallas.vmem_bytes/1e6:.1f} MB", flush=True)

    n = 1 << 18
    rng = np.random.default_rng(0)
    eye = np.array([0.0, -3.0, 1.5], np.float32)
    tgt = rng.uniform(-1.4, 1.4, (n, 3)).astype(np.float32)
    tgt[:, 2] *= 0.4
    dc = (tgt - eye); dc /= np.linalg.norm(dc, axis=-1, keepdims=True)
    oc = np.broadcast_to(eye, (n, 3)).copy()
    oi = rng.uniform(-1.6, 1.6, (n, 3)).astype(np.float32)
    di = rng.normal(0, 1, (n, 3)).astype(np.float32)
    di /= np.linalg.norm(di, axis=-1, keepdims=True)
    tmax = jnp.full((n,), 1e8, jnp.float32)

    for name, o, d in (("coherent", oc, dc), ("incoherent", oi, di)):
        o = jnp.asarray(o); d = jnp.asarray(d)
        f = jax.jit(lambda o, d, t: bvh.intersect(o, d, t))
        dt = timeit(f, o, d, tmax)
        print(f"  {name:10s} closest: {dt*1e3:7.2f} ms = {n/dt/1e6:6.2f} Mray/s",
              flush=True)
        fo = jax.jit(lambda o, d, t: bvh.occluded(o, d, t))
        dt = timeit(fo, o, d, tmax)
        print(f"  {name:10s} anyhit : {dt*1e3:7.2f} ms = {n/dt/1e6:6.2f} Mray/s",
              flush=True)


if __name__ == "__main__":
    main()
