"""Head-to-head: whole-tree PallasBVH2 vs StreamBVH on direction-sorted rays.

Decides STREAM_MIN_TRIS: the streaming kernel pays per-grid-step pipeline
overhead that the whole-tree kernel avoids; the whole-tree kernel pays
VMEM residency (dies past ~100k tris).  Measures both on the config-3
torus (50k) with the production sort, plus stream cluster-size variants.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from pbrt_tpu.accel.bvh import BVHIntersector, build_bvh
from pbrt_tpu.ops.pallas_bvh import PallasBVH2
from pbrt_tpu.ops.stream_bvh import StreamBVH
from pbrt_tpu.testscenes import torus_triangle_data


def sorted_traverse(bvh_like, sorter, o, d, tm, label, reps=5):
    keys = sorter._sort_keys(o, d, tm)
    order = jnp.argsort(keys)
    inv = jnp.argsort(order)

    def run(o, d, tm):
        t, prim, b0, b1 = bvh_like.traverse(
            o[order], d[order], tm[order], any_hit=False, remap=False
        )
        return t[inv], prim[inv]

    fn = jax.jit(run)
    t0 = time.time()
    out = fn(o, d, tm)
    jax.block_until_ready(out[0])
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(o, d, tm)
    jax.block_until_ready(out[0])
    dt = (time.time() - t0) / reps
    n = o.shape[0]
    print(f"{label}: {n/dt/1e6:.2f} Mray/s ({dt*1e3:.1f} ms, "
          f"hit {float(jnp.mean(out[1] >= 0)):.2f}, compile {comp:.0f}s)",
          flush=True)


def sort_only_cost(sorter, o, d, tm, reps=10):
    def run(o, d, tm):
        keys = sorter._sort_keys(o, d, tm)
        order = jnp.argsort(keys)
        inv = jnp.argsort(order)
        return o[order][inv]

    fn = jax.jit(run)
    out = fn(o, d, tm)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(o, d, tm)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"sort+unsort only: {dt*1e3:.2f} ms ({o.shape[0]/dt/1e6:.1f} Mray/s "
          "equivalent)", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    td = torus_triangle_data(224, 112)
    print(f"mesh {td.count} tris", flush=True)
    # the production intersector provides the sorter + scene bounds
    sorter = BVHIntersector(td, None, use_pallas=True)
    print("production kernel:", type(sorter._pallas).__name__, flush=True)

    n = 1 << 18
    rng = np.random.default_rng(0)
    o = np.tile(np.asarray([2.8, 2.2, 2.8], np.float32), (n, 1))
    tgt = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tm = jnp.full((n,), 1e8, jnp.float32)

    sort_only_cost(sorter, o, d, tm)

    mins, maxs, skips, firsts, counts, perm = build_bvh(
        td.p0, td.p1, td.p2, leaf_size=8
    )
    whole = PallasBVH2(
        mins, maxs, skips, firsts, counts,
        td.p0[perm], td.p1[perm], td.p2[perm],
    )
    print(f"whole-tree vmem ~{whole.vmem_bytes//1024} KiB", flush=True)
    sorted_traverse(whole, sorter, o, d, tm, "whole-tree 50k")

    for tt in (1024, 4096):
        st = StreamBVH(
            mins, maxs, skips, firsts, counts,
            td.p0[perm], td.p1[perm], td.p2[perm], target_tris=tt,
        )
        sorted_traverse(
            st, sorter, o, d, tm, f"stream 50k target={tt} (C={st.n_clusters})"
        )


if __name__ == "__main__":
    main()
