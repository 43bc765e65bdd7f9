"""Micro-probe: where should BVH tables live for the packet walk?

Hypothesis: the ~1us/iteration cost of the ordered stack walk is dominated
by vector-lane -> scalar extracts when node/tri rows are read from VMEM
(each nf[i] is a lane extract).  SMEM is the scalar memory — if tables
live there, every extract is a cheap scalar load and the VPU only sees
broadcasts.  Variants measured on one mesh/ray set:

  A  nodes VMEM, tris VMEM   (current production kernel)
  B  nodes SMEM, tris VMEM
  C  nodes SMEM, tris SMEM
  D  C + 2x-unrolled while body

Run: python scripts/tpu_probe_smem.py [n_tris]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pbrt_tpu.accel.bvh import build_bvh
from pbrt_tpu.ops.pallas_bvh import BLOCK, BLOCK_LANE, BLOCK_SUB, _STACK_DEPTH
from pbrt_tpu.ops.stream_bvh import _pack_tree, _safe_inv, _walk_tree


def make_kernel(nodes_space, tris_space, unroll):
    def kern(nodes_ref, tris_ref, root_ref,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
             t_out, prim_out, b0_out, b1_out, stack_ref):
        ox = ox_ref[...]
        oy = oy_ref[...]
        oz = oz_ref[...]
        dx = dx_ref[...]
        dy = dy_ref[...]
        dz = dz_ref[...]
        invs = (_safe_inv(dx), _safe_inv(dy), _safe_inv(dz))
        octant = (
            (dx[0, 0] < 0).astype(jnp.int32) * 4
            + (dy[0, 0] < 0).astype(jnp.int32) * 2
            + (dz[0, 0] < 0).astype(jnp.int32)
        )
        best = (
            tmax_ref[...],
            jnp.full(tmax_ref.shape, -1, jnp.int32),
            jnp.zeros(tmax_ref.shape, jnp.float32),
            jnp.zeros(tmax_ref.shape, jnp.float32),
        )
        best = _walk_tree(
            lambda i: nodes_ref[i],
            lambda r: tris_ref[r],
            root_ref[0], (ox, oy, oz, dx, dy, dz), invs, octant, best,
            stack_ref, False, 0,
        )
        t_out[...] = best[0]
        prim_out[...] = best[1]
        b0_out[...] = best[2]
        b1_out[...] = best[3]

    return kern


def run_variant(label, nodes_f, tris, root, o, d, t_max,
                nodes_space, tris_space, unroll=1, reps=5):
    n = o.shape[0]
    g = n // BLOCK

    def comp(x):
        return x.reshape(g * BLOCK_SUB, BLOCK_LANE).astype(jnp.float32)

    ray_spec = pl.BlockSpec(
        (BLOCK_SUB, BLOCK_LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (BLOCK_SUB, BLOCK_LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    shape = (g * BLOCK_SUB, BLOCK_LANE)
    kern = make_kernel(nodes_space, tris_space, unroll)
    try:
        fn = jax.jit(lambda *a: pl.pallas_call(
            kern,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(memory_space=nodes_space),
                pl.BlockSpec(memory_space=tris_space),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + [ray_spec] * 7,
            out_specs=(out_spec,) * 4,
            out_shape=(
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct(shape, jnp.int32),
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct(shape, jnp.float32),
            ),
            scratch_shapes=[pltpu.SMEM((_STACK_DEPTH,), jnp.int32)],
        )(*a))
        args = (jnp.asarray(nodes_f), jnp.asarray(tris),
                jnp.asarray([root], jnp.int32),
                comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
                comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2]), comp(t_max))
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out[0])
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out[0])
        dt = (time.time() - t0) / reps
        hits = float(jnp.mean(out[1].reshape(-1) >= 0))
        print(f"{label}: {n/dt/1e6:.2f} Mray/s ({dt*1e3:.1f} ms, hit {hits:.2f}, "
              f"compile {compile_s:.0f}s)", flush=True)
        return out
    except Exception as e:  # noqa: BLE001 - report and continue probing
        print(f"{label}: FAILED - {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    rng = np.random.default_rng(0)
    base = rng.uniform(-10, 10, (n_tris, 3)).astype(np.float32)
    p0 = base
    p1 = base + rng.normal(0, 1, (n_tris, 3)).astype(np.float32)
    p2 = base + rng.normal(0, 1, (n_tris, 3)).astype(np.float32)
    mins, maxs, skips, firsts, counts, perm = build_bvh(p0, p1, p2, 8)
    nodes_f, tris, root, s2p = _pack_tree(
        mins, maxs, skips, firsts, counts, p0[perm], p1[perm], p2[perm]
    )
    print(f"mesh {n_tris} tris, {nodes_f.shape[0]} interior rows, "
          f"{tris.shape[0]} leaf rows "
          f"(nodes {nodes_f.nbytes//1024}KiB compact, tris {tris.nbytes//1024}KiB)",
          flush=True)
    n = 1 << 16
    o = np.full((n, 3), [0.0, 0.0, -30.0], np.float32)
    tgt = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    tm = jnp.full((n,), 1e8, jnp.float32)
    print("device:", jax.devices()[0], flush=True)

    ref = run_variant("A nodesVMEM/trisVMEM", nodes_f, tris, root, o, d, tm,
                      pltpu.VMEM, pltpu.VMEM)
    outb = run_variant("B nodesSMEM/trisVMEM", nodes_f, tris, root, o, d, tm,
                       pltpu.SMEM, pltpu.VMEM)
    outc = run_variant("C nodesSMEM/trisSMEM", nodes_f, tris, root, o, d, tm,
                       pltpu.SMEM, pltpu.SMEM)
    for name, out in (("B", outb), ("C", outc)):
        if out is not None and ref is not None:
            same = bool(jnp.all(out[1] == ref[1]))
            print(f"  {name} prim match vs A: {same}", flush=True)


if __name__ == "__main__":
    main()
