"""SMEM scalar-load walk: kill the vector-lane->scalar extract cost.

tpu_probe_iters measured ~450ns fixed overhead per walk iteration — the
node row (15 scalars) and leaf rows (9 scalars x triangles) are read by
extracting lanes from VMEM vectors, and each extract costs tens of
cycles.  SMEM is the scalar memory: individual element loads
(``ref[i, j]``) are legal and cheap there (the earlier probe failed by
loading whole rows).  Variants on the 50k-tri config-3 mesh, rays sorted
by the production keys:

  A nodes VMEM rows, tris VMEM rows     (current kernel)
  B nodes SMEM scalars, tris VMEM rows
  C nodes SMEM scalars, tris SMEM scalars  (SMEM must hold ~1.8MB)
  D like C but 2048-tri mesh               (SMEM ~76KB, surely fits)
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

from pbrt_tpu.accel.bvh import BVHIntersector, build_bvh
from pbrt_tpu.ops.pallas_bvh import (
    BLOCK, BLOCK_LANE, BLOCK_SUB, _DONE, _LEAF_COUNT_BITS, _LEAF_SLOTS,
    _STACK_DEPTH,
)
from pbrt_tpu.ops.stream_bvh import _pack_tree, _safe_inv
from pbrt_tpu.ops.intersect import RAY_EPS
from pbrt_tpu.testscenes import torus_triangle_data


def make_kernel(nodes_smem, tris_smem, leaf_slots):
    def kern(nodes_ref, tris_ref, root_ref,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
             t_out, prim_out, stack_ref):
        ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
        dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
        inv_x, inv_y, inv_z = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
        octant = ((dx[0, 0] < 0).astype(jnp.int32) * 4
                  + (dy[0, 0] < 0).astype(jnp.int32) * 2
                  + (dz[0, 0] < 0).astype(jnp.int32))

        def node_elts(i, idxs):
            if nodes_smem:
                return [nodes_ref[i, j] for j in idxs]
            row = nodes_ref[i]
            return [row[j] for j in idxs]

        def tri_row_elts(r):
            if tris_smem:
                return lambda c: tris_ref[r, c]
            row = tris_ref[r]
            return lambda c: row[c]

        def slab(lo0, lo1, lo2, hi0, hi1, hi2, best_t):
            tlx = (lo0 - ox) * inv_x
            thx = (hi0 - ox) * inv_x
            tly = (lo1 - oy) * inv_y
            thy = (hi1 - oy) * inv_y
            tlz = (lo2 - oz) * inv_z
            thz = (hi2 - oz) * inv_z
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(tlx, thx), jnp.minimum(tly, thy)),
                jnp.minimum(tlz, thz))
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(tlx, thx), jnp.maximum(tly, thy)),
                jnp.maximum(tlz, thz))
            return (tn <= tf) & (tf > RAY_EPS) & (tn < best_t)

        def body(state):
            ref, sp, best_t, best_prim = state
            is_leaf = ref < 0

            def leaf_branch(carry):
                best_t, best_prim = carry
                code = -ref - 1
                first = code >> _LEAF_COUNT_BITS
                count = code & ((1 << _LEAF_COUNT_BITS) - 1)
                for k in range(leaf_slots):
                    elt = tri_row_elts((first >> 3) + (k // _LEAF_SLOTS))
                    pid = first + k
                    c = 16 * (k % _LEAF_SLOTS)
                    p0x, p0y, p0z = elt(c + 0), elt(c + 1), elt(c + 2)
                    e1x, e1y, e1z = elt(c + 3) - p0x, elt(c + 4) - p0y, elt(c + 5) - p0z
                    e2x, e2y, e2z = elt(c + 6) - p0x, elt(c + 7) - p0y, elt(c + 8) - p0z
                    pvx = dy * e2z - dz * e2y
                    pvy = dz * e2x - dx * e2z
                    pvz = dx * e2y - dy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                                        1.0 / jnp.where(det == 0, 1.0, det), 0.0)
                    tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
                    b0 = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    b1 = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    ok = ((k < count) & (jnp.abs(det) > 1e-12) & (b0 >= 0.0)
                          & (b1 >= 0.0) & (b0 + b1 <= 1.0) & (tt > RAY_EPS)
                          & (tt < best_t))
                    best_prim = jnp.where(ok, pid, best_prim)
                    best_t = jnp.where(ok, tt, best_t)
                zero = jnp.int32(0)
                return (zero, zero, jnp.bool_(False), jnp.bool_(True),
                        best_t, best_prim)

            def interior_branch(carry):
                best_t, best_prim = carry
                node = jnp.maximum(ref, 0)
                e = node_elts(node, list(range(15)))
                hit_l = slab(e[0], e[1], e[2], e[3], e[4], e[5], best_t)
                hit_r = slab(e[6], e[7], e[8], e[9], e[10], e[11], best_t)
                any_l = jnp.any(hit_l)
                any_r = jnp.any(hit_r)
                l_ref = e[12].astype(jnp.int32)
                r_ref = e[13].astype(jnp.int32)
                left_first = ((e[14].astype(jnp.int32) >> octant) & 1) == 1
                near = jnp.where(left_first, l_ref, r_ref)
                far = jnp.where(left_first, r_ref, l_ref)
                both = any_l & any_r
                nxt = jnp.where(both, near, jnp.where(any_l, l_ref, r_ref))
                need_pop = jnp.logical_not(any_l | any_r)
                return (jnp.where(need_pop, 0, nxt).astype(jnp.int32),
                        far.astype(jnp.int32), both, need_pop,
                        best_t, best_prim)

            nxt, far, do_push, need_pop, best_t, best_prim = jax.lax.cond(
                is_leaf, leaf_branch, interior_branch, (best_t, best_prim))

            @pl.when(do_push)
            def _():
                stack_ref[jnp.minimum(sp, _STACK_DEPTH - 1)] = far

            sp = sp + do_push.astype(jnp.int32)
            popped = stack_ref[jnp.maximum(sp - 1, 0)]
            empty = sp <= 0
            nxt = jnp.where(need_pop, jnp.where(empty, _DONE, popped), nxt)
            sp = jnp.where(need_pop & jnp.logical_not(empty), sp - 1, sp)
            return nxt, sp, best_t, best_prim

        init = (root_ref[0], jnp.int32(0), tmax_ref[...],
                jnp.full(tmax_ref.shape, -1, jnp.int32))
        _, _, best_t, best_prim = jax.lax.while_loop(
            lambda s: s[0] != _DONE, body, init)
        t_out[...] = best_t
        prim_out[...] = best_prim

    return kern


def run(label, mesh, sorter, o, d, tm, nodes_smem, tris_smem, leaf_slots,
        reps=5, check=None):
    try:
        mins, maxs, skips, firsts, counts, perm = build_bvh(
            mesh.p0, mesh.p1, mesh.p2, leaf_size=leaf_slots)
        nodes_f, tris, root, _ = _pack_tree(
            mins, maxs, skips, firsts, counts,
            mesh.p0[perm], mesh.p1[perm], mesh.p2[perm], leaf_slots=leaf_slots)
        keys = sorter._sort_keys(o, d, tm)
        order = jnp.argsort(keys)
        os_, ds_, tms = o[order], d[order], tm[order]
        n = o.shape[0]
        g = n // BLOCK

        def comp(x):
            return x.reshape(g * BLOCK_SUB, BLOCK_LANE).astype(jnp.float32)

        ray_spec = pl.BlockSpec((BLOCK_SUB, BLOCK_LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((BLOCK_SUB, BLOCK_LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        shape = (g * BLOCK_SUB, BLOCK_LANE)
        kern = make_kernel(nodes_smem, tris_smem, leaf_slots)
        fn = jax.jit(lambda *a: pl.pallas_call(
            kern,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(
                    memory_space=pltpu.SMEM if nodes_smem else pltpu.VMEM),
                pl.BlockSpec(
                    memory_space=pltpu.SMEM if tris_smem else pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + [ray_spec] * 7,
            out_specs=(out_spec,) * 2,
            out_shape=(
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct(shape, jnp.int32),
            ),
            scratch_shapes=[pltpu.SMEM((_STACK_DEPTH,), jnp.int32)],
        )(*a))
        args = (jnp.asarray(nodes_f), jnp.asarray(tris),
                jnp.asarray([root], jnp.int32),
                comp(os_[:, 0]), comp(os_[:, 1]), comp(os_[:, 2]),
                comp(ds_[:, 0]), comp(ds_[:, 1]), comp(ds_[:, 2]), comp(tms))
        out = fn(*args)
        jax.block_until_ready(out[0])
        comp_s = 0.0
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out[0])
        dt = (time.time() - t0) / reps
        hits = float(jnp.mean(out[1] >= 0))
        print(f"{label}: {n/dt/1e6:.2f} Mray/s ({dt*1e3:.2f} ms, hit {hits:.2f})",
              flush=True)
        if check is not None:
            ok = bool(jnp.all((out[1] >= 0) == check))
            print(f"  hit-mask matches reference: {ok}", flush=True)
        return (out[1] >= 0)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED - {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


def main():
    print("device:", jax.devices()[0], flush=True)
    n = 1 << 17
    rng = np.random.default_rng(0)

    td = torus_triangle_data(224, 112)
    sorter = BVHIntersector(td, None, use_pallas=True)
    o = np.tile(np.asarray([2.8, 2.2, 2.8], np.float32), (n, 1))
    tgt = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tm = jnp.full((n,), 1e8, jnp.float32)

    ref = run("A 50k VMEM/VMEM leaf16", td, sorter, o, d, tm, False, False, 16)
    run("B 50k SMEMnodes/VMEMtris leaf16", td, sorter, o, d, tm, True, False, 16,
        check=ref)
    run("C 50k SMEM/SMEM leaf16", td, sorter, o, d, tm, True, True, 16,
        check=ref)
    run("C32 50k SMEM/SMEM leaf32", td, sorter, o, d, tm, True, True, 32,
        check=ref)


if __name__ == "__main__":
    main()
