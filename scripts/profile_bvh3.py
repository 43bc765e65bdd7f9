"""Decompose mesh-traversal cost: sort | kernel-on-sorted | per-iteration."""
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pbrt_tpu.accel.bvh import BVHIntersector
from pbrt_tpu.shapes import TriangleData
from pbrt_tpu.testscenes import _torus_mesh_params


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / reps


def main():
    ps, n_tris = _torus_mesh_params()
    pts = np.asarray(ps.find_point3f("P")).reshape(-1, 3)
    idx = np.asarray(ps.find_int("indices")).reshape(-1, 3)
    p0, p1, p2 = pts[idx[:, 0]], pts[idx[:, 1]], pts[idx[:, 2]]
    uv = np.zeros((len(p0), 2), np.float32)
    tri = TriangleData(p0=p0.astype(np.float32), p1=p1.astype(np.float32),
                       p2=p2.astype(np.float32), uv0=uv, uv1=uv, uv2=uv)
    bvh = BVHIntersector(tri, None)
    k = bvh._pallas

    n = 1 << 18
    rng = np.random.default_rng(0)
    eye = np.array([0.0, -3.0, 1.5], np.float32)
    tgt = rng.uniform(-1.4, 1.4, (n, 3)).astype(np.float32)
    tgt[:, 2] *= 0.4
    dc = (tgt - eye); dc /= np.linalg.norm(dc, axis=-1, keepdims=True)
    oc = np.broadcast_to(eye, (n, 3)).copy()
    tmax = jnp.full((n,), 1e8, jnp.float32)
    o = jnp.asarray(oc); d = jnp.asarray(dc)

    # host presort (octant+morton key computed on host-mirrored logic)
    import numpy as _np
    dn = _np.asarray(dc); on = _np.asarray(oc)
    octant = (dn[:,0]<0)*4 + (dn[:,1]<0)*2 + (dn[:,2]<0)
    smin = _np.asarray(bvh._scene_min); sext = _np.asarray(bvh._scene_extent)
    q = _np.clip((on - smin)/sext, 0, 0.999999)
    qi = (q*512).astype(_np.uint32)
    def p12(v):
        v = v & 0x3FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    morton = p12(qi[:,0]) | (p12(qi[:,1])<<1) | (p12(qi[:,2])<<2)
    keys = (octant.astype(_np.uint32)<<27) | (morton & 0x07FFFFFF)
    order = _np.argsort(keys)
    os_, ds_ = o[order], d[order]

    # 3. iteration count: same kernel but with a counter output
    from pbrt_tpu.ops import pallas_bvh as PB

    counts = []
    def counting_kernel(nodes_f_ref, tris_ref, root_ref,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        tmax_ref, t_out, prim_out, b0_out, b1_out, it_out,
                        stack_ref):
        # wrap the real kernel body but count iterations via t_out trick:
        # replicate minimal loop: count iterations only
        ox = ox_ref[...]; oy = oy_ref[...]; oz = oz_ref[...]
        dx = dx_ref[...]; dy = dy_ref[...]; dz = dz_ref[...]
        t0 = tmax_ref[...]
        def safe_inv(v):
            sign = jnp.where(v < 0.0, -1.0, 1.0)
            return jnp.clip(sign / jnp.maximum(jnp.abs(v), 1e-20), -1e30, 1e30)
        inv_x = safe_inv(dx); inv_y = safe_inv(dy); inv_z = safe_inv(dz)
        octant = ((dx[0,0] < 0).astype(jnp.int32)*4
                  + (dy[0,0] < 0).astype(jnp.int32)*2
                  + (dz[0,0] < 0).astype(jnp.int32))
        def slab(nf, base, best_t):
            tlx = (nf[base+0]-ox)*inv_x; thx = (nf[base+3]-ox)*inv_x
            tly = (nf[base+1]-oy)*inv_y; thy = (nf[base+4]-oy)*inv_y
            tlz = (nf[base+2]-oz)*inv_z; thz = (nf[base+5]-oz)*inv_z
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tlx,thx), jnp.minimum(tly,thy)), jnp.minimum(tlz,thz))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tlx,thx), jnp.maximum(tly,thy)), jnp.maximum(tlz,thz))
            return tn, (tn <= tf) & (tf > 1e-4) & (tn < best_t)
        def body(state):
            ref, sp, iters, best_t = state
            is_leaf = ref < 0
            def leaf_b(c):
                return (jnp.int32(0), jnp.int32(0), jnp.bool_(False), jnp.bool_(True))
            def int_b(c):
                node = jnp.maximum(ref, 0)
                nf = nodes_f_ref[node]
                _, hl = slab(nf, 0, best_t)
                _, hr = slab(nf, 6, best_t)
                al = jnp.any(hl); ar = jnp.any(hr)
                lr = nf[12].astype(jnp.int32); rr = nf[13].astype(jnp.int32)
                lf = ((nf[14].astype(jnp.int32) >> octant) & 1) == 1
                near = jnp.where(lf, lr, rr); far = jnp.where(lf, rr, lr)
                both = al & ar
                nxt = jnp.where(both, near, jnp.where(al, lr, rr))
                pop = jnp.logical_not(al | ar)
                return (jnp.where(pop, 0, nxt).astype(jnp.int32), far.astype(jnp.int32), both, pop)
            nxt, far, push, pop = jax.lax.cond(is_leaf, leaf_b, int_b, (0,))
            @pl.when(push)
            def _():
                stack_ref[jnp.minimum(sp, 95)] = far
            sp = sp + push.astype(jnp.int32)
            popped = stack_ref[jnp.maximum(sp-1, 0)]
            empty = sp <= 0
            nxt = jnp.where(pop, jnp.where(empty, jnp.int32(2**30), popped), nxt)
            sp = jnp.where(pop & jnp.logical_not(empty), sp-1, sp)
            return nxt, sp, iters+1, best_t
        init = (root_ref[0], jnp.int32(0), jnp.int32(0), t0)
        _, _, iters, _ = jax.lax.while_loop(lambda s: s[0] != 2**30, body, init)
        t_out[...] = t0
        prim_out[...] = jnp.full(t0.shape, -1, jnp.int32)
        b0_out[...] = t0; b1_out[...] = t0
        it_out[...] = jnp.broadcast_to(iters, t0.shape)

    g = n // PB.BLOCK
    def comp(x):
        return x.reshape(g * PB.BLOCK_SUB, PB.BLOCK_LANE)
    ray_specs = [pl.BlockSpec((PB.BLOCK_SUB, PB.BLOCK_LANE), lambda i: (i, 0),
                              memory_space=pltpu.VMEM) for _ in range(7)]
    table_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2)]
    root_spec = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    out_spec = pl.BlockSpec((PB.BLOCK_SUB, PB.BLOCK_LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    it_spec = pl.BlockSpec((PB.BLOCK_SUB, PB.BLOCK_LANE), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    shape = (g * PB.BLOCK_SUB, PB.BLOCK_LANE)
    res = pl.pallas_call(
        counting_kernel, grid=(g,),
        in_specs=table_specs + root_spec + ray_specs,
        out_specs=(out_spec, out_spec, out_spec, out_spec, it_spec),
        out_shape=(jax.ShapeDtypeStruct(shape, jnp.float32),
                   jax.ShapeDtypeStruct(shape, jnp.int32),
                   jax.ShapeDtypeStruct(shape, jnp.float32),
                   jax.ShapeDtypeStruct(shape, jnp.float32),
                   jax.ShapeDtypeStruct(shape, jnp.int32)),
        scratch_shapes=[pltpu.SMEM((96,), jnp.int32)],
    )
    fc = jax.jit(lambda a, b, c, *rays: res(a, b, c, *rays))
    args = (k.nodes_f, k.tris, k.root_arr,
            comp(jnp.asarray(os_[:, 0])), comp(jnp.asarray(os_[:, 1])), comp(jnp.asarray(os_[:, 2])),
            comp(jnp.asarray(ds_[:, 0])), comp(jnp.asarray(ds_[:, 1])), comp(jnp.asarray(ds_[:, 2])),
            comp(tmax))
    out = fc(*args)
    iters = np.asarray(out[4])[::8, 0]
    dt = timeit(fc, *args)
    print(f"traversal-only (no leaf tests):      {dt*1e3:8.2f} ms", flush=True)
    print(f"iterations/packet: mean {iters.mean():.0f} min {iters.min()} "
          f"max {iters.max()}; per-iter cost "
          f"{dt/iters.sum()*1e9:.0f} ns", flush=True)


if __name__ == "__main__":
    main()
