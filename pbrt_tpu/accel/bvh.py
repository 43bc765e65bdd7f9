"""BVH accelerator: host build, stackless device traversal.

Build (host, numpy): top-down median split on the largest centroid axis,
leaves hold up to ``LEAF_SIZE`` triangles, nodes emitted in depth-first
order with **skip links** (node i's skip = first node after its subtree).

Traversal (device): the skip-link layout makes traversal a single
``lax.while_loop`` with a per-lane node cursor and *no stack* — the
classic GPU threaded-BVH scheme, which maps cleanly onto the TPU VPU:
every step is a handful of [N]-wide gathers (node bbox, leaf triangles)
plus slab/Moller arithmetic.  Lanes that finish park at ``node == M`` and
the loop ends when all lanes are parked.  Front-to-back ordering is not
per-ray (skip links fix child order), but t_max shrinks as hits are found
so far boxes are culled.

Spheres stay on the chunked brute-force path (scenes have few analytic
spheres); the BVH covers triangles, where the primitive counts live.

Replaces the reference's never-built "bvh" accelerator default
(api.rs:237).  A Pallas traversal kernel and a C++ builder are the
planned speed-of-light upgrades.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pbrt_tpu import float_t
from pbrt_tpu.ops.intersect import (
    KIND_NONE,
    KIND_SPHERE,
    KIND_TRI,
    RAY_EPS,
    BruteForceIntersector,
    sphere_intersect_chunk,
)

LEAF_SIZE = 4


def build_bvh(p0, p1, p2, leaf_size=LEAF_SIZE, use_native=True):
    """BVH build; returns (node arrays, prim permutation).

    node arrays: mins [M,3], maxs [M,3], skip [M], first [M], count [M]
    (count==0 for interior nodes); perm [T] maps BVH prim slots to
    original triangle indices.

    Prefers the native binned-SAH builder (native/pbrt_native.cpp) and
    falls back to the Python median-split build.
    """
    if use_native:
        from pbrt_tpu.native import bvh_build_native

        out = bvh_build_native(np.asarray(p0), np.asarray(p1), np.asarray(p2), leaf_size)
        if out is not None:
            return out
    t = len(p0)
    bb_min = np.minimum(np.minimum(p0, p1), p2).astype(np.float32)
    bb_max = np.maximum(np.maximum(p0, p1), p2).astype(np.float32)
    centroid = (0.5 * (bb_min + bb_max)).astype(np.float32)

    perm = np.arange(t, dtype=np.int64)
    mins, maxs, skips, firsts, counts = [], [], [], [], []

    def build_rec(lo, hi):
        idx = len(mins)
        pr = perm[lo:hi]
        mins.append(bb_min[pr].min(axis=0))
        maxs.append(bb_max[pr].max(axis=0))
        skips.append(0)
        if hi - lo <= leaf_size:
            firsts.append(lo)
            counts.append(hi - lo)
        else:
            firsts.append(0)
            counts.append(0)
            cen = centroid[pr]
            ext = cen.max(axis=0) - cen.min(axis=0)
            axis = int(np.argmax(ext))
            mid = (hi - lo) // 2
            order = np.argpartition(cen[:, axis], mid)
            perm[lo:hi] = pr[order]
            build_rec(lo, lo + mid)
            build_rec(lo + mid, hi)
        skips[idx] = len(mins)  # first node after this subtree
        return

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 4 * int(np.log2(max(t, 2)) + 2) * 64 + 10000))
    try:
        if t > 0:
            build_rec(0, t)
    finally:
        sys.setrecursionlimit(old_limit)

    return (
        np.asarray(mins, dtype=np.float32),
        np.asarray(maxs, dtype=np.float32),
        np.asarray(skips, dtype=np.int32),
        np.asarray(firsts, dtype=np.int32),
        np.asarray(counts, dtype=np.int32),
        perm,
    )


class BVHIntersector:
    """Skip-link BVH for triangles + brute-force spheres."""

    def __init__(self, tri_data, sph_data, leaf_size=LEAF_SIZE):
        self.n_tri = tri_data.count if tri_data is not None else 0
        self.n_sph = sph_data.count if sph_data is not None else 0
        self._sph_brute = None
        if self.n_sph:
            self._sph_brute = BruteForceIntersector(None, sph_data)
        if self.n_tri:
            mins, maxs, skips, firsts, counts, perm = build_bvh(
                tri_data.p0, tri_data.p1, tri_data.p2, leaf_size
            )
            self.n_nodes = len(mins)
            self.node_min = jnp.asarray(mins)
            self.node_max = jnp.asarray(maxs)
            self.node_skip = jnp.asarray(skips)
            self.node_first = jnp.asarray(firsts)
            self.node_count = jnp.asarray(counts)
            self.tri_p0 = jnp.asarray(tri_data.p0[perm].astype(float_t))
            self.tri_p1 = jnp.asarray(tri_data.p1[perm].astype(float_t))
            self.tri_p2 = jnp.asarray(tri_data.p2[perm].astype(float_t))
            self.perm = jnp.asarray(perm.astype(np.int32))
            self.leaf_size = leaf_size

    # -- device kernels ----------------------------------------------------

    def _traverse(self, o, d, t_max, any_hit: bool):
        n = o.shape[0]
        m = self.n_nodes
        # safe reciprocal: zero components become +/-1e30 (sign-preserving)
        sign_d = jnp.where(d < 0.0, -1.0, 1.0)
        d_safe = sign_d * jnp.maximum(jnp.abs(d), 1e-20)
        inv_d = jnp.clip(1.0 / d_safe, -1e30, 1e30)

        def cond(state):
            node = state[0]
            return jnp.any(node < m)

        def body(state):
            node, best_t, best_prim, b0c, b1c = state
            active = node < m
            ni = jnp.minimum(node, m - 1)
            bmin = self.node_min[ni]
            bmax = self.node_max[ni]
            t_lo = (bmin - o) * inv_d
            t_hi = (bmax - o) * inv_d
            t_near = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
            t_far = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
            box_hit = active & (t_near <= t_far) & (t_far > RAY_EPS) & (t_near < best_t)
            count = self.node_count[ni]
            is_leaf = count > 0
            first = self.node_first[ni]

            # leaf triangle tests (static unroll over leaf slots)
            for k in range(self.leaf_size):
                pid = jnp.minimum(first + k, self.n_tri - 1)
                valid = box_hit & is_leaf & (k < count)
                p0 = self.tri_p0[pid]
                p1 = self.tri_p1[pid]
                p2 = self.tri_p2[pid]
                e1 = p1 - p0
                e2 = p2 - p0
                pvec = jnp.cross(d, e2)
                det = jnp.sum(e1 * pvec, axis=-1)
                inv_det = jnp.where(
                    jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
                )
                tvec = o - p0
                b0 = jnp.sum(tvec * pvec, axis=-1) * inv_det
                qvec = jnp.cross(tvec, e1)
                b1 = jnp.sum(d * qvec, axis=-1) * inv_det
                tt = jnp.sum(e2 * qvec, axis=-1) * inv_det
                tri_hit = (
                    valid
                    & (jnp.abs(det) > 1e-12)
                    & (b0 >= 0.0)
                    & (b1 >= 0.0)
                    & (b0 + b1 <= 1.0)
                    & (tt > RAY_EPS)
                    & (tt < best_t)
                )
                best_prim = jnp.where(tri_hit, pid, best_prim)
                b0c = jnp.where(tri_hit, b0, b0c)
                b1c = jnp.where(tri_hit, b1, b1c)
                best_t = jnp.where(tri_hit, tt, best_t)

            descend = box_hit & ~is_leaf
            next_node = jnp.where(descend, ni + 1, self.node_skip[ni])
            next_node = jnp.where(active, next_node, m)
            if any_hit:
                found = best_prim >= 0
                next_node = jnp.where(found, m, next_node)
            return next_node, best_t, best_prim, b0c, b1c

        init = (
            jnp.zeros((n,), dtype=jnp.int32),
            jnp.asarray(t_max, dtype=o.dtype),
            jnp.full((n,), -1, dtype=jnp.int32),
            jnp.zeros((n,), dtype=o.dtype),
            jnp.zeros((n,), dtype=o.dtype),
        )
        node, best_t, best_prim, b0, b1 = jax.lax.while_loop(cond, body, init)
        return best_t, best_prim, b0, b1

    def intersect(self, o, d, t_max):
        n = o.shape[0]
        best_t = jnp.broadcast_to(t_max, (n,)).astype(o.dtype)
        best_kind = jnp.full((n,), KIND_NONE, dtype=jnp.int32)
        best_prim = jnp.zeros((n,), dtype=jnp.int32)
        best_b0 = jnp.zeros((n,), dtype=o.dtype)
        best_b1 = jnp.zeros((n,), dtype=o.dtype)

        if self.n_tri:
            t, prim, b0, b1 = self._traverse(o, d, best_t, any_hit=False)
            got = prim >= 0
            best_t = jnp.where(got, t, best_t)
            best_kind = jnp.where(got, KIND_TRI, best_kind)
            best_prim = jnp.where(got, self.perm[jnp.maximum(prim, 0)], best_prim)
            best_b0 = jnp.where(got, b0, best_b0)
            best_b1 = jnp.where(got, b1, best_b1)

        if self.n_sph:
            sph = self._sph_brute.intersect(o, d, best_t)
            closer = sph["hit"] & (sph["t"] < best_t)
            best_t = jnp.where(closer, sph["t"], best_t)
            best_kind = jnp.where(closer, KIND_SPHERE, best_kind)
            best_prim = jnp.where(closer, sph["prim"], best_prim)

        hit = best_kind != KIND_NONE
        return {
            "t": best_t,
            "hit": hit,
            "kind": best_kind,
            "prim": best_prim,
            "b0": best_b0,
            "b1": best_b1,
        }

    def occluded(self, o, d, t_max):
        n = o.shape[0]
        t_max = jnp.broadcast_to(t_max, (n,)).astype(o.dtype)
        found = jnp.zeros((n,), dtype=bool)
        if self.n_tri:
            _, prim, _, _ = self._traverse(o, d, t_max, any_hit=True)
            found = prim >= 0
        if self.n_sph:
            found = found | self._sph_brute.occluded(o, d, t_max)
        return found
