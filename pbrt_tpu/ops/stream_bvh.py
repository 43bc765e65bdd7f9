"""Two-level streaming BVH: VMEM top level, HBM-resident clusters.

Breaks the whole-tree-in-VMEM wall (the old ``accel/bvh.py`` 12MB guard):
the SAH tree is cut at subtree boundaries into clusters of at most
``target_tris`` triangles (cuts are subtrees, so every cluster is
spatially tight and owns a *contiguous* range of the DFS-permuted
triangle array).  Each cluster is packed in the (8,128)-native layout of
``ops/pallas_bvh.py`` and lives in HBM; a wavefront intersection is two
phases:

  A (XLA): every 1024-ray block slab-tests the C cluster bounds ->
     per-block candidate list sorted by packet entry distance (near
     clusters first, so ``best_t`` from early clusters culls late ones).
  B (Pallas): grid ``(block, k)``; the k-th candidate cluster's node and
     triangle tables are DMA'd HBM->VMEM by the Pallas pipeline itself —
     a ``PrefetchScalarGridSpec`` index map reads the candidate list, so
     cluster fetches are double-buffered across grid steps and repeated /
     padded entries skip the DMA entirely.  The hit record (t, prim, b0,
     b1) lives in the revisited output block across all k steps of a ray
     block.

This replaces the reference's never-built "bvh" accelerator default
(/root/reference/src/core/api.rs:237) at the scale its BASELINE config 5
(1M triangles) demands, and it is also the fast path *below* the wall:
within a <=``target_tris`` cluster the speculative packet walk touches a
bounded, cache-hot subtree instead of the whole scene (the treelet
binning that stream tracers use on wide-SIMD machines).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pbrt_tpu.ops.intersect import RAY_EPS
from pbrt_tpu.ops.pallas_bvh import (
    _INERT_T,
    BLOCK,
    BLOCK_LANE,
    BLOCK_SUB,
    _DONE,
    _LEAF_COUNT_BITS,
    _LEAF_SLOTS,
    _STACK_DEPTH,
    _encode_children,
)


def _safe_inv(v):
    sign = jnp.where(v < 0.0, -1.0, 1.0)
    return jnp.clip(sign / jnp.maximum(jnp.abs(v), 1e-20), -1e30, 1e30)


# ---------------------------------------------------------------------------
# Host: cluster cut + packing
# ---------------------------------------------------------------------------


def split_clusters(skips, firsts, counts, n_prims, target):
    """Cut the DFS skip-link tree into subtree clusters of <= target prims.

    Returns a list of (root_node, prim_lo, prim_hi).  DFS order => every
    subtree's primitives are a contiguous slice of the permuted array and
    the clusters partition [0, n_prims).
    """
    skips = np.asarray(skips)
    firsts = np.asarray(firsts)
    counts = np.asarray(counts)
    m = len(skips)
    # prim_lo[i] = first prim under node i = firsts of the first DFS leaf
    # at-or-after i (the last DFS node is always a leaf)
    vals = np.where(counts > 0, firsts.astype(np.int64), -1)
    brev = vals[::-1]
    pos = np.maximum.accumulate(np.where(brev >= 0, np.arange(m), -1))
    prim_lo = np.empty(m + 1, dtype=np.int64)
    prim_lo[:m] = brev[pos][::-1]
    prim_lo[m] = n_prims

    out = []
    stack = [0]
    while stack:
        i = stack.pop()
        lo, hi = prim_lo[i], prim_lo[skips[i]]
        if counts[i] > 0 or hi - lo <= target:
            out.append((int(i), int(lo), int(hi)))
        else:
            left = i + 1
            stack.append(int(skips[left]))  # right child (popped second)
            stack.append(int(left))
    return out


def pack_leaf_rows(firsts, counts, p0, p1, p2, leaf_slots=8):
    """Pack a skip-link tree's leaves into 128-lane triangle rows.

    Returns (tris [n_rows,128] f32, slot_to_prim [n_leaves*leaf_slots]
    i64 — local prim index per packed slot, 0 for empty slots,
    padded_firsts [M] — per-node leaf_slots-aligned packed first slot).
    Shared by the binary packer below and the BVH8 packer (ops/bvh8.py).
    """
    counts = np.asarray(counts)
    firsts = np.asarray(firsts)
    assert leaf_slots % _LEAF_SLOTS == 0
    assert counts.max(initial=0) <= leaf_slots <= (1 << _LEAF_COUNT_BITS) - 1
    leaf_nodes = np.nonzero(counts > 0)[0]
    n_leaves = max(len(leaf_nodes), 1)
    tris = np.zeros((n_leaves * (leaf_slots // _LEAF_SLOTS), 128), dtype=np.float32)
    slot_to_prim = np.zeros((n_leaves * leaf_slots,), dtype=np.int64)
    padded_firsts = np.zeros_like(firsts)
    if len(leaf_nodes):
        lrow = np.arange(len(leaf_nodes))
        padded_firsts[leaf_nodes] = lrow * leaf_slots
        f = firsts[leaf_nodes].astype(np.int64)
        cnt = counts[leaf_nodes].astype(np.int64)
        l_ids = np.repeat(lrow, leaf_slots)
        s_ids = np.tile(np.arange(leaf_slots), len(leaf_nodes))
        valid = s_ids < cnt[l_ids]
        prim = f[l_ids] + s_ids
        slot_to_prim[l_ids * leaf_slots + s_ids] = np.where(valid, prim, 0)
        lv, sv, pv = l_ids[valid], s_ids[valid], prim[valid]
        rv = lv * (leaf_slots // _LEAF_SLOTS) + sv // _LEAF_SLOTS
        cv = 16 * (sv % _LEAF_SLOTS)
        for c in range(3):
            tris[rv, cv + 0 + c] = p0[pv, c]
            tris[rv, cv + 3 + c] = p1[pv, c]
            tris[rv, cv + 6 + c] = p2[pv, c]
    return tris, slot_to_prim, padded_firsts


def _pack_tree(mins, maxs, skips, firsts, counts, p0, p1, p2, leaf_slots=8):
    """Pack one skip-link (sub)tree into the kernel layout (vectorized).

    Returns (nodes_f [ni,16] f32, tris [n_rows,128] f32, root i32,
    slot_to_prim [n_leaves*leaf_slots] i64 — local prim index per packed
    slot, 0 for empty slots).  Same encoding as ``PallasBVH2``: leaf refs
    are negative ``-((first/8)*2^6 + count + 1)`` with ``first``
    leaf_slots-aligned (8 triangles per 128-lane row; leaf_slots=16 packs
    a leaf across 2 consecutive rows — fewer, fatter leaves halve the
    interior-node walk), node rows hold both children's boxes + refs +
    per-octant near-first bits.
    """
    counts = np.asarray(counts)
    firsts = np.asarray(firsts)
    skips = np.asarray(skips)
    tris, slot_to_prim, padded_firsts = pack_leaf_rows(
        firsts, counts, p0, p1, p2, leaf_slots
    )

    if counts[0] > 0:  # whole (sub)tree is a single leaf
        root = np.int32(
            -((int(padded_firsts[0]) >> 3) * (1 << _LEAF_COUNT_BITS)
              + int(counts[0]) + 1)
        )
        nodes_f = np.zeros((1, 16), dtype=np.float32)
        return nodes_f, tris, root, slot_to_prim

    idx, l_ref, r_ref, left, right = _encode_children(skips, padded_firsts, counts)
    ni = len(idx)
    nodes_f = np.zeros((ni, 16), dtype=np.float32)
    nodes_f[:, 0:3] = mins[left]
    nodes_f[:, 3:6] = maxs[left]
    nodes_f[:, 6:9] = mins[right]
    nodes_f[:, 9:12] = maxs[right]
    nodes_f[:, 12] = l_ref.astype(np.float32)
    nodes_f[:, 13] = r_ref.astype(np.float32)
    assert np.abs(l_ref).max() < (1 << 24), "ref exceeds exact-f32 range"
    assert np.abs(r_ref).max() < (1 << 24), "ref exceeds exact-f32 range"
    # per-octant near-first bits (see PallasBVH2): along the axis where
    # the children separate most, the lower-side child goes first iff the
    # ray travels toward +axis
    cl = 0.5 * (mins[left] + maxs[left])
    cr = 0.5 * (mins[right] + maxs[right])
    sep = np.abs(cr - cl)
    axis = np.argmax(sep, axis=1)
    l_lower = (
        np.take_along_axis(cl, axis[:, None], 1)[:, 0]
        <= np.take_along_axis(cr, axis[:, None], 1)[:, 0]
    )
    mask = np.zeros(ni, dtype=np.int32)
    for o in range(8):
        neg = (np.array([o >> 2, o >> 1, o]) & 1).astype(bool)
        d_neg = neg[axis]
        left_first = l_lower != d_neg
        mask |= left_first.astype(np.int32) << o
    nodes_f[:, 14] = mask.astype(np.float32)
    return nodes_f, tris, np.int32(0), slot_to_prim


# ---------------------------------------------------------------------------
# Device: shared ordered stack walk over one (sub)tree
# ---------------------------------------------------------------------------


def _walk_tree(node_row, tri_row, root, rays, invs, octant, best, stack_ref,
               any_hit, prim_base, leaf_slots=8):
    """Ordered near-first stack traversal of one packed tree.

    ``node_row(i) -> [16]`` and ``tri_row(r) -> [128]`` read uniform rows;
    ``best = (best_t, best_prim)`` is folded into and returned; recorded
    prim ids are ``prim_base + packed_slot``.  The walk carries ONLY
    (t, prim): every extra (8,128) register in the cond/while state was
    measured at ~150x whole-kernel slowdown (Mosaic spills the carried
    vregs per iteration), so barycentrics are re-derived OUTSIDE the
    kernel from the winning triangle (accel/bvh.py _bary_from_hit).
    """
    ox, oy, oz, dx, dy, dz = rays
    inv_x, inv_y, inv_z = invs

    def slab(nf, base, best_t):
        t_lo_x = (nf[base + 0] - ox) * inv_x
        t_hi_x = (nf[base + 3] - ox) * inv_x
        t_lo_y = (nf[base + 1] - oy) * inv_y
        t_hi_y = (nf[base + 4] - oy) * inv_y
        t_lo_z = (nf[base + 2] - oz) * inv_z
        t_hi_z = (nf[base + 5] - oz) * inv_z
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(t_lo_x, t_hi_x), jnp.minimum(t_lo_y, t_hi_y)),
            jnp.minimum(t_lo_z, t_hi_z),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(t_lo_x, t_hi_x), jnp.maximum(t_lo_y, t_hi_y)),
            jnp.maximum(t_lo_z, t_hi_z),
        )
        hit = (t_near <= t_far) & (t_far > RAY_EPS) & (t_near < best_t)
        return t_near, hit

    def body(state):
        ref, sp, best_t, best_prim = state
        is_leaf = ref < 0

        def leaf_branch(carry):
            best_t, best_prim = carry
            code = -ref - 1
            first = (code >> _LEAF_COUNT_BITS) << 3
            count = code & ((1 << _LEAF_COUNT_BITS) - 1)
            rows = [
                tri_row((first >> 3) + r)  # [128]: 8 slots x 16 cols
                for r in range(leaf_slots // _LEAF_SLOTS)
            ]
            for k in range(leaf_slots):
                row = rows[k // _LEAF_SLOTS]
                pid = prim_base + first + k
                c = 16 * (k % _LEAF_SLOTS)
                p0x, p0y, p0z = row[c + 0], row[c + 1], row[c + 2]
                e1x, e1y, e1z = row[c + 3] - p0x, row[c + 4] - p0y, row[c + 5] - p0z
                e2x, e2y, e2z = row[c + 6] - p0x, row[c + 7] - p0y, row[c + 8] - p0z
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = jnp.where(
                    jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
                )
                tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
                b0 = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                b1 = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                ok = (
                    (k < count)
                    & (jnp.abs(det) > 1e-12)
                    & (b0 >= 0.0)
                    & (b1 >= 0.0)
                    & (b0 + b1 <= 1.0)
                    & (tt > RAY_EPS)
                    & (tt < best_t)
                )
                best_prim = jnp.where(ok, pid, best_prim)
                best_t = jnp.where(ok, tt, best_t)
            if any_hit:
                # a found lane stops accepting AND stops pulling boxes:
                # best_t=0 fails every later t_near < best_t test, so
                # all-found packets terminate by draining the stack — no
                # per-iteration jnp.all() reduction (callers of occluded
                # read only prim)
                best_t = jnp.where(best_prim >= 0, _INERT_T, best_t)
            zero = jnp.int32(0)
            return (zero, zero, jnp.bool_(False), jnp.bool_(True),
                    best_t, best_prim)

        def interior_branch(carry):
            best_t, best_prim = carry
            node = jnp.maximum(ref, 0)
            nf = node_row(node)
            tn_l, hit_l = slab(nf, 0, best_t)
            tn_r, hit_r = slab(nf, 6, best_t)
            # ONE cross-lane reduction for both children: per-lane packed
            # counts (left in the low 11 bits of the sum, right above —
            # 1024 lanes max, so 2048 separates exactly)
            s = jnp.sum(
                hit_l.astype(jnp.int32) + 2048 * hit_r.astype(jnp.int32)
            )
            any_l = (s & 2047) > 0
            any_r = s >= 2048
            l_ref = nf[12].astype(jnp.int32)
            r_ref = nf[13].astype(jnp.int32)
            left_first = ((nf[14].astype(jnp.int32) >> octant) & 1) == 1
            near = jnp.where(left_first, l_ref, r_ref)
            far = jnp.where(left_first, r_ref, l_ref)
            both = any_l & any_r
            nxt = jnp.where(both, near, jnp.where(any_l, l_ref, r_ref))
            need_pop = jnp.logical_not(any_l | any_r)
            return (jnp.where(need_pop, 0, nxt).astype(jnp.int32),
                    far.astype(jnp.int32),
                    both, need_pop, best_t, best_prim)

        nxt, far, do_push, need_pop, best_t, best_prim = jax.lax.cond(
            is_leaf, leaf_branch, interior_branch, (best_t, best_prim)
        )

        @pl.when(do_push)
        def _():
            stack_ref[jnp.minimum(sp, _STACK_DEPTH - 1)] = far

        sp = sp + do_push.astype(jnp.int32)
        popped = stack_ref[jnp.maximum(sp - 1, 0)]
        empty = sp <= 0
        nxt = jnp.where(need_pop, jnp.where(empty, _DONE, popped), nxt)
        sp = jnp.where(need_pop & jnp.logical_not(empty), sp - 1, sp)
        return nxt, sp, best_t, best_prim

    def cond(state):
        return state[0] != _DONE

    init = (root, jnp.int32(0)) + tuple(best)
    out = jax.lax.while_loop(cond, body, init)
    return out[2], out[3]


def _walk_tree_fused(node_row, tri_row, root, rays, invs, octant, best,
                     stack_ref, any_hit, prim_base, leaf_slots=8):
    """Fused-leaf ordered traversal: leaf children are intersected AT THE
    PARENT (under ``lax.cond``) instead of costing their own loop
    iteration.  With 16-slot leaves roughly half of all node visits are
    leaves, and the r3 forensics put per-iteration cost at ~440 ns of
    scalar/branch overhead (the vector math is minor) — so resolving
    leaves in-place trades two rarely-taken branches for ~2x fewer
    iterations.  Same hit results as :func:`_walk_tree`.
    """
    ox, oy, oz, dx, dy, dz = rays
    inv_x, inv_y, inv_z = invs

    def slab(nf, base, best_t):
        t_lo_x = (nf[base + 0] - ox) * inv_x
        t_hi_x = (nf[base + 3] - ox) * inv_x
        t_lo_y = (nf[base + 1] - oy) * inv_y
        t_hi_y = (nf[base + 4] - oy) * inv_y
        t_lo_z = (nf[base + 2] - oz) * inv_z
        t_hi_z = (nf[base + 5] - oz) * inv_z
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(t_lo_x, t_hi_x), jnp.minimum(t_lo_y, t_hi_y)),
            jnp.minimum(t_lo_z, t_hi_z),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(t_lo_x, t_hi_x), jnp.maximum(t_lo_y, t_hi_y)),
            jnp.maximum(t_lo_z, t_hi_z),
        )
        hit = (t_near <= t_far) & (t_far > RAY_EPS) & (t_near < best_t)
        return t_near, hit

    def leaf_test(ref, carry):
        best_t, best_prim = carry
        code = -ref - 1
        first = (code >> _LEAF_COUNT_BITS) << 3
        count = code & ((1 << _LEAF_COUNT_BITS) - 1)
        rows = [
            tri_row((first >> 3) + r)
            for r in range(leaf_slots // _LEAF_SLOTS)
        ]
        for k in range(leaf_slots):
            row = rows[k // _LEAF_SLOTS]
            pid = prim_base + first + k
            c = 16 * (k % _LEAF_SLOTS)
            p0x, p0y, p0z = row[c + 0], row[c + 1], row[c + 2]
            e1x, e1y, e1z = row[c + 3] - p0x, row[c + 4] - p0y, row[c + 5] - p0z
            e2x, e2y, e2z = row[c + 6] - p0x, row[c + 7] - p0y, row[c + 8] - p0z
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = jnp.where(
                jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
            )
            tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
            b0 = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            b1 = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            ok = (
                (k < count)
                & (jnp.abs(det) > 1e-12)
                & (b0 >= 0.0)
                & (b1 >= 0.0)
                & (b0 + b1 <= 1.0)
                & (tt > RAY_EPS)
                & (tt < best_t)
            )
            best_prim = jnp.where(ok, pid, best_prim)
            best_t = jnp.where(ok, tt, best_t)
        return best_t, best_prim

    def maybe_leaf(take, ref, carry):
        return jax.lax.cond(take, lambda c: leaf_test(ref, c),
                            lambda c: c, carry)

    def body(state):
        node, sp, best_t, best_prim = state
        nf = node_row(node)
        _tn_l, hit_l = slab(nf, 0, best_t)
        _tn_r, hit_r = slab(nf, 6, best_t)
        any_l = jnp.any(hit_l)
        any_r = jnp.any(hit_r)
        l_ref = nf[12].astype(jnp.int32)
        r_ref = nf[13].astype(jnp.int32)
        l_leaf = l_ref < 0
        r_leaf = r_ref < 0
        best_t, best_prim = maybe_leaf(
            any_l & l_leaf, l_ref, (best_t, best_prim)
        )
        best_t, best_prim = maybe_leaf(
            any_r & r_leaf, r_ref, (best_t, best_prim)
        )
        go_l = any_l & jnp.logical_not(l_leaf)
        go_r = any_r & jnp.logical_not(r_leaf)
        left_first = ((nf[14].astype(jnp.int32) >> octant) & 1) == 1
        near = jnp.where(left_first, l_ref, r_ref)
        far = jnp.where(left_first, r_ref, l_ref)
        near_go = jnp.where(left_first, go_l, go_r)
        far_go = jnp.where(left_first, go_r, go_l)
        both = near_go & far_go

        @pl.when(both)
        def _():
            stack_ref[jnp.minimum(sp, _STACK_DEPTH - 1)] = far

        sp = sp + both.astype(jnp.int32)
        nxt = jnp.where(near_go, near, far)
        need_pop = jnp.logical_not(near_go | far_go)
        popped = stack_ref[jnp.maximum(sp - 1, 0)]
        empty = sp <= 0
        nxt = jnp.where(need_pop, jnp.where(empty, _DONE, popped), nxt)
        sp = jnp.where(need_pop & jnp.logical_not(empty), sp - 1, sp)
        if any_hit:
            nxt = jnp.where(jnp.all(best_prim >= 0), _DONE, nxt)
        return nxt, sp, best_t, best_prim

    def cond(state):
        return state[0] != _DONE

    best_t, best_prim = best
    # a whole-cluster leaf root is resolved without entering the loop
    root_leaf = root < jnp.int32(0)
    best_t, best_prim = maybe_leaf(root_leaf, root, (best_t, best_prim))
    start = jnp.where(root_leaf, _DONE, root)
    out = jax.lax.while_loop(
        cond, body, (start, jnp.int32(0), best_t, best_prim)
    )
    return out[2], out[3]


def _stream_kernel(cl_ref, cn_ref, rt_ref,
                   nodes_ref, tris_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
                   t_out, prim_out,
                   stack_ref,
                   *, any_hit: bool, slots_per_cluster: int, leaf_slots: int,
                   fused: bool = False, wide: bool = False):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        t_out[...] = tmax_ref[...]
        prim_out[...] = jnp.full(prim_out.shape, -1, jnp.int32)

    b = pl.program_id(0)
    active = k < cn_ref[b]
    if any_hit:
        active = jnp.logical_and(
            active, jnp.logical_not(jnp.all(prim_out[...] >= 0))
        )

    @pl.when(active)
    def _():
        cid = cl_ref[b, k]
        root = rt_ref[cid]
        prim_base = cid * slots_per_cluster
        ox = ox_ref[...]
        oy = oy_ref[...]
        oz = oz_ref[...]
        dx = dx_ref[...]
        dy = dy_ref[...]
        dz = dz_ref[...]
        invs = (_safe_inv(dx), _safe_inv(dy), _safe_inv(dz))
        best = (t_out[...], prim_out[...])
        # rays are pre-sorted by direction octant, so one representative
        # lane's sign bits pick the near child for the whole packet
        sx = (dx[0, 0] < 0).astype(jnp.int32)
        sy = (dy[0, 0] < 0).astype(jnp.int32)
        sz = (dz[0, 0] < 0).astype(jnp.int32)
        if wide:
            from pbrt_tpu.ops.bvh8 import _walk8

            best = _walk8(
                lambda i: nodes_ref[0, i],
                lambda r: tris_ref[0, r],
                root, (ox, oy, oz, dx, dy, dz), invs, (sx, sy, sz), best,
                stack_ref, any_hit, prim_base, leaf_slots,
            )
        else:
            octant = sx * 4 + sy * 2 + sz
            walk = _walk_tree_fused if fused else _walk_tree
            best = walk(
                lambda i: nodes_ref[0, i],
                lambda r: tris_ref[0, r],
                root, (ox, oy, oz, dx, dy, dz), invs, octant, best,
                stack_ref, any_hit, prim_base, leaf_slots,
            )
        t_out[...], prim_out[...] = best


def pack_stream_tables(mins, maxs, skips, firsts, counts,
                       tri_p0, tri_p1, tri_p2,
                       target_tris: int | None = None, leaf_slots: int = 8,
                       wide: bool = False):
    """Host-side cluster cut + packing for the streaming kernel.

    Returns numpy arrays {nodes [C,NP,16] (binary) or [C,NP,64] (wide
    BVH8 — ops/bvh8.py layout; the kernel infers the walk from the last
    dim), tris [C,LP,128], roots [C], cl_min/cl_max [C,3], slot_to_prim
    [C*slots] (DFS prim index per packed slot), slots_per_cluster} —
    consumed by :class:`StreamBVH` and, per shard, by the tp-sharded
    path (parallel/geomshard.py), which stacks them with a leading shard
    dim and shards over the mesh.
    """
    n_prims = len(tri_p0)
    if target_tris is None:
        # big clusters: every (block, cluster) grid step costs ~0.6us
        # of pipeline machinery and the candidate count per block drops
        # with fatter clusters, so fewer/bigger wins while two cluster
        # buffers fit VMEM.  r5 on-chip sweep (1M tris, 262k rays):
        # 15625-tri clusters 98.0 ms, 24k 93.2, 32k 88.4, 49k 88.9,
        # 65k 89.2, 98k = VMEM compile failure -> cap at 32k
        target_tris = int(min(32768, max(4096, n_prims // 32)))
    clusters = split_clusters(skips, firsts, counts, n_prims, target_tris)
    skips = np.asarray(skips)
    firsts = np.asarray(firsts)
    counts = np.asarray(counts)

    if wide:
        from pbrt_tpu.ops.bvh8 import pack_tree8 as _packer
    else:
        _packer = _pack_tree
    packs = []
    for (i, lo, hi) in clusters:
        sl = slice(i, int(skips[i]))
        packs.append(
            _packer(
                mins[sl], maxs[sl], skips[sl] - i, firsts[sl] - lo,
                counts[sl], tri_p0[lo:hi], tri_p1[lo:hi], tri_p2[lo:hi],
                leaf_slots=leaf_slots,
            )
        )

    c = len(packs)
    nodes_pad = max(8, -(-max(p[0].shape[0] for p in packs) // 8) * 8)
    leaves_pad = max(8, -(-max(p[1].shape[0] for p in packs) // 8) * 8)
    node_cols = packs[0][0].shape[1]  # 16 binary / 64 wide
    all_nodes = np.zeros((c, nodes_pad, node_cols), dtype=np.float32)
    all_tris = np.zeros((c, leaves_pad, 128), dtype=np.float32)
    roots = np.zeros((c,), dtype=np.int32)
    slots_per_cluster = leaves_pad * _LEAF_SLOTS  # leaves_pad = 128-lane ROWS
    slot_to_prim = np.zeros((c * slots_per_cluster,), dtype=np.int64)
    for ci, ((i, lo, hi), (nf, tr, root, s2p)) in enumerate(zip(clusters, packs)):
        all_nodes[ci, : nf.shape[0]] = nf
        all_tris[ci, : tr.shape[0]] = tr
        roots[ci] = root
        base = ci * slots_per_cluster
        slot_to_prim[base : base + len(s2p)] = s2p + lo

    return {
        "nodes": all_nodes,
        "tris": all_tris,
        "roots": roots,
        "cl_min": np.stack([mins[i] for (i, _, _) in clusters]).astype(np.float32),
        "cl_max": np.stack([maxs[i] for (i, _, _) in clusters]).astype(np.float32),
        "slot_to_prim": slot_to_prim,
        "slots_per_cluster": slots_per_cluster,
    }


def split_pad_rays(o, d, t_max, n):
    """Marshal rays to padded per-component columns.

    ``o``/``d`` may be [N,3] arrays OR 3-tuples of [N] columns — sorted
    wavefronts arrive as columns straight out of a ``lax.sort`` co-sort
    (accel/bvh.py), and re-interleaving them into [N,3] just to split
    again here costs a pair of relayouts per intersect.
    """
    if isinstance(o, (tuple, list)):
        ox, oy, oz = o
        dx, dy, dz = d
    else:
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    t_max = jnp.broadcast_to(t_max, (n,))
    pad = (-n) % BLOCK
    if pad:
        zp = jnp.zeros((pad,), ox.dtype)
        onep = jnp.ones((pad,), dx.dtype)
        ox, oy, oz = (jnp.concatenate([c, zp]) for c in (ox, oy, oz))
        dx, dy, dz = (jnp.concatenate([c, onep]) for c in (dx, dy, dz))
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    return (ox, oy, oz, dx, dy, dz, t_max)


def _stream_candidates(cl_min, cl_max, n_clusters, comps):
    """Phase A: per-1024-ray-block candidate clusters (see StreamBVH).

    Standalone so the tp-sharded path can run it on per-shard tables
    inside ``shard_map``.  Padded clusters must use cl_min = cl_max =
    +inf (t_near = +inf fails ``tn < t_max``, so they are excluded on
    every block); INVERTED bounds (+inf/-inf) would make every ray
    slab-hit them (tn = -inf, tf = +inf) — see geomshard.py.
    """
    ox, oy, oz, dx, dy, dz, t_max = comps
    n = ox.shape[0]
    b = n // BLOCK
    cminx, cminy, cminz = cl_min[:, 0], cl_min[:, 1], cl_min[:, 2]
    cmaxx, cmaxy, cmaxz = cl_max[:, 0], cl_max[:, 1], cl_max[:, 2]

    # one fused [N, C] pass + per-block segment reductions — the former
    # per-block lax.scan serialized ~N/1024 small steps, whose per-step
    # overhead showed up in every intersect
    ivx = _safe_inv(dx)[:, None]
    ivy = _safe_inv(dy)[:, None]
    ivz = _safe_inv(dz)[:, None]
    lx = (cminx[None] - ox[:, None]) * ivx
    hx = (cmaxx[None] - ox[:, None]) * ivx
    ly = (cminy[None] - oy[:, None]) * ivy
    hy = (cmaxy[None] - oy[:, None]) * ivy
    lz = (cminz[None] - oz[:, None]) * ivz
    hz = (cmaxz[None] - oz[:, None]) * ivz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(lx, hx), jnp.minimum(ly, hy)),
        jnp.minimum(lz, hz),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(lx, hx), jnp.maximum(ly, hy)),
        jnp.maximum(lz, hz),
    )
    hit = (tn <= tf) & (tf > RAY_EPS) & (tn < t_max[:, None])  # [N, C]
    hit_b = hit.reshape(b, BLOCK, n_clusters)
    hits = jnp.any(hit_b, axis=1)  # [B, C]
    t_ent = jnp.min(
        jnp.where(hit_b, tn.reshape(b, BLOCK, n_clusters), jnp.inf), axis=1
    )
    key = jnp.where(hits, t_ent, jnp.inf)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    cnt = hits.sum(axis=1).astype(jnp.int32)
    kk = jnp.arange(n_clusters, dtype=jnp.int32)[None]
    clamped = jnp.minimum(kk, jnp.maximum(cnt[:, None] - 1, 0))
    clist = jnp.take_along_axis(order, clamped, axis=1)
    return clist, cnt


def stream_traverse(nodes, tris, roots, cl_min, cl_max, o, d, t_max,
                    any_hit=False, leaf_slots=8, interpret=False,
                    fused=None):
    """Functional form of :meth:`StreamBVH.traverse` over explicit device
    arrays — the entry point for per-shard traversal inside ``shard_map``
    (parallel/geomshard.py tp path).

    nodes [C, NP, 16] (binary) or [C, NP, 64] (wide BVH8 — the walk is
    inferred from the last dim), tris [C, LP, 128], roots [C],
    cl_min/cl_max [C, 3]; o, d [N, 3]; t_max [N].  Returns (t [N],
    packed slot id [N] with -1 for miss); callers resolve slots through
    their own slot_to_prim map.
    """
    n = (o[0] if isinstance(o, (tuple, list)) else o).shape[0]
    n_clusters, nodes_pad = nodes.shape[0], nodes.shape[1]
    node_cols = nodes.shape[2]
    wide = node_cols != 16
    leaves_pad = tris.shape[1]
    slots_per_cluster = leaves_pad * _LEAF_SLOTS
    comps = split_pad_rays(o, d, t_max, n)
    total = comps[0].shape[0]
    g = total // BLOCK

    clist, cnts = _stream_candidates(cl_min, cl_max, n_clusters, comps)

    def comp(x):
        return x.reshape(g * BLOCK_SUB, BLOCK_LANE).astype(jnp.float32)

    shape = (g * BLOCK_SUB, BLOCK_LANE)
    ray_spec = pl.BlockSpec(
        (BLOCK_SUB, BLOCK_LANE),
        lambda b, k, cl, cn, rt: (b, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(g, n_clusters),
        in_specs=[
            pl.BlockSpec(
                (1, nodes_pad, node_cols),
                lambda b, k, cl, cn, rt: (cl[b, k], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, leaves_pad, 128),
                lambda b, k, cl, cn, rt: (cl[b, k], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + [ray_spec] * 7,
        out_specs=tuple(
            pl.BlockSpec(
                (BLOCK_SUB, BLOCK_LANE),
                lambda b, k, cl, cn, rt: (b, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(2)
        ),
        # wide walks need one extra slot: the branchless non-hit stores
        # land in a trash slot above the stack (ops/bvh8.py)
        scratch_shapes=[pltpu.SMEM((_STACK_DEPTH + 1,), jnp.int32)],
    )
    if fused is None:
        import os

        fused = os.environ.get("PBRT_TPU_FUSED_LEAF", "0") not in ("", "0")
    kernel = functools.partial(
        _stream_kernel,
        any_hit=any_hit,
        slots_per_cluster=slots_per_cluster,
        leaf_slots=leaf_slots,
        fused=fused,
        wide=wide,
    )
    t_r, prim_r = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
        ),
        interpret=interpret,
    )(
        clist, cnts, roots,
        nodes, tris,
        *[comp(c) for c in comps],
    )

    def flat(x):
        return x.reshape(-1)[:n]

    return flat(t_r).astype(comps[0].dtype), flat(prim_r)


class StreamBVH:
    """HBM-scale intersector: top-level cluster culling + streamed walks.

    Same ``traverse`` interface as ``PallasBVH2``; accepts any triangle
    count — VMEM holds only the two in-flight clusters, not the scene.
    """

    def __init__(self, mins, maxs, skips, firsts, counts,
                 tri_p0, tri_p1, tri_p2,
                 target_tris: int | None = None, interpret: bool = False,
                 leaf_slots: int = 8, wide: bool = False):
        self.leaf_slots = int(leaf_slots)
        t = pack_stream_tables(
            mins, maxs, skips, firsts, counts, tri_p0, tri_p1, tri_p2,
            target_tris=target_tris, leaf_slots=self.leaf_slots,
            wide=wide,
        )
        self.slots_per_cluster = t["slots_per_cluster"]
        self.n_clusters = t["nodes"].shape[0]
        self.n_tris = len(tri_p0)
        self.nodes = jnp.asarray(t["nodes"])
        self.tris = jnp.asarray(t["tris"])
        self.roots = jnp.asarray(t["roots"])
        self.cl_min = jnp.asarray(t["cl_min"])
        self.cl_max = jnp.asarray(t["cl_max"])
        self.slot_to_prim = t["slot_to_prim"]
        self.slot_to_prim_j = jnp.asarray(t["slot_to_prim"].astype(np.int32))
        self.interpret = interpret
        self._nodes_pad = t["nodes"].shape[1]
        self._leaves_pad = t["tris"].shape[1]
        # VMEM working set: 2x double-buffered (nodes + tris) blocks; the
        # minor dims pad to the 128-lane tile
        self.vmem_bytes = 2 * (
            self._nodes_pad * 128 * 4 + self._leaves_pad * 128 * 4
        )

    # -- phase A: per-block candidate clusters -----------------------------

    # -- phase A + B: delegated to the standalone functions ----------------

    def traverse(self, o, d, t_max, any_hit=False, remap=True):
        """o, d: [N,3]; t_max: [N].  Returns (t, prim) — barycentrics are
        derived by the caller from the winning triangle (carrying them
        through the walk costs ~150x, see _walk_tree).

        ``remap=False`` returns raw cluster-slot ids (callers that fold
        ``slot_to_prim`` into their own prim permutation)."""
        t_r, prim_r = stream_traverse(
            self.nodes, self.tris, self.roots, self.cl_min, self.cl_max,
            o, d, t_max, any_hit=any_hit, leaf_slots=self.leaf_slots,
            interpret=self.interpret,
        )
        if remap:
            prim_r = jnp.where(
                prim_r >= 0,
                self.slot_to_prim_j[jnp.maximum(prim_r, 0)],
                prim_r,
            )
        return t_r, prim_r
