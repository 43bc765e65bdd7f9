"""Pallas TPU kernel: packet BVH traversal + triangle intersection.

Design (TPU-first, not a GPU port): per-lane divergent traversal needs
per-lane gathers, which the VPU hates.  Instead each Pallas program
traverses the tree ONCE for a *block* of rays (speculative packet
traversal): the node cursor is a scalar, node/triangle data are loaded as
uniform rows from VMEM (the whole BVH lives on-chip — ~1MB per 25k nodes),
and every test is a dense [8,128] vector op against broadcast scalars.
Block-level control flow: descend if ANY lane hits the box, else follow
the skip link.  No gathers, no stacks, no HBM traffic in the loop.

Efficient for coherent ray blocks (camera rays, shadow rays to the same
light); bounce rays lose some efficiency to speculation — ray sorting is
the planned fix.  Correctness is exact regardless (tests vs brute force).

Layouts:
  nodes_f  [M, 8]  f32: minx miny minz maxx maxy maxz pad pad
  nodes_i  [M, 4]  i32: skip first count pad
  tris     [T, 16] f32: p0.xyz p1.xyz p2.xyz pad...
  rays in  [B, 128] f32 per component (block = 8x128 = 1024 rays)
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pbrt_tpu.ops.intersect import RAY_EPS

BLOCK_SUB = 8  # sublanes
BLOCK_LANE = 128  # lanes
BLOCK = BLOCK_SUB * BLOCK_LANE
# the single-reduction child tests pack left-hit counts in the low 11
# bits (multiplier 2048) — a block past 2047 lanes would alias the fields
assert BLOCK < 2048, "packed any_l/any_r reduction requires BLOCK < 2048"
LEAF_SIZE = 4
# Inert sentinel for lanes that must pull NO boxes (dead on entry, or
# any-hit lanes that already found a hit).  best_t = 0 is NOT enough:
# boxes containing the ray origin have t_near < 0 < best_t and still
# pass the slab test, so a "terminated" lane kept pulling its whole
# ancestor/overlap chain (measured r5).  Any real t_near is > -1e30
# (safe_inv clamps to +-1e30 and scene extents are small), so -1e30
# fails every slab and every `tt < best_t` leaf test.  Consumers mask
# t by prim >= 0, and the streaming kernel's cross-cluster/shard t
# reductions never see it (entry-inerting is scoped to the whole-tree
# kernels; the found-lane write is any-hit only, where t is unused).
_INERT_T = np.float32(-1e30)


def _traverse_kernel(
    nodes_f_ref,
    nodes_i_ref,
    tris_ref,
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmax_ref,
    t_out, prim_out, b0_out, b1_out,
    *, n_nodes: int, any_hit: bool,
):
    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    t0 = tmax_ref[...]
    # dead lanes (t_max <= eps) go fully inert instead of pulling their
    # origin-containing boxes (see _INERT_T)
    t0 = jnp.where(t0 <= RAY_EPS, _INERT_T, t0)

    def safe_inv(v):
        sign = jnp.where(v < 0.0, -1.0, 1.0)
        return sign / jnp.maximum(jnp.abs(v), 1e-20)

    inv_x = jnp.clip(safe_inv(dx), -1e30, 1e30)
    inv_y = jnp.clip(safe_inv(dy), -1e30, 1e30)
    inv_z = jnp.clip(safe_inv(dz), -1e30, 1e30)

    def body(state):
        node, best_t, best_prim, b0a, b1a = state
        nf = nodes_f_ref[node]  # [8] uniform row
        ni = nodes_i_ref[node]  # [4]
        t_lo_x = (nf[0] - ox) * inv_x
        t_hi_x = (nf[3] - ox) * inv_x
        t_lo_y = (nf[1] - oy) * inv_y
        t_hi_y = (nf[4] - oy) * inv_y
        t_lo_z = (nf[2] - oz) * inv_z
        t_hi_z = (nf[5] - oz) * inv_z
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(t_lo_x, t_hi_x), jnp.minimum(t_lo_y, t_hi_y)),
            jnp.minimum(t_lo_z, t_hi_z),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(t_lo_x, t_hi_x), jnp.maximum(t_lo_y, t_hi_y)),
            jnp.maximum(t_lo_z, t_hi_z),
        )
        box_hit = (t_near <= t_far) & (t_far > RAY_EPS) & (t_near < best_t)
        any_box = jnp.any(box_hit)
        skip = ni[0]
        first = ni[1]
        count = ni[2]
        is_leaf = count > 0

        def leaf_tests(carry):
            best_t, best_prim, b0a, b1a = carry
            for k in range(LEAF_SIZE):
                pid = first + k
                tri = tris_ref[jnp.minimum(pid, tris_ref.shape[0] - 1)]
                p0x, p0y, p0z = tri[0], tri[1], tri[2]
                e1x, e1y, e1z = tri[3] - p0x, tri[4] - p0y, tri[5] - p0z
                e2x, e2y, e2z = tri[6] - p0x, tri[7] - p0y, tri[8] - p0z
                # pvec = d x e2
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
                    & box_hit
                    & (jnp.abs(det) > 1e-12)
                    & (b0 >= 0.0)
                    & (b1 >= 0.0)
                    & (b0 + b1 <= 1.0)
                    & (tt > RAY_EPS)
                    & (tt < best_t)
                )
                best_prim = jnp.where(ok, pid, best_prim)
                b0a = jnp.where(ok, b0, b0a)
                b1a = jnp.where(ok, b1, b1a)
                best_t = jnp.where(ok, tt, best_t)
            return best_t, best_prim, b0a, b1a

        do_leaf = any_box & is_leaf
        best_t, best_prim, b0a, b1a = jax.lax.cond(
            do_leaf,
            leaf_tests,
            lambda c: c,
            (best_t, best_prim, b0a, b1a),
        )
        descend = any_box & jnp.logical_not(is_leaf)
        next_node = jnp.where(descend, node + 1, skip)
        if any_hit:
            next_node = jnp.where(jnp.all(best_prim >= 0), n_nodes, next_node)
        return next_node, best_t, best_prim, b0a, b1a

    def cond(state):
        return state[0] < n_nodes

    init = (
        jnp.int32(0),
        t0,
        jnp.full(t0.shape, -1, dtype=jnp.int32),
        jnp.zeros(t0.shape, dtype=jnp.float32),
        jnp.zeros(t0.shape, dtype=jnp.float32),
    )
    _, best_t, best_prim, b0a, b1a = jax.lax.while_loop(cond, body, init)
    t_out[...] = best_t
    prim_out[...] = best_prim
    b0_out[...] = b0a
    b1_out[...] = b1a


# ---------------------------------------------------------------------------
# Stack-based ordered packet traversal (production kernel)
# ---------------------------------------------------------------------------
#
# The skip-link kernel above spends one while-loop iteration on every node
# it TESTS (hit or miss) and walks the tree in static DFS order.  The
# kernel below restructures traversal the classic ordered-BVH2 way,
# mapped onto the packet model:
#
#   - each interior node stores BOTH children's boxes, so a missed child
#     is never visited: iterations ~= nodes whose box the packet hits
#     (roughly half of the nodes tested by the skip walk);
#   - children are descended NEAR-FIRST (packet-min t_near), so best_t
#     shrinks as early as possible and far subtrees get culled;
#   - the deferred far child goes on a real stack held in SMEM scratch
#     (scalar memory — traversal state never touches the VPU).
#
# Table layout is native to the TPU's (8, 128) VMEM tiling — narrow rows
# pad their minor dim to 128 lanes, which blew the skip-link kernel's
# [M,8]/[T,16] tables up 8-16x (53MiB scoped-vmem OOM at 50k tris):
#
#   - triangles are packed LEAF-ALIGNED, 8 slots x 16 cols = one [128]
#     f32 row per leaf; empty slots hold degenerate (all-zero) triangles
#     that can never pass the det test;
#   - a node row is [16] f32: child boxes (12) + the two child refs
#     stored as exact f32 integers (|ref| < 2^24) at cols 12-13.
#
# Leaf references are encoded in the child slots as negative ints
# (-(row0*64 + count + 1), row0 = 8-aligned first slot / 8 — row indexing
# keeps |ref| exact in f32 up to 2M slots), so leaves occupy no node rows
# and the node table covers interior nodes only.

_DONE = np.int32(2**30)
_LEAF_COUNT_BITS = 6  # leaf count fits in 6 bits (leaf_size <= 63)
_LEAF_SLOTS = 8  # triangles per packed leaf row (8 x 16 cols = 128)
_STACK_DEPTH = 96


def _encode_children(skips, firsts, counts):
    """DFS skip-link arrays -> (interior remap, child refs, child boxes).

    For DFS node i (interior): left = i + 1, right = skip[i + 1].
    Returns arrays indexed by interior rank.
    """
    m = len(skips)
    is_interior = counts == 0
    rank = np.cumsum(is_interior) - 1  # DFS idx -> interior rank
    idx = np.nonzero(is_interior)[0]
    left = idx + 1
    right = skips[left]

    def ref(child):
        out = np.where(
            counts[child] > 0,
            -((firsts[child].astype(np.int64) >> 3) * (1 << _LEAF_COUNT_BITS)
              + counts[child] + 1),
            rank[child],
        )
        return out.astype(np.int32)

    return idx, ref(left), ref(right), left, right


def _ordered_kernel(
    nodes_f_ref,
    tris_ref,
    root_ref,
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmax_ref,
    t_out, prim_out,
    stack_ref,
    *, any_hit: bool,
):
    # NOTE: the walk carries ONLY (t, prim) — every additional (8,128)
    # register in the cond/while state was measured at ~150x whole-kernel
    # slowdown (per-iteration vreg spills); barycentrics are re-derived
    # outside the kernel (accel/bvh.py _bary_from_hit)
    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    t0 = tmax_ref[...]
    t0 = jnp.where(t0 <= RAY_EPS, _INERT_T, t0)  # see _INERT_T

    def safe_inv(v):
        sign = jnp.where(v < 0.0, -1.0, 1.0)
        return jnp.clip(sign / jnp.maximum(jnp.abs(v), 1e-20), -1e30, 1e30)

    inv_x = safe_inv(dx)
    inv_y = safe_inv(dy)
    inv_z = safe_inv(dz)
    # representative direction octant for ordered descent (rays are sorted
    # by octant before dispatch, so the packet is octant-uniform)
    octant = (
        (dx[0, 0] < 0).astype(jnp.int32) * 4
        + (dy[0, 0] < 0).astype(jnp.int32) * 2
        + (dz[0, 0] < 0).astype(jnp.int32)
    )

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
            row = tris_ref[first >> 3]  # [128]: 8 slots x 16 cols
            for k in range(_LEAF_SLOTS):
                pid = first + k
                c = 16 * k
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
                # found lanes stop accepting and pulling boxes; all-found
                # packets then drain the stack in cheap root-fail steps —
                # no per-iteration jnp.all() reduction
                best_t = jnp.where(best_prim >= 0, _INERT_T, best_t)
            # leaves always pop
            zero = jnp.int32(0)
            return (zero, zero, jnp.bool_(False), jnp.bool_(True),
                    best_t, best_prim)

        def interior_branch(carry):
            best_t, best_prim = carry
            node = jnp.maximum(ref, 0)
            nf = nodes_f_ref[node]
            tn_l, hit_l = slab(nf, 0, best_t)
            tn_r, hit_r = slab(nf, 6, best_t)
            # ONE cross-lane reduction for both children (packed counts:
            # left in the low 11 bits, right above — 1024-lane blocks)
            sred = jnp.sum(
                hit_l.astype(jnp.int32) + 2048 * hit_r.astype(jnp.int32)
            )
            any_l = (sred & 2047) > 0
            any_r = sred >= 2048
            # child refs stored as exact f32 integers (|ref| < 2^24)
            l_ref = nf[12].astype(jnp.int32)
            r_ref = nf[13].astype(jnp.int32)
            # near-first via the per-node octant mask (precomputed on host
            # from the children's centroid order; the packet is pre-sorted
            # by direction octant, so one representative octant suffices)
            left_first = ((nf[14].astype(jnp.int32) >> octant) & 1) == 1
            near = jnp.where(left_first, l_ref, r_ref)
            far = jnp.where(left_first, r_ref, l_ref)
            both = any_l & any_r
            nxt = jnp.where(
                both, near, jnp.where(any_l, l_ref, r_ref)
            )
            need_pop = jnp.logical_not(any_l | any_r)
            return (jnp.where(need_pop, 0, nxt).astype(jnp.int32),
                    far.astype(jnp.int32),
                    both, need_pop, best_t, best_prim)

        nxt, far, do_push, need_pop, best_t, best_prim = jax.lax.cond(
            is_leaf, leaf_branch, interior_branch,
            (best_t, best_prim),
        )

        @pl.when(do_push)
        def _():
            stack_ref[jnp.minimum(sp, _STACK_DEPTH - 1)] = far

        sp = sp + do_push.astype(jnp.int32)

        popped = stack_ref[jnp.maximum(sp - 1, 0)]
        empty = sp <= 0
        nxt = jnp.where(
            need_pop, jnp.where(empty, _DONE, popped), nxt
        )
        sp = jnp.where(need_pop & jnp.logical_not(empty), sp - 1, sp)
        return nxt, sp, best_t, best_prim

    def cond(state):
        return state[0] != _DONE

    init = (
        root_ref[0],
        jnp.int32(0),
        t0,
        jnp.full(t0.shape, -1, dtype=jnp.int32),
    )
    _, _, best_t, best_prim = jax.lax.while_loop(cond, body, init)
    t_out[...] = best_t
    prim_out[...] = best_prim


class PallasBVH2:
    """Ordered stack-traversal intersector (see _ordered_kernel).

    Same interface as :class:`PallasBVH`; node table covers interior
    nodes only, children's boxes stored at the parent.
    """

    def __init__(self, mins, maxs, skips, firsts, counts, tri_p0, tri_p1, tri_p2,
                 interpret: bool = False):
        counts = np.asarray(counts)
        skips = np.asarray(skips)
        firsts = np.asarray(firsts)
        t = len(tri_p0)
        assert counts.max(initial=0) <= _LEAF_SLOTS, "leaf_size must be <= 8"

        # --- leaf-aligned triangle packing: leaf l -> row l, 8 slots ------
        leaf_mask = counts > 0
        leaf_ids = np.cumsum(leaf_mask) - 1  # DFS idx -> leaf row
        n_leaves = max(int(leaf_mask.sum()), 1)
        tris = np.zeros((n_leaves, 128), dtype=np.float32)
        # slot -> original (permuted) prim index, for unpacking hit ids
        self.slot_to_prim = np.zeros((n_leaves * _LEAF_SLOTS,), dtype=np.int32)
        padded_firsts = np.zeros_like(firsts)
        for i in np.nonzero(leaf_mask)[0]:
            l = leaf_ids[i]
            f, cnt = int(firsts[i]), int(counts[i])
            padded_firsts[i] = l * _LEAF_SLOTS
            for k in range(cnt):
                c = 16 * k
                tris[l, c + 0: c + 3] = tri_p0[f + k]
                tris[l, c + 3: c + 6] = tri_p1[f + k]
                tris[l, c + 6: c + 9] = tri_p2[f + k]
                self.slot_to_prim[l * _LEAF_SLOTS + k] = f + k

        if counts[0] > 0:  # whole tree is one leaf
            self.root = np.int32(
                -((int(padded_firsts[0]) >> 3) * (1 << _LEAF_COUNT_BITS)
                  + int(counts[0]) + 1)
            )
            nodes_f = np.zeros((1, 16), dtype=np.float32)
        else:
            idx, l_ref, r_ref, left, right = _encode_children(
                skips, padded_firsts, counts
            )
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
            # per-octant near-first bits: along the axis where the children
            # separate most, left goes first iff the ray travels from left
            # centroid toward right centroid
            cl = 0.5 * (mins[left] + maxs[left])
            cr = 0.5 * (mins[right] + maxs[right])
            sep = np.abs(cr - cl)
            axis = np.argmax(sep, axis=1)
            l_lower = np.take_along_axis(cl, axis[:, None], 1)[:, 0] <= (
                np.take_along_axis(cr, axis[:, None], 1)[:, 0]
            )
            mask = np.zeros(ni, dtype=np.int32)
            for o in range(8):
                # octant bit set means d[axis] < 0 (ray travels toward -axis)
                neg = (np.array([o >> 2, o >> 1, o]) & 1).astype(bool)
                d_neg = neg[axis]
                left_first = l_lower != d_neg  # lower-side child first if d>=0
                mask |= left_first.astype(np.int32) << o
            nodes_f[:, 14] = mask.astype(np.float32)
            self.root = np.int32(0)
        self.n_tris = t
        self.nodes_f = jnp.asarray(nodes_f)
        self.tris = jnp.asarray(tris)
        self.slot_to_prim_j = jnp.asarray(self.slot_to_prim)
        self.root_arr = jnp.asarray([self.root], dtype=jnp.int32)
        self.interpret = interpret
        # true VMEM cost: rows pad their minor dim to the 128-lane tile
        self.vmem_bytes = nodes_f.shape[0] * 128 * 4 + tris.nbytes

    def traverse(self, o, d, t_max, any_hit=False, remap=True):
        """o, d: [N,3]; t_max: [N].  Returns (t, prim); barycentrics are
        derived by the caller from the winning triangle.

        ``remap=False`` returns raw 8-aligned leaf-slot ids (callers that
        fold ``slot_to_prim`` into their own prim permutation).
        ``o``/``d`` may also be 3-tuples of [N] component columns (sorted
        wavefronts come straight out of a lax.sort co-sort).
        """
        from pbrt_tpu.ops.stream_bvh import split_pad_rays

        n = (o[0] if isinstance(o, (tuple, list)) else o).shape[0]
        comps = split_pad_rays(o, d, t_max, n)
        total = comps[0].shape[0]
        g = total // BLOCK

        def comp(x):
            return x.reshape(g * BLOCK_SUB, BLOCK_LANE)

        ray_specs = [
            pl.BlockSpec(
                (BLOCK_SUB, BLOCK_LANE),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(7)
        ]
        table_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2)]
        root_spec = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        out_spec = pl.BlockSpec(
            (BLOCK_SUB, BLOCK_LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        shape = (g * BLOCK_SUB, BLOCK_LANE)
        kernel = functools.partial(_ordered_kernel, any_hit=any_hit)
        t_r, prim_r = pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=table_specs + root_spec + ray_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct(shape, jnp.int32),
            ),
            scratch_shapes=[pltpu.SMEM((_STACK_DEPTH,), jnp.int32)],
            interpret=self.interpret,
        )(
            self.nodes_f,
            self.tris,
            self.root_arr,
            *[comp(c) for c in comps],
        )
        flat = lambda x: x.reshape(-1)[:n]
        t_r, prim_r = flat(t_r), flat(prim_r)
        if remap:
            prim_r = jnp.where(
                prim_r >= 0,
                self.slot_to_prim_j[jnp.maximum(prim_r, 0)],
                prim_r,
            )
        return t_r, prim_r


class PallasBVH:
    """Packet-traversal intersector backed by the Pallas kernel.

    Usable when node + triangle tables fit VMEM (~<=100k tris).
    """

    def __init__(self, mins, maxs, skips, firsts, counts, tri_p0, tri_p1, tri_p2,
                 interpret: bool = False):
        m = len(mins)
        t = len(tri_p0)
        nodes_f = np.zeros((m, 8), dtype=np.float32)
        nodes_f[:, 0:3] = mins
        nodes_f[:, 3:6] = maxs
        nodes_i = np.zeros((m, 4), dtype=np.int32)
        nodes_i[:, 0] = skips
        nodes_i[:, 1] = firsts
        nodes_i[:, 2] = counts
        tris = np.zeros((t, 16), dtype=np.float32)
        tris[:, 0:3] = tri_p0
        tris[:, 3:6] = tri_p1
        tris[:, 6:9] = tri_p2
        self.n_nodes = m
        self.n_tris = t
        self.nodes_f = jnp.asarray(nodes_f)
        self.nodes_i = jnp.asarray(nodes_i)
        self.tris = jnp.asarray(tris)
        self.interpret = interpret
        self.vmem_bytes = nodes_f.nbytes + nodes_i.nbytes + tris.nbytes

    def traverse(self, o, d, t_max, any_hit=False):
        """o, d: [N,3]; t_max: [N].  Returns (t, prim, b0, b1)."""
        n = o.shape[0]
        pad = (-n) % BLOCK
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
            t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
        total = n + pad
        g = total // BLOCK

        def comp(x):
            return x.reshape(g * BLOCK_SUB, BLOCK_LANE)

        ray_specs = [
            pl.BlockSpec(
                (BLOCK_SUB, BLOCK_LANE),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(7)
        ]
        table_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)
        ]
        out_spec = pl.BlockSpec(
            (BLOCK_SUB, BLOCK_LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        shape = (g * BLOCK_SUB, BLOCK_LANE)
        kernel = functools.partial(
            _traverse_kernel, n_nodes=self.n_nodes, any_hit=any_hit
        )
        t_r, prim_r, b0_r, b1_r = pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=table_specs + ray_specs,
            out_specs=(out_spec, out_spec, out_spec, out_spec),
            out_shape=(
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct(shape, jnp.int32),
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct(shape, jnp.float32),
            ),
            interpret=self.interpret,
        )(
            self.nodes_f,
            self.nodes_i,
            self.tris,
            comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
            comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2]),
            comp(t_max),
        )
        flat = lambda x: x.reshape(-1)[:n]
        return flat(t_r), flat(prim_r), flat(b0_r), flat(b1_r)
