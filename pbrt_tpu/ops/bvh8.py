"""Pallas TPU kernel: 8-wide (BVH8) ordered packet traversal.

Why (r4 roofline, RESULTS.md): the binary packet walk runs at ~25% of
its own vector-arithmetic bound because per-iteration *control* (~440 ns
of scalar/branch/extract work) dwarfs the [8,128] slab math.  Testing 8
child slabs per iteration buys ~3x fewer iterations for ~4x more vector
work — net ~2x, IF the per-iteration control cost stays flat.  The two
TPU obstacles named in r4 ("8 any()-reductions + 8 push-branches per
iteration") are solved here without adding branches:

* ONE packed two-stage reduction replaces 8 ``jnp.any``s: per-lane child
  hit bits at 4-bit field spacing -> sublane sum (fields <= 8, no carry)
  -> threshold each field to a single bit at 8-bit spacing -> two lane
  sums -> 2 scalar extracts.  (Field counts <= 128 fit 8 bits; the top
  field may set the sign bit, which two's-complement masking ignores.)
* BRANCHLESS pushes replace up to 7 ``pl.when``s: every child slot does
  an UNCONDITIONAL SMEM store at a computed address — hit children land
  at ``sp + h-1-rank`` (rank = number of strictly-nearer hit children,
  so the nearest ends on top of the stack), non-hit children write to a
  dedicated trash slot above the stack.  The shared epilogue then always
  pops, so the whole iteration has exactly ONE ``lax.cond``
  (leaf vs interior) — the same branch count as the binary kernel.

Near-ordering: children are sorted at build time ascending by centroid
along the node's max-spread axis (stored in the row); at run time the
rank is prefix-popcount for rays travelling +axis and suffix-popcount
for -axis — a scalar ``where``, not a branch.  Packets are pre-sorted by
direction octant (accel/bvh.py sort keys), so one representative lane's
sign bits serve the whole block, as in the binary kernel.

Node row layout ([64] f32 per wide node; minor dim pads to the 128-lane
VMEM tile):
  cols 6c..6c+5   child c box: minx miny minz maxx maxy maxz
  cols 48+c       child c ref as exact f32 int (|ref| < 2^24):
                  interior -> wide-node rank; leaf ->
                  -((first/8)*64+count+1) with ``first`` leaf-row aligned
                  (ops/pallas_bvh.py row-index encoding, exact in f32 to
                  2M slots); EMPTY slot -> -1 (first=0, count=0)
  col 56          sort axis (0/1/2)
Empty slots carry min = max = +inf boxes: every slab quotient on an axis
with positive inverse direction is +inf, so t_near = +inf can never pass
``t_near < best_t`` (and all-negative-direction rays get t_far = -inf).
This is the same invariant as the padded-cluster fix in
parallel/geomshard.py — inverted (-inf/+inf) bounds would hit always.

Replaces the reference's never-built "bvh" accelerator default
(/root/reference/src/core/api.rs:237) as the production walk; the binary
kernel (ops/pallas_bvh.py / ops/stream_bvh.py) remains the env-gated
fallback (``PBRT_TPU_WIDE=0``) with an equality test.
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
)

WIDTH = 8  # children per wide node
NODE_COLS = 64  # row layout above
_TRASH = _STACK_DEPTH  # non-hit children store here (slot above the stack)


# ---------------------------------------------------------------------------
# Host: collapse a binary skip-link tree into wide nodes
# ---------------------------------------------------------------------------


def collapse8(mins, maxs, skips, firsts, counts, padded_firsts):
    """Collapse a binary SAH tree into 8-wide nodes (greedy by area).

    Starting from each subtree root, repeatedly expands the largest-area
    binary interior slot into its two children until 8 slots are filled
    or all slots are binary leaves; interior slots left at cutoff become
    child wide nodes (recursively).  Children are sorted ascending by
    centroid along the max-spread axis.  ``padded_firsts`` are the
    leaf-row-aligned first slots from :func:`stream_bvh.pack_leaf_rows`.

    Returns wnodes [W, 64] f32 (layout in the module docstring).
    """
    mins = np.asarray(mins)
    maxs = np.asarray(maxs)
    skips = np.asarray(skips)
    counts = np.asarray(counts)
    interior = counts == 0
    ext = np.maximum(maxs - mins, 0.0)
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 0] * ext[:, 2]

    def leaf_ref(s):
        return -((int(padded_firsts[s]) >> 3) * (1 << _LEAF_COUNT_BITS)
                 + int(counts[s]) + 1)

    rows = []  # reserved, patched post-order

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(old_limit + 8 * len(skips) + 10000)
    try:
        def emit(i):
            rank = len(rows)
            rows.append(None)  # reserve DFS slot
            slots = [i]
            while len(slots) < WIDTH:
                k_best, a_best = -1, -1.0
                for k, s in enumerate(slots):
                    if interior[s] and area[s] > a_best:
                        k_best, a_best = k, float(area[s])
                if k_best < 0:
                    break
                s = slots.pop(k_best)
                slots.extend([s + 1, int(skips[s + 1])])
            cen = 0.5 * (mins[slots] + maxs[slots])
            ax = int(np.argmax(cen.max(axis=0) - cen.min(axis=0))) if len(slots) > 1 else 0
            order = np.argsort(cen[:, ax], kind="stable")
            slots = [slots[k] for k in order]
            row = np.zeros((NODE_COLS,), dtype=np.float32)
            row[0:48] = np.inf  # empty-slot boxes: min = max = +inf
            refs = np.full((WIDTH,), -1.0, dtype=np.float64)  # empty: -1
            for c, s in enumerate(slots):
                row[6 * c: 6 * c + 3] = mins[s]
                row[6 * c + 3: 6 * c + 6] = maxs[s]
                refs[c] = emit(s) if interior[s] else leaf_ref(s)
            assert np.abs(refs).max() < (1 << 24), "ref exceeds exact-f32 range"
            row[48:56] = refs.astype(np.float32)
            row[56] = float(ax)
            rows[rank] = row
            return rank

        emit(0)
    finally:
        sys.setrecursionlimit(old_limit)
    return np.stack(rows)


def pack_tree8(mins, maxs, skips, firsts, counts, p0, p1, p2, leaf_slots=16):
    """Binary skip-link (sub)tree -> BVH8 kernel tables.

    Returns (wnodes [W,64] f32, tris [rows,128] f32, root i32,
    slot_to_prim [n_leaves*leaf_slots] i64) — the wide analogue of
    ``stream_bvh._pack_tree``.
    """
    from pbrt_tpu.ops.stream_bvh import pack_leaf_rows

    counts = np.asarray(counts)
    tris, slot_to_prim, padded_firsts = pack_leaf_rows(
        firsts, counts, p0, p1, p2, leaf_slots
    )
    if counts[0] > 0:  # whole (sub)tree is a single leaf
        root = np.int32(
            -((int(padded_firsts[0]) >> 3) * (1 << _LEAF_COUNT_BITS)
              + int(counts[0]) + 1)
        )
        return np.zeros((1, NODE_COLS), dtype=np.float32), tris, root, slot_to_prim
    wnodes = collapse8(mins, maxs, skips, firsts, counts, padded_firsts)
    return wnodes, tris, np.int32(0), slot_to_prim


# ---------------------------------------------------------------------------
# Device: the wide ordered walk (shared by whole-tree + streaming kernels)
# ---------------------------------------------------------------------------


def _walk8(node_row, tri_row, root, rays, invs, signs, best, stack_ref,
           any_hit, prim_base, leaf_slots=16):
    """Ordered 8-wide stack traversal of one packed wide tree.

    ``node_row(i) -> [64]`` and ``tri_row(r) -> [128]`` read uniform
    rows; ``signs = (sx, sy, sz)`` are scalar 0/1 direction-negative
    bits of the packet's representative lane; ``best = (best_t,
    best_prim)`` is folded into and returned.  The walk carries ONLY
    (t, prim) through the while state (the r3 loop-carry cliff), and
    ``stack_ref`` must have ``_STACK_DEPTH + 1`` slots — the last is the
    trash slot for the branchless non-hit stores.
    """
    ox, oy, oz, dx, dy, dz = rays
    inv_x, inv_y, inv_z = invs
    sx, sy, sz = signs

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
                # found lanes stop accepting and pulling boxes; all-found
                # packets then drain the stack in cheap slab-fail steps
                best_t = jnp.where(best_prim >= 0, _INERT_T, best_t)
            zero = jnp.int32(0)
            trash = jnp.int32(_TRASH)
            return ((trash,) * WIDTH + (zero,) * WIDTH
                    + (zero, best_t, best_prim))

        def interior_branch(carry):
            best_t, best_prim = carry
            nf = node_row(jnp.maximum(ref, 0))
            # --- 8 slab tests -> per-lane hit bits at 4-bit spacing ------
            bits = None
            for c in range(WIDTH):
                b = 6 * c
                t_lo_x = (nf[b + 0] - ox) * inv_x
                t_hi_x = (nf[b + 3] - ox) * inv_x
                t_lo_y = (nf[b + 1] - oy) * inv_y
                t_hi_y = (nf[b + 4] - oy) * inv_y
                t_lo_z = (nf[b + 2] - oz) * inv_z
                t_hi_z = (nf[b + 5] - oz) * inv_z
                t_near = jnp.maximum(
                    jnp.maximum(
                        jnp.minimum(t_lo_x, t_hi_x), jnp.minimum(t_lo_y, t_hi_y)
                    ),
                    jnp.minimum(t_lo_z, t_hi_z),
                )
                t_far = jnp.minimum(
                    jnp.minimum(
                        jnp.maximum(t_lo_x, t_hi_x), jnp.maximum(t_lo_y, t_hi_y)
                    ),
                    jnp.maximum(t_lo_z, t_hi_z),
                )
                hit = (t_near <= t_far) & (t_far > RAY_EPS) & (t_near < best_t)
                h = hit.astype(jnp.int32) << (4 * c)
                bits = h if bits is None else bits + h
            # --- one packed two-stage any-reduction ----------------------
            s0 = jnp.sum(bits, axis=0, keepdims=True)  # [1,128], fields <= 8
            lo = None
            hi = None
            for c in range(4):
                bl = ((s0 >> (4 * c)) & 15) > 0
                bh = ((s0 >> (4 * (c + 4))) & 15) > 0
                l = bl.astype(jnp.int32) << (8 * c)
                h = bh.astype(jnp.int32) << (8 * c)
                lo = l if lo is None else lo + l
                hi = h if hi is None else hi + h
            mlo = jnp.sum(lo)  # fields <= 128; top field may set the sign
            mhi = jnp.sum(hi)  # bit — two's-complement masking is exact
            bit = []
            for c in range(4):
                bit.append(((mlo >> (8 * c)) & 255) > 0)
            for c in range(4):
                bit.append(((mhi >> (8 * c)) & 255) > 0)
            bit = [b.astype(jnp.int32) for b in bit]
            # --- branchless ordered push addresses -----------------------
            ax = nf[56].astype(jnp.int32)
            rev = jnp.where(ax == 0, sx, jnp.where(ax == 1, sy, sz))
            pre = []  # hit children strictly before slot c
            acc = jnp.int32(0)
            for c in range(WIDTH):
                pre.append(acc)
                acc = acc + bit[c]
            h_cnt = acc
            addrs = []
            vals = []
            for c in range(WIDTH):
                suf = h_cnt - pre[c] - bit[c]
                rank = jnp.where(rev == 0, pre[c], suf)  # nearer-count
                addr = jnp.minimum(sp + h_cnt - 1 - rank, _STACK_DEPTH - 1)
                addrs.append(jnp.where(bit[c] > 0, addr, _TRASH))
                vals.append(nf[48 + c].astype(jnp.int32))
            return tuple(addrs) + tuple(vals) + (h_cnt, best_t, best_prim)

        out = jax.lax.cond(is_leaf, leaf_branch, interior_branch,
                           (best_t, best_prim))
        addrs = out[0:WIDTH]
        vals = out[WIDTH: 2 * WIDTH]
        h_cnt = out[2 * WIDTH]
        best_t = out[2 * WIDTH + 1]
        best_prim = out[2 * WIDTH + 2]
        # unconditional stores: non-hit children (and all leaf-iteration
        # slots) carry the trash address — no per-child branch
        for c in range(WIDTH):
            stack_ref[addrs[c]] = vals[c]
        sp = sp + h_cnt
        empty = sp <= 0
        nxt = jnp.where(empty, _DONE, stack_ref[jnp.maximum(sp - 1, 0)])
        sp = jnp.maximum(sp - 1, 0)
        return nxt, sp, best_t, best_prim

    def cond(state):
        return state[0] != _DONE

    init = (root, jnp.int32(0)) + tuple(best)
    out = jax.lax.while_loop(cond, body, init)
    return out[2], out[3]


# ---------------------------------------------------------------------------
# Whole-tree kernel + class (VMEM-resident scenes; mirrors PallasBVH2)
# ---------------------------------------------------------------------------


def _wide_kernel(
    nodes_ref,
    tris_ref,
    root_ref,
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmax_ref,
    t_out, prim_out,
    stack_ref,
    *, any_hit: bool, leaf_slots: int,
):
    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    t0 = tmax_ref[...]
    # dead lanes go fully inert (see pallas_bvh._INERT_T): best_t = 0
    # still passed the slab test for origin-containing boxes
    t0 = jnp.where(t0 <= RAY_EPS, _INERT_T, t0)

    def safe_inv(v):
        sign = jnp.where(v < 0.0, -1.0, 1.0)
        return jnp.clip(sign / jnp.maximum(jnp.abs(v), 1e-20), -1e30, 1e30)

    invs = (safe_inv(dx), safe_inv(dy), safe_inv(dz))
    # packets are pre-sorted by direction octant: representative sign bits
    signs = (
        (dx[0, 0] < 0).astype(jnp.int32),
        (dy[0, 0] < 0).astype(jnp.int32),
        (dz[0, 0] < 0).astype(jnp.int32),
    )
    best = (t0, jnp.full(t0.shape, -1, dtype=jnp.int32))
    best_t, best_prim = _walk8(
        lambda i: nodes_ref[i],
        lambda r: tris_ref[r],
        root_ref[0], (ox, oy, oz, dx, dy, dz), invs, signs, best,
        stack_ref, any_hit, jnp.int32(0), leaf_slots,
    )
    t_out[...] = best_t
    prim_out[...] = best_prim


class PallasBVH8:
    """Wide-node ordered-traversal intersector (see module docstring).

    Same interface as :class:`pallas_bvh.PallasBVH2`; built from the
    same binary SAH arrays, collapsed to 8-wide at pack time.
    """

    def __init__(self, mins, maxs, skips, firsts, counts, tri_p0, tri_p1, tri_p2,
                 interpret: bool = False, leaf_slots: int = 16):
        self.leaf_slots = int(leaf_slots)
        wnodes, tris, root, slot_to_prim = pack_tree8(
            mins, maxs, skips, firsts, counts,
            np.asarray(tri_p0), np.asarray(tri_p1), np.asarray(tri_p2),
            leaf_slots=self.leaf_slots,
        )
        self.n_tris = len(tri_p0)
        self.nodes_f = jnp.asarray(wnodes)
        self.tris = jnp.asarray(tris)
        self.slot_to_prim = slot_to_prim.astype(np.int64)
        self.slot_to_prim_j = jnp.asarray(slot_to_prim.astype(np.int32))
        self.root_arr = jnp.asarray([root], dtype=jnp.int32)
        self.interpret = interpret
        # rows pad their minor dim to the 128-lane tile
        self.vmem_bytes = wnodes.shape[0] * 128 * 4 + tris.nbytes

    def traverse(self, o, d, t_max, any_hit=False, remap=True):
        """o, d: [N,3] (or 3-tuples of [N] columns); t_max: [N].

        Returns (t, prim); barycentrics are derived by the caller from
        the winning triangle (loop-carry cliff, see _walk8).
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
        kernel = functools.partial(
            _wide_kernel, any_hit=any_hit, leaf_slots=self.leaf_slots
        )
        t_r, prim_r = pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=table_specs + root_spec + ray_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(
                jax.ShapeDtypeStruct(shape, jnp.float32),
                jax.ShapeDtypeStruct(shape, jnp.int32),
            ),
            scratch_shapes=[pltpu.SMEM((_STACK_DEPTH + 1,), jnp.int32)],
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
