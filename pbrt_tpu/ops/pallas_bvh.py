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
LEAF_SIZE = 4


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
