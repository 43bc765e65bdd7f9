"""Geometry-sharded rendering: triangles distributed across the mesh.

BASELINE config 5: scenes too big (or too compute-heavy) to replicate are
sharded over a **tp** mesh axis — each device holds a contiguous slice of
the triangle tables.  A 2D (dp, tp) mesh then gives:

  * rays sharded over dp, replicated over tp;
  * triangles sharded over tp, replicated over dp;
  * closest-hit = local sweep over the device's slice, then a ``pmin``
    all-reduce of hit distance over tp and masked-``psum`` broadcast of
    the winning primitive's attributes (p0/p1/p2/uv/n/mat/light).

This is the all-reduce formulation of "ray re-routing": every collective
is a dense XLA reduction over ICI (no per-ray routing tables), which
scales compute perfectly at the cost of O(rays) reduction bandwidth per
bounce — but rays stay replicated over tp.

The **ring formulation** (:func:`ring_closest_hit`,
:func:`make_ring_path_fn`) shards the rays over tp as well: each device
owns rays/tp lanes, and the ray packet (origins, directions, running
best-hit record) rotates around the ICI ring via ``ppermute``, visiting
every geometry slice exactly once.  Same images (identical lexicographic
(t, gid) tie-breaks), tp x fewer lanes per device, and neighbor-only
point-to-point traffic instead of all-reduces — the SURVEY §2.2 "ring
collective" pattern (the ray-tracing analogue of ring attention).

Determinism: ties in the pmin are broken toward the lowest primitive id,
so results are invariant to the shard count.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from pbrt_tpu import float_t
from pbrt_tpu.ops.intersect import RAY_EPS

INF_T = 1e8


def shard_triangle_arrays(tri_data, tri_mat, tri_light, n_shards: int,
                          bvh: bool = False, pallas: bool = False):
    """Pad + split triangle SoA into [n_shards, T/n_shards, ...] arrays.

    ``bvh=True`` additionally builds a **per-shard BVH** (native binned
    SAH, accel/bvh.py) and reorders each shard's triangles into its BVH's
    DFS-leaf order, adding node arrays ``bvh_min/bvh_max [S, M, 3]``,
    ``bvh_skip/bvh_first/bvh_count [S, M]`` and node counts ``nn [S]`` —
    the production formulation for BASELINE config 5 (1M-triangle scenes
    sharded over tp), replacing the O(rays x tris) brute sweep.

    ``pallas=True`` (implies ``bvh``) additionally packs each shard's tree
    into the streaming Pallas kernel layout (ops/stream_bvh.py
    ``pack_stream_tables``), stacked over the shard dim: ``pk_nodes
    [S,C,NP,16]``, ``pk_tris [S,C,LP,128]``, ``pk_roots [S,C]``,
    ``pk_clmin/pk_clmax [S,C,3]``, ``pk_s2p [S,C*LP*8]``, plus a
    ``leaf_tag [S,16]`` shape-marker carrying the static leaf width.
    On accelerator backends ``local_closest_hit`` then traverses each
    shard with the production streaming kernel inside ``shard_map`` (the
    r3 XLA while_loop walk measured ~0.01 Mray/s on TPU; the kernel is
    the only viable multi-chip path) — the XLA walk remains the CPU/test
    formulation.
    """
    if pallas:
        bvh = True
    t = tri_data.count
    per = -(-t // n_shards)
    total = per * n_shards

    if tri_data.n0 is None:
        # densify missing shading normals with geometric normals
        from pbrt_tpu.shapes import concat_triangle_data

        tri_data = concat_triangle_data([tri_data])

    def pad(a, fill=0.0):
        a = np.asarray(a)
        if len(a) < total:
            padding = np.full((total - len(a),) + a.shape[1:], fill, dtype=a.dtype)
            a = np.concatenate([a, padding])
        return a.reshape(n_shards, per, *a.shape[1:])

    out = {
        "p0": pad(tri_data.p0.astype(float_t)),
        "p1": pad(tri_data.p1.astype(float_t)),
        "p2": pad(tri_data.p2.astype(float_t)),
        "uv0": pad(tri_data.uv0.astype(float_t)),
        "uv1": pad(tri_data.uv1.astype(float_t)),
        "uv2": pad(tri_data.uv2.astype(float_t)),
        "n0": pad(tri_data.n0.astype(float_t)),
        "n1": pad(tri_data.n1.astype(float_t)),
        "n2": pad(tri_data.n2.astype(float_t)),
        "mat": pad(np.asarray(tri_mat, dtype=np.int32), fill=-1),
        "light": pad(np.asarray(tri_light, dtype=np.int32), fill=-1),
        "valid": pad(np.ones(t, dtype=bool), fill=False),
        "gid": pad(np.arange(t, dtype=np.int32), fill=2**30),
    }
    if not bvh:
        return out

    from pbrt_tpu.accel.bvh import build_bvh

    per_prim_keys = [k for k in out if k not in ()]
    # the stream kernel packs 16-triangle leaves (2 x 128-lane rows);
    # leaf width must match between the packed tables and the XLA-walk
    # unroll, so the tree itself is built at the chosen width
    leaf = 16 if pallas else _SHARD_LEAF
    mins_l, maxs_l, skips_l, firsts_l, counts_l, nns = [], [], [], [], [], []
    for s in range(n_shards):
        v = int(out["valid"][s].sum())
        if v == 0:
            mins_l.append(np.zeros((1, 3), np.float32))
            maxs_l.append(np.full((1, 3), -1.0, np.float32))
            skips_l.append(np.ones(1, np.int32))
            firsts_l.append(np.zeros(1, np.int32))
            counts_l.append(np.zeros(1, np.int32))
            nns.append(0)
            continue
        mins, maxs, skips, firsts, counts, perm = build_bvh(
            out["p0"][s][:v], out["p1"][s][:v], out["p2"][s][:v], leaf
        )
        order = np.concatenate([perm, np.arange(v, per)])
        for k in per_prim_keys:
            out[k][s] = out[k][s][order]
        mins_l.append(mins)
        maxs_l.append(maxs)
        skips_l.append(skips)
        firsts_l.append(firsts)
        counts_l.append(counts)
        nns.append(len(mins))

    m_pad = max(8, max(len(m) for m in mins_l))

    def pad_nodes(arrs, fill, dtype):
        res = np.full((n_shards, m_pad) + arrs[0].shape[1:], fill, dtype=dtype)
        for s, a in enumerate(arrs):
            res[s, : len(a)] = a
        return res

    out["bvh_min"] = pad_nodes(mins_l, np.inf, np.float32)
    out["bvh_max"] = pad_nodes(maxs_l, -np.inf, np.float32)
    out["bvh_skip"] = pad_nodes(skips_l, m_pad, np.int32)
    out["bvh_first"] = pad_nodes(firsts_l, 0, np.int32)
    out["bvh_count"] = pad_nodes(counts_l, 0, np.int32)
    out["nn"] = np.asarray(nns, dtype=np.int32)
    if not pallas:
        return out

    # -- per-shard streaming-kernel tables, stacked over the shard dim ----
    from pbrt_tpu.ops.stream_bvh import pack_stream_tables

    packs = []
    for s in range(n_shards):
        v = int(out["valid"][s].sum())
        if v == 0 or nns[s] == 0:
            packs.append(None)
            continue
        packs.append(
            pack_stream_tables(
                mins_l[s], maxs_l[s], skips_l[s], firsts_l[s], counts_l[s],
                out["p0"][s][:v].astype(np.float32),
                out["p1"][s][:v].astype(np.float32),
                out["p2"][s][:v].astype(np.float32),
                leaf_slots=leaf,
                # BVH8 wide tables by default (stream_traverse infers the
                # walk from the node-row width); PBRT_TPU_WIDE=0 falls
                # back to the binary walk
                wide=os.environ.get("PBRT_TPU_WIDE", "1") not in ("", "0"),
            )
        )
    c_pad = max(1, max((p["nodes"].shape[0] for p in packs if p), default=1))
    np_pad = max(8, max((p["nodes"].shape[1] for p in packs if p), default=8))
    lp_pad = max(8, max((p["tris"].shape[1] for p in packs if p), default=8))
    spc = lp_pad * 8  # slots per cluster at the padded row count
    node_cols = next(
        (p["nodes"].shape[2] for p in packs if p), 16
    )  # 16 binary / 64 wide (BVH8)
    pk_nodes = np.zeros((n_shards, c_pad, np_pad, node_cols), np.float32)
    pk_tris = np.zeros((n_shards, c_pad, lp_pad, 128), np.float32)
    # padded roots are empty-leaf codes (-(0*64 + 0 + 1) = -1, count 0):
    # even if a padded cluster were ever selected, its walk is a no-op
    # single leaf test instead of a traversal of zero-filled node rows
    pk_roots = np.full((n_shards, c_pad), -1, np.int32)
    # padded clusters get cl_min = cl_max = +inf: every slab quotient on
    # an axis with positive inv-direction is +inf, so t_near = +inf fails
    # t_near < t_max and the candidate phase skips them on every block.
    # (Inverted bounds -inf/+inf would do the OPPOSITE: the min/max slab
    # test yields t_near = -inf / t_far = +inf, i.e. every ray "hits" —
    # the r4 bug flagged by ADVICE.md which could walk a zero-filled
    # padded cluster forever.)
    pk_clmin = np.full((n_shards, c_pad, 3), np.inf, np.float32)
    pk_clmax = np.full((n_shards, c_pad, 3), np.inf, np.float32)
    pk_s2p = np.zeros((n_shards, c_pad, spc), np.int32)
    for s, p in enumerate(packs):
        if p is None:
            continue
        c_s, np_s = p["nodes"].shape[0], p["nodes"].shape[1]
        lp_s = p["tris"].shape[1]
        pk_nodes[s, :c_s, :np_s] = p["nodes"]
        pk_tris[s, :c_s, :lp_s] = p["tris"]
        pk_roots[s, :c_s] = p["roots"]
        pk_clmin[s, :c_s] = p["cl_min"]
        pk_clmax[s, :c_s] = p["cl_max"]
        # re-lay slot ids onto the padded slots-per-cluster stride
        old_spc = p["slots_per_cluster"]
        pk_s2p[s, :c_s, :old_spc] = p["slot_to_prim"].reshape(
            c_s, old_spc
        ).astype(np.int32)
    out["pk_nodes"] = pk_nodes
    out["pk_tris"] = pk_tris
    out["pk_roots"] = pk_roots
    out["pk_clmin"] = pk_clmin
    out["pk_clmax"] = pk_clmax
    out["pk_s2p"] = pk_s2p.reshape(n_shards, c_pad * spc)
    # static leaf width rides as an array SHAPE (shard dicts cross the
    # shard_map boundary as pytrees of arrays, so a plain int can't)
    out["leaf_tag"] = np.zeros((n_shards, leaf), np.float32)
    # packed winner-attribute rows: TPU gathers cost ~30 ns per ROW nearly
    # independent of width (RESULTS r4), so the hit-attribute lookup is
    # ONE [N,27] row gather instead of ~12 separate array gathers.
    # Layout: p0 p1 p2 | n0 n1 n2 | uv0 uv1 uv2 | mat light gid
    # gid/mat/light ride as f32: integers are exact only below 2^24, so
    # guard the scene scale where the packing would silently corrupt ids
    # (the 2^30 PAD gid is exactly representable and stays allowed)
    assert t < (1 << 24), (
        "attr_rows packs gids as f32; scenes over 2^24 prims need an "
        "int32 side column"
    )
    out["attr_rows"] = np.concatenate([
        out["p0"], out["p1"], out["p2"],
        out["n0"], out["n1"], out["n2"],
        out["uv0"], out["uv1"], out["uv2"],
        out["mat"][..., None].astype(np.float32),
        out["light"][..., None].astype(np.float32),
        # gid pads with 2^30 (exactly representable in f32)
        out["gid"][..., None].astype(np.float32),
    ], axis=-1).astype(np.float32)
    return out


# leaf size used by the per-shard BVHs (static: unrolls the leaf tests)
_SHARD_LEAF = 4


def _local_bvh_hit(shard, o, d, t_max):
    """Skip-link BVH closest hit over this device's slice (XLA while_loop).

    Lexicographic (t, gid) tie-break inside the walk, so the winner is
    invariant to which shard (and hence which traversal order) tests a
    triangle — required for shard-count-invariant images.
    Returns (t [N], local_idx [N], b0, b1) like :func:`local_closest_hit`.
    """
    nmin, nmax = shard["bvh_min"], shard["bvh_max"]
    skip, first, count = shard["bvh_skip"], shard["bvh_first"], shard["bvh_count"]
    nn = shard["nn"][0]
    # static leaf-test unroll width: matches the width the shard's tree
    # was built with (16 when packed Pallas tables ride along, else 4)
    leaf_w = (
        shard["leaf_tag"].shape[-1] if "leaf_tag" in shard else _SHARD_LEAF
    )
    p0s, p1s, p2s = shard["p0"], shard["p1"], shard["p2"]
    gids = shard["gid"]
    valids = shard["valid"]
    n = o.shape[0]
    m = nmin.shape[0]
    t_tot = p0s.shape[0]

    def safe_inv(v):
        sign = jnp.where(v < 0.0, -1.0, 1.0)
        return jnp.clip(sign / jnp.maximum(jnp.abs(v), 1e-20), -1e30, 1e30)

    inv = safe_inv(d)

    def cond(st):
        return jnp.any(st[0] < nn)

    def body(st):
        node, bt, bi, bg, b0c, b1c = st
        active = node < nn
        ni = jnp.minimum(node, m - 1)
        t0 = (nmin[ni] - o) * inv
        t1 = (nmax[ni] - o) * inv
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = active & (tn <= tf) & (tf > RAY_EPS) & (tn < bt)
        cnt = count[ni]
        is_leaf = cnt > 0
        fst = first[ni]
        for k in range(leaf_w):
            pid = jnp.minimum(fst + k, t_tot - 1)
            ok0 = box_hit & is_leaf & (k < cnt) & valids[pid]
            p0, p1, p2 = p0s[pid], p1s[pid], p2s[pid]
            e1 = p1 - p0
            e2 = p2 - p0
            pv = jnp.cross(d, e2)
            det = jnp.sum(e1 * pv, axis=-1)
            inv_det = jnp.where(
                jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
            )
            tv = o - p0
            b0 = jnp.sum(tv * pv, axis=-1) * inv_det
            qv = jnp.cross(tv, e1)
            b1 = jnp.sum(d * qv, axis=-1) * inv_det
            tt = jnp.sum(e2 * qv, axis=-1) * inv_det
            g = gids[pid]
            better = (tt < bt) | ((tt == bt) & (g < bg))
            ok = (
                ok0
                & (jnp.abs(det) > 1e-12)
                & (b0 >= 0.0)
                & (b1 >= 0.0)
                & (b0 + b1 <= 1.0)
                & (tt > RAY_EPS)
                & better
            )
            bi = jnp.where(ok, pid, bi)
            bg = jnp.where(ok, g, bg)
            b0c = jnp.where(ok, b0, b0c)
            b1c = jnp.where(ok, b1, b1c)
            bt = jnp.where(ok, tt, bt)
        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, ni + 1, skip[ni])
        nxt = jnp.where(active, nxt, nn)
        return nxt, bt, bi, bg, b0c, b1c

    init = (
        jnp.zeros((n,), jnp.int32),
        jnp.broadcast_to(t_max, (n,)).astype(o.dtype),
        jnp.full((n,), -1, jnp.int32),
        jnp.full((n,), 2**30, jnp.int32),
        jnp.zeros((n,), o.dtype),
        jnp.zeros((n,), o.dtype),
    )
    _, bt, bi, _, b0c, b1c = jax.lax.while_loop(cond, body, init)
    return bt, bi, b0c, b1c


def _local_stream_hit(shard, o, d, t_max, interpret=False, bary=False):
    """Per-shard closest hit through the production streaming Pallas
    kernel (ops/stream_bvh.py) — runs INSIDE ``shard_map``, so each device
    walks only its own cluster tables.

    The kernel carries only (t, slot).  ``bary=True`` re-derives
    barycentrics here by projecting the hit point onto the dual basis of
    the winning triangle's edges (tests); production callers leave it
    False — the winner's b0/b1 are derived AFTER the tp-reduction from
    the broadcast attribute rows (interaction_from_reduced), saving three
    [N,3] row gathers per local hit.
    Returns (t, local_idx, b0, b1) like :func:`local_closest_hit`
    (b0/b1 = None when ``bary=False``).
    """
    from pbrt_tpu.ops.stream_bvh import stream_traverse

    n = o.shape[0]
    tmax = jnp.broadcast_to(t_max, (n,)).astype(o.dtype)
    t, slot = stream_traverse(
        shard["pk_nodes"], shard["pk_tris"], shard["pk_roots"],
        shard["pk_clmin"], shard["pk_clmax"], o, d, tmax,
        any_hit=False, leaf_slots=shard["leaf_tag"].shape[-1],
        interpret=interpret,
    )
    idx = jnp.where(slot >= 0, shard["pk_s2p"][jnp.maximum(slot, 0)], -1)
    hitm = idx >= 0
    t_out = jnp.where(hitm, t, tmax)
    if not bary:
        return t_out, idx.astype(jnp.int32), None, None
    safe = jnp.maximum(idx, 0)
    p0, p1, p2 = shard["p0"][safe], shard["p1"][safe], shard["p2"][safe]
    p = o + d * t[..., None]
    e1, e2, vp = p1 - p0, p2 - p0, p - p0
    d11 = jnp.sum(e1 * e1, -1)
    d12 = jnp.sum(e1 * e2, -1)
    d22 = jnp.sum(e2 * e2, -1)
    den = d11 * d22 - d12 * d12
    inv_den = jnp.where(
        jnp.abs(den) > 1e-20, 1.0 / jnp.where(den == 0.0, 1.0, den), 0.0
    )
    v1 = jnp.sum(vp * e1, -1)
    v2 = jnp.sum(vp * e2, -1)
    b0 = (d22 * v1 - d12 * v2) * inv_den
    b1 = (d11 * v2 - d12 * v1) * inv_den
    return (
        t_out,
        idx.astype(jnp.int32),
        jnp.where(hitm, b0, 0.0),
        jnp.where(hitm, b1, 0.0),
    )


def local_closest_hit(shard, o, d, t_max, chunk=256):
    """Closest hit of rays [N] against this device's triangle slice.

    Returns (t [N], local_idx [N], b0, b1); t = t_max when missed.
    Dispatch (trace-time): streaming Pallas kernel when the shard carries
    packed cluster tables (``pallas=True``) and the backend is an
    accelerator; otherwise the per-shard XLA BVH walk (``bvh=True``) —
    the CPU/test formulation; else the brute sweep (reference
    formulation).
    """
    if "pk_nodes" in shard and jax.default_backend() not in ("cpu",):
        return _local_stream_hit(shard, o, d, t_max)
    if "bvh_skip" in shard:
        return _local_bvh_hit(shard, o, d, t_max)
    p0s, p1s, p2s = shard["p0"], shard["p1"], shard["p2"]
    t_total = p0s.shape[0]
    chunk = min(chunk, t_total)
    n_chunks = -(-t_total // chunk)
    pad = n_chunks * chunk - t_total

    def pad_c(a):
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        return a.reshape(n_chunks, chunk, *a.shape[1:])

    p0c, p1c, p2c = pad_c(p0s), pad_c(p1s), pad_c(p2s)
    validc = pad_c(shard["valid"].astype(jnp.int32)) > 0

    def body(carry, xs):
        bt, bi, b0c, b1c = carry
        (p0, p1, p2, valid), ci = xs
        e1 = p1 - p0
        e2 = p2 - p0
        pvec = jnp.cross(d[:, None, :], e2[None])
        det = jnp.sum(e1[None] * pvec, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        tvec = o[:, None, :] - p0[None]
        b0 = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1[None])
        b1 = jnp.sum(d[:, None, :] * qvec, axis=-1) * inv_det
        tt = jnp.sum(e2[None] * qvec, axis=-1) * inv_det
        ok = (
            (jnp.abs(det) > 1e-12)
            & (b0 >= 0)
            & (b1 >= 0)
            & (b0 + b1 <= 1)
            & (tt > RAY_EPS)
            & (tt < bt[:, None])
            & valid[None]
        )
        tt = jnp.where(ok, tt, jnp.inf)
        best = jnp.argmin(tt, axis=-1)
        rows = jnp.arange(tt.shape[0])
        t_best = tt[rows, best]
        better = t_best < bt
        bt = jnp.where(better, t_best, bt)
        bi = jnp.where(better, ci * chunk + best, bi)
        b0c = jnp.where(better, b0[rows, best], b0c)
        b1c = jnp.where(better, b1[rows, best], b1c)
        return (bt, bi, b0c, b1c), None

    n = o.shape[0]
    init = (
        jnp.broadcast_to(t_max, (n,)).astype(o.dtype),
        jnp.full((n,), -1, dtype=jnp.int32),
        jnp.zeros((n,), o.dtype),
        jnp.zeros((n,), o.dtype),
    )
    (bt, bi, b0c, b1c), _ = jax.lax.scan(
        body, init, ((p0c, p1c, p2c, validc), jnp.arange(n_chunks, dtype=jnp.int32))
    )
    return bt, bi, b0c, b1c


def allreduce_closest(shard, t_local, idx_local, b0, b1, axis="tp"):
    """Combine per-shard closest hits into the global closest + attributes.

    Tie-break: minimum (t, global_id) lexicographically via pmin on a
    fused key, making the result shard-count invariant.

    When the shard carries packed ``attr_rows`` (pallas tables) the hit
    attributes come from ONE [N,27] row gather + one psum, replacing ~12
    separate array gathers (TPU gathers cost per ROW, ~flat in width);
    b0/b1 may then be None — barycentrics are derived downstream from the
    broadcast winner rows (interaction_from_reduced).
    """
    safe = jnp.maximum(idx_local, 0)
    rows = None
    if "attr_rows" in shard:
        rows = shard["attr_rows"][safe]
        gid = jnp.where(
            idx_local >= 0, jnp.round(rows[:, 26]).astype(jnp.int32),
            jnp.int32(2**30),
        )
    else:
        gid = jnp.where(idx_local >= 0, shard["gid"][safe], jnp.int32(2**30))
    t_global = jax.lax.pmin(t_local, axis)
    # winner: my t equals the global min AND my gid is the min among ties
    is_tie = t_local <= t_global + 0.0
    gid_key = jnp.where(is_tie, gid, jnp.int32(2**30))
    gid_min = jax.lax.pmin(gid_key, axis)
    winner = is_tie & (gid == gid_min) & (idx_local >= 0)
    hit = gid_min < 2**30

    def bcast(x, fill=0.0):
        return jax.lax.psum(jnp.where(winner[..., None] if x.ndim > 1 else winner, x, fill), axis)

    if rows is not None:
        w = bcast(rows)  # one [N,27] collective broadcast of the winner
        out = {
            "t": t_global,
            "hit": hit,
            "prim": jax.lax.psum(jnp.where(winner, gid, 0), axis),
            "b0": None if b0 is None else jax.lax.psum(
                jnp.where(winner, b0, 0.0), axis),
            "b1": None if b1 is None else jax.lax.psum(
                jnp.where(winner, b1, 0.0), axis),
            "p0": w[:, 0:3], "p1": w[:, 3:6], "p2": w[:, 6:9],
            "n0": w[:, 9:12], "n1": w[:, 12:15], "n2": w[:, 15:18],
            "uv0": w[:, 18:20], "uv1": w[:, 20:22], "uv2": w[:, 22:24],
            "mat": jnp.round(w[:, 24]).astype(jnp.int32)
            + jnp.where(hit, 0, -1),
            "light": jnp.round(w[:, 25]).astype(jnp.int32)
            + jnp.where(hit, 0, -1),
        }
        return out
    out = {
        "t": t_global,
        "hit": hit,
        "prim": jax.lax.psum(jnp.where(winner, gid, 0), axis),
        "b0": jax.lax.psum(jnp.where(winner, b0, 0.0), axis),
        "b1": jax.lax.psum(jnp.where(winner, b1, 0.0), axis),
        "p0": bcast(shard["p0"][safe]),
        "p1": bcast(shard["p1"][safe]),
        "p2": bcast(shard["p2"][safe]),
        "uv0": bcast(shard["uv0"][safe]),
        "uv1": bcast(shard["uv1"][safe]),
        "uv2": bcast(shard["uv2"][safe]),
        "n0": bcast(shard["n0"][safe]),
        "n1": bcast(shard["n1"][safe]),
        "n2": bcast(shard["n2"][safe]),
        "mat": jax.lax.psum(jnp.where(winner, shard["mat"][safe], 0), axis)
        + jnp.where(gid_min < 2**30, 0, -1),
        "light": jax.lax.psum(jnp.where(winner, shard["light"][safe], 0), axis)
        + jnp.where(gid_min < 2**30, 0, -1),
    }
    return out


def sharded_occluded(shard, o, d, t_max, axis="tp"):
    t_local, idx, _, _ = local_closest_hit(shard, o, d, t_max)
    any_local = idx >= 0
    return jax.lax.psum(any_local.astype(jnp.int32), axis) > 0


def interaction_from_reduced(hit, o, d):
    """Reduced hit record -> SoA interaction (like compute_interaction but
    from the broadcast winner attributes; no further gathers needed).

    ``b0``/``b1`` = None (streaming-kernel shards) derives barycentrics by
    projecting the hit point onto the dual basis of the winner's edges —
    the same scheme as the single-chip path (compute_interaction)."""
    t = hit["t"]
    p = o + d * t[..., None]
    b0 = hit["b0"]
    b1 = hit["b1"]
    if b0 is None:
        e1 = hit["p1"] - hit["p0"]
        e2 = hit["p2"] - hit["p0"]
        vp = p - hit["p0"]
        d11 = jnp.sum(e1 * e1, -1)
        d12 = jnp.sum(e1 * e2, -1)
        d22 = jnp.sum(e2 * e2, -1)
        den = d11 * d22 - d12 * d12
        inv_den = jnp.where(
            jnp.abs(den) > 1e-20, 1.0 / jnp.where(den == 0.0, 1.0, den), 0.0
        )
        v1 = jnp.sum(vp * e1, -1)
        v2 = jnp.sum(vp * e2, -1)
        b0 = (d22 * v1 - d12 * v2) * inv_den
        b1 = (d11 * v2 - d12 * v1) * inv_den
    b2 = 1.0 - b0 - b1
    ng = jnp.cross(hit["p1"] - hit["p0"], hit["p2"] - hit["p0"])
    ng = ng / jnp.maximum(jnp.linalg.norm(ng, axis=-1, keepdims=True), 1e-12)
    ns = b2[..., None] * hit["n0"] + b0[..., None] * hit["n1"] + b1[..., None] * hit["n2"]
    nsn = jnp.linalg.norm(ns, axis=-1, keepdims=True)
    ns = jnp.where(nsn > 1e-9, ns / jnp.maximum(nsn, 1e-12), ng)
    ng = jnp.where(jnp.sum(ng * ns, axis=-1, keepdims=True) < 0, -ng, ng)
    uv = (
        b2[..., None] * hit["uv0"]
        + b0[..., None] * hit["uv1"]
        + b1[..., None] * hit["uv2"]
    )
    miss = ~hit["hit"]
    return {
        "p": p,
        "ng": jnp.where(miss[..., None], 0.0, ng),
        "ns": jnp.where(miss[..., None], 0.0, ns),
        "uv": uv,
        "mat": jnp.where(miss, -1, hit["mat"]),
        "light": jnp.where(miss, -1, hit["light"]),
        "med_in": jnp.full(t.shape, -1, jnp.int32),
        "med_out": jnp.full(t.shape, -1, jnp.int32),
        "wo": -d,
    }


# ---------------------------------------------------------------------------
# Ring (all_to_all) formulation: rays sharded over tp as well
# ---------------------------------------------------------------------------

_REC_VEC = ("p0", "p1", "p2", "uv0", "uv1", "uv2", "n0", "n1", "n2")


def ring_closest_hit(shard, o, d, t_max, tp_size: int, axis="tp"):
    """Closest hit with rays AND triangles both sharded over ``axis``.

    Each of ``tp_size`` steps intersects the packet currently resident on
    this device against the local triangle slice, folds the result into the
    packet's best-hit record (lexicographic (t, gid) — identical tie-break
    to :func:`allreduce_closest`, so images match bit for bit), then
    rotates the packet one hop around the ring.  After tp steps every
    packet is back home having visited all geometry.

    Returns the same hit-record dict as :func:`allreduce_closest`.
    """
    n = o.shape[0]
    dt = o.dtype
    tmax = jnp.broadcast_to(t_max, (n,)).astype(dt)
    packet = {
        "o": o,
        "d": d,
        "tmax": tmax,
        "t": tmax,
        "gid": jnp.full((n,), 2**30, jnp.int32),
        "b0": jnp.zeros((n,), dt),
        "b1": jnp.zeros((n,), dt),
        "mat": jnp.full((n,), -1, jnp.int32),
        "light": jnp.full((n,), -1, jnp.int32),
    }
    for k in _REC_VEC:
        packet[k] = jnp.zeros((n,) + shard[k].shape[1:], dt)

    perm = [(i, (i + 1) % tp_size) for i in range(tp_size)]

    for _ in range(tp_size):
        t_l, idx_l, b0, b1 = local_closest_hit(
            shard, packet["o"], packet["d"], packet["tmax"]
        )
        derive_bary = b0 is None
        if derive_bary:
            b0 = jnp.zeros((n,), dt)
            b1 = jnp.zeros((n,), dt)
        safe = jnp.maximum(idx_l, 0)
        gid_l = jnp.where(idx_l >= 0, shard["gid"][safe], jnp.int32(2**30))
        better = (idx_l >= 0) & (
            (t_l < packet["t"]) | ((t_l == packet["t"]) & (gid_l < packet["gid"]))
        )
        packet["t"] = jnp.where(better, t_l, packet["t"])
        packet["gid"] = jnp.where(better, gid_l, packet["gid"])
        packet["b0"] = jnp.where(better, b0, packet["b0"])
        packet["b1"] = jnp.where(better, b1, packet["b1"])
        for k in _REC_VEC:
            packet[k] = jnp.where(better[..., None], shard[k][safe], packet[k])
        for k in ("mat", "light"):
            packet[k] = jnp.where(better, shard[k][safe], packet[k])
        packet = {k: jax.lax.ppermute(v, axis, perm) for k, v in packet.items()}

    found = packet["gid"] < 2**30
    return {
        "t": packet["t"],
        "hit": found,
        "prim": jnp.where(found, packet["gid"], 0),
        # stream shards: interaction_from_reduced derives bary from the
        # carried winner rows instead
        "b0": None if derive_bary else packet["b0"],
        "b1": None if derive_bary else packet["b1"],
        **{k: packet[k] for k in _REC_VEC},
        "mat": packet["mat"],
        "light": packet["light"],
    }


# ---------------------------------------------------------------------------
# Geometry-sharded wavefront path tracing (demonstrator + scaling harness)
# ---------------------------------------------------------------------------


def _shard_specs(tp_axis, bvh, P, pallas=False):
    """PartitionSpec dict matching shard_triangle_arrays' key set."""
    spec = {k: P(tp_axis, None) for k in (
        "p0", "p1", "p2", "uv0", "uv1", "uv2", "n0", "n1", "n2"
    )}
    spec.update({k: P(tp_axis) for k in ("mat", "light", "valid", "gid")})
    if bvh or pallas:
        spec.update({k: P(tp_axis, None) for k in ("bvh_min", "bvh_max")})
        spec.update(
            {k: P(tp_axis) for k in ("bvh_skip", "bvh_first", "bvh_count", "nn")}
        )
    if pallas:
        spec.update({k: P(tp_axis) for k in (
            "pk_nodes", "pk_tris", "pk_roots", "pk_clmin", "pk_clmax",
            "pk_s2p", "leaf_tag", "attr_rows",
        )})
    return spec


def make_sharded_path_fn(mesh, camera, sampler, film, kd_table, env_l,
                         max_depth=3, dp_axis="dp", tp_axis="tp",
                         formulation="allreduce", bvh=False, pallas=False):
    """Builds a jitted SPMD render step over a (dp, tp) mesh.

    Inputs at call time: (state, shard_tables_local?, pixels, sidx) — the
    triangle shard arrives via shard_map in_specs P('tp', ...), pixels via
    P('dp', ...) (allreduce) or P(('dp','tp'), ...) (ring).  Matte shading
    with a per-material kd table and a constant environment light; NEE
    omitted (env provides direct light) — this is the scaling harness for
    BASELINE config 5, not the full feature integrator.

    formulation:
      * "allreduce" — rays replicated over tp; winner reduced by pmin/psum;
      * "ring"      — rays sharded over tp too; packets rotate the ring
        (see :func:`ring_closest_hit`).  Same images, tp x more lanes.
    """
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from pbrt_tpu.core.geometry import coordinate_system, vface_forward
    from pbrt_tpu.core.sampling import cosine_sample_hemisphere

    kd_table = jnp.asarray(kd_table)
    env_l = jnp.asarray(env_l)

    def local_step(state, shard, pixel_xy, sidx):
        n = pixel_xy.shape[0]
        u_film = sampler.get2(pixel_xy, sidx, 0)
        p_film = pixel_xy.astype(float_t) + u_film
        o, d, w = camera.generate_rays(p_film, sampler.get2(pixel_xy, sidx, 2))
        L = jnp.zeros((n, 3), dtype=float_t)
        beta = jnp.ones((n, 3), dtype=float_t)
        alive = jnp.ones((n,), dtype=bool)
        for bounce in range(max_depth):
            if formulation == "ring":
                hit = ring_closest_hit(
                    shard, o, d, jnp.full((n,), INF_T, dtype=float_t),
                    mesh.shape[tp_axis], tp_axis,
                )
            else:
                t_l, idx_l, b0, b1 = local_closest_hit(
                    shard, o, d, jnp.full((n,), INF_T, dtype=float_t)
                )
                hit = allreduce_closest(shard, t_l, idx_l, b0, b1, tp_axis)
            esc = alive & ~hit["hit"]
            L = L + jnp.where(esc[..., None], beta * env_l, 0.0)
            alive = alive & hit["hit"]
            si = interaction_from_reduced(hit, o, d)
            if bounce == max_depth - 1:
                break
            ns = vface_forward(si["ns"], si["wo"])
            ss, ts = coordinate_system(ns)
            kd = kd_table[jnp.clip(si["mat"], 0, kd_table.shape[0] - 1)]
            u2 = sampler.get2(pixel_xy, sidx, 5 + 3 * bounce)
            wi_local = cosine_sample_hemisphere(u2)
            wi = (
                wi_local[..., 0:1] * ss
                + wi_local[..., 1:2] * ts
                + wi_local[..., 2:3] * ns
            )
            beta = jnp.where(alive[..., None], beta * kd, beta)
            o = si["p"] + ns * 1e-3
            d = wi
        L = jnp.where(jnp.isfinite(L), L, 0.0) * w[..., None]
        zero = {k: jnp.zeros_like(v) for k, v in state.items()}
        partial = film.add_samples(zero, p_film, L)
        partial = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, (dp_axis, tp_axis)), partial
        )
        if formulation != "ring":
            # tp replicas each traced the same rays: avoid double counting
            tp_size = mesh.shape[tp_axis]
            partial = jax.tree_util.tree_map(lambda x: x / tp_size, partial)
        return jax.tree_util.tree_map(jnp.add, state, partial)

    shard_spec = _shard_specs(tp_axis, bvh, P, pallas)
    ray_axes = (dp_axis, tp_axis) if formulation == "ring" else dp_axis
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), shard_spec, P(ray_axes, None), P(ray_axes)),
        out_specs=P(),
        check_rep=False,
    )
    return jax.jit(fn)


def make_sharded_grad_fn(mesh, camera, sampler, film, target,
                         max_depth=3, dp_axis="dp", tp_axis="tp", bvh=False,
                         pallas=False, remat=True):
    """Jitted loss+gradient step with geometry sharded over tp: the
    path-replay inverse-rendering formulation of BASELINE config 5.

    Differentiable parameters theta = {"kd": [M,3], "env_l": [3]}; the
    forward wavefront is the same matte harness as
    :func:`make_sharded_path_fn` (allreduce formulation) with each bounce
    wrapped in ``jax.checkpoint`` — reverse mode *replays* the bounce
    (re-intersecting with its deterministic samples) instead of storing
    wavefront state, and the resulting parameter gradients are psum'd over
    (dp, tp).  Returns ``fn(theta, shard, pixels, sidx) -> (loss, grads)``.
    """
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from pbrt_tpu.core.geometry import coordinate_system, vface_forward
    from pbrt_tpu.core.sampling import cosine_sample_hemisphere

    target = jnp.asarray(target)

    def radiance(theta, shard, pixel_xy, sidx):
        n = pixel_xy.shape[0]
        u_film = sampler.get2(pixel_xy, sidx, 0)
        p_film = pixel_xy.astype(float_t) + u_film
        o, d, w = camera.generate_rays(p_film, sampler.get2(pixel_xy, sidx, 2))
        carry = (
            jnp.zeros((n, 3), dtype=float_t),
            jnp.ones((n, 3), dtype=float_t),
            jnp.ones((n,), dtype=bool),
            o,
            d,
        )

        def bounce_body(bounce, carry):
            L, beta, alive, o, d = carry
            t_l, idx_l, b0, b1 = local_closest_hit(
                shard, o, d, jnp.where(alive, INF_T, 0.0).astype(float_t)
            )
            hit = allreduce_closest(shard, t_l, idx_l, b0, b1, tp_axis)
            esc = alive & ~hit["hit"]
            L = L + jnp.where(esc[..., None], beta * theta["env_l"], 0.0)
            alive = alive & hit["hit"]
            si = interaction_from_reduced(hit, o, d)
            if bounce == max_depth - 1:
                return L, beta, alive, o, d
            ns = vface_forward(si["ns"], si["wo"])
            ss, ts = coordinate_system(ns)
            kd = theta["kd"][jnp.clip(si["mat"], 0, theta["kd"].shape[0] - 1)]
            u2 = sampler.get2(pixel_xy, sidx, 5 + 3 * bounce)
            wi_local = cosine_sample_hemisphere(u2)
            wi = (
                wi_local[..., 0:1] * ss
                + wi_local[..., 1:2] * ts
                + wi_local[..., 2:3] * ns
            )
            beta = jnp.where(alive[..., None], beta * kd, beta)
            return L, beta, alive, si["p"] + ns * 1e-3, wi

        for bounce in range(max_depth):
            body = lambda c, b=bounce: bounce_body(b, c)
            if remat:
                body = jax.checkpoint(body)
            carry = body(carry)
        L = carry[0]
        return jnp.where(jnp.isfinite(L), L, 0.0) * w[..., None], p_film

    def local_loss(theta, shard, pixel_xy, sidx):
        L, p_film = radiance(theta, shard, pixel_xy, sidx)
        pix = jnp.clip(
            p_film.astype(jnp.int32),
            0,
            jnp.asarray(target.shape[:2][::-1], jnp.int32) - 1,
        )
        want = target[pix[..., 1], pix[..., 0]]
        # tp replicas trace identical rays: average, don't double count
        per_lane = jnp.sum((L - want) ** 2, axis=-1) / mesh.shape[tp_axis]
        return jax.lax.psum(jnp.sum(per_lane), (dp_axis, tp_axis))

    def local_step(theta, shard, pixel_xy, sidx):
        loss, grads = jax.value_and_grad(local_loss)(theta, shard, pixel_xy, sidx)
        # the psum in local_loss transposes to a broadcast cotangent, so
        # each device holds only its lanes' d(loss)/d(theta) — the gradient
        # all-reduce over the mesh completes the distributed training step
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, (dp_axis, tp_axis)), grads
        )
        return loss, grads

    shard_spec = _shard_specs(tp_axis, bvh, P, pallas)
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), shard_spec, P(dp_axis, None), P(dp_axis)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(fn)
