"""Config-5 (1M-tri streaming) roofline decomposition (VERDICT r4 item 3).

Replays the BVH8 streaming walk's CONTROL FLOW in numpy over the real
packed tables and the real (pre-sorted) bench rays, counting per-block
candidate clusters, interior/leaf iterations, and DMA bytes — the
denominators the chip measurement (scripts/profile_r5_bvh8.py
config5_ms) divides into.  Host-only; no TPU needed.

Usage: python scripts/roofline_c5.py [n_tris_nu nv] [sample_blocks]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RAY_EPS = 1e-4
BLOCK = 1024


def slab_np(nf, base, ox, oy, oz, ix, iy, iz, best_t):
    t_lo_x = (nf[base + 0] - ox) * ix
    t_hi_x = (nf[base + 3] - ox) * ix
    t_lo_y = (nf[base + 1] - oy) * iy
    t_hi_y = (nf[base + 4] - oy) * iy
    t_lo_z = (nf[base + 2] - oz) * iz
    t_hi_z = (nf[base + 5] - oz) * iz
    tn = np.maximum(
        np.maximum(np.minimum(t_lo_x, t_hi_x), np.minimum(t_lo_y, t_hi_y)),
        np.minimum(t_lo_z, t_hi_z),
    )
    tf = np.minimum(
        np.minimum(np.maximum(t_lo_x, t_hi_x), np.maximum(t_lo_y, t_hi_y)),
        np.maximum(t_lo_z, t_hi_z),
    )
    with np.errstate(invalid="ignore"):
        return (tn <= tf) & (tf > RAY_EPS) & (tn < best_t)


def moller(rows, k16, ox, oy, oz, dx, dy, dz, best_t):
    c = 16 * (k16 % 8)
    row = rows[k16 // 8]
    p0x, p0y, p0z = row[c], row[c + 1], row[c + 2]
    e1x, e1y, e1z = row[c + 3] - p0x, row[c + 4] - p0y, row[c + 5] - p0z
    e2x, e2y, e2z = row[c + 6] - p0x, row[c + 7] - p0y, row[c + 8] - p0z
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
    tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
    b0 = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    b1 = (dx * qvx + dy * qvy + dz * qvz) * inv
    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
    ok = ((np.abs(det) > 1e-12) & (b0 >= 0) & (b1 >= 0)
          & (b0 + b1 <= 1) & (tt > RAY_EPS) & (tt < best_t))
    return np.where(ok, tt, best_t)


def walk8_count(nodes, tris, root, ox, oy, oz, dx, dy, dz, best_t,
                leaf_slots=16):
    """Replay one cluster walk for one block; returns (interior, leaf,
    pushes, best_t)."""
    interior = leaf = pushes = 0
    ix = np.where(dx < 0, -1.0, 1.0) / np.maximum(np.abs(dx), 1e-20)
    iy = np.where(dy < 0, -1.0, 1.0) / np.maximum(np.abs(dy), 1e-20)
    iz = np.where(dz < 0, -1.0, 1.0) / np.maximum(np.abs(dz), 1e-20)
    sx, sy, sz = dx[0] < 0, dy[0] < 0, dz[0] < 0
    stack = []
    ref = int(root)
    while True:
        if ref < 0:
            leaf += 1
            code = -ref - 1
            first = (code >> 6) << 3  # row-index leaf encoding
            count = code & 63
            for k in range(count):
                best_t = moller(tris, first + k, ox, oy, oz, dx, dy, dz, best_t)
        else:
            interior += 1
            nf = nodes[ref]
            hits = []
            for cc in range(8):
                h = slab_np(nf, 6 * cc, ox, oy, oz, ix, iy, iz, best_t)
                if h.any():
                    hits.append(cc)
            ax = int(nf[56])
            rev = (sx, sy, sz)[ax]
            order = hits if not rev else hits[::-1]
            # push far-to-near; nearest popped first
            for cc in order[::-1]:
                stack.append(int(nf[48 + cc]))
                pushes += 1
        if not stack:
            break
        ref = stack.pop()
    return interior, leaf, pushes, best_t


def main():
    nu = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    nv = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    sample_blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    # production config-5 parameters (accel/bvh.py): 32-slot leaves for
    # the streaming path, default cluster target (~31k tris at 1M)
    leaf_slots = int(os.environ.get("PBRT_TPU_LEAF_SLOTS", "32"))
    from pbrt_tpu.accel.bvh import build_bvh
    from pbrt_tpu.ops.stream_bvh import pack_stream_tables
    from pbrt_tpu.testscenes import torus_triangle_data
    import bench

    td = torus_triangle_data(nu, nv)
    mins, maxs, skips, firsts, counts, perm = build_bvh(
        td.p0, td.p1, td.p2, leaf_slots
    )
    t = pack_stream_tables(
        mins, maxs, skips, firsts, counts,
        td.p0[perm], td.p1[perm], td.p2[perm], leaf_slots=leaf_slots,
        wide=True,
    )
    nodes, tris = t["nodes"], t["tris"]
    roots, cl_min, cl_max = t["roots"], t["cl_min"], t["cl_max"]
    C = nodes.shape[0]

    n = 1 << 18
    rng = np.random.default_rng(0)
    o = np.tile(np.asarray([3.0, 2.4, 2.2], np.float32), (n, 1))
    tgt = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = bench._presort_coherent(o, d)

    # phase A (vectorized): candidates per block sorted by entry t
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    ix = np.where(dx < 0, -1, 1) / np.maximum(np.abs(dx), 1e-20)
    iy = np.where(dy < 0, -1, 1) / np.maximum(np.abs(dy), 1e-20)
    iz = np.where(dz < 0, -1, 1) / np.maximum(np.abs(dz), 1e-20)
    tn = np.full((n, C), np.inf, np.float32)
    hit = np.zeros((n, C), bool)
    for c in range(C):
        lo, hi = cl_min[c], cl_max[c]
        lx, hx = (lo[0] - ox) * ix, (hi[0] - ox) * ix
        ly, hy = (lo[1] - oy) * iy, (hi[1] - oy) * iy
        lz, hz = (lo[2] - oz) * iz, (hi[2] - oz) * iz
        a = np.maximum(np.maximum(np.minimum(lx, hx), np.minimum(ly, hy)),
                       np.minimum(lz, hz))
        b = np.minimum(np.minimum(np.maximum(lx, hx), np.maximum(ly, hy)),
                       np.maximum(lz, hz))
        m = (a <= b) & (b > RAY_EPS)
        hit[:, c] = m
        tn[:, c] = np.where(m, a, np.inf)
    nb = n // BLOCK
    hit_b = hit.reshape(nb, BLOCK, C).any(axis=1)
    tent_b = np.where(hit_b, tn.reshape(nb, BLOCK, C).min(axis=1), np.inf)
    cnt = hit_b.sum(axis=1)

    # per-cluster sizes for DMA accounting (128-lane-padded rows)
    bytes_per_cluster = (nodes.shape[1] * 128 + tris.shape[1] * 128) * 4

    # phase B replay on a block sample
    sel = np.linspace(0, nb - 1, sample_blocks).astype(int)
    tot_i = tot_l = tot_p = 0
    visited = 0
    for b in sel:
        s = slice(b * BLOCK, (b + 1) * BLOCK)
        bo, bd = o[s], d[s]
        best = np.full(BLOCK, 1e8, np.float32)
        order = np.argsort(tent_b[b])
        for c in order[: cnt[b]]:
            i, l, p, best = walk8_count(
                nodes[c], tris[c], roots[c],
                bo[:, 0], bo[:, 1], bo[:, 2], bd[:, 0], bd[:, 1], bd[:, 2],
                best,
            )
            tot_i += i
            tot_l += l
            tot_p += p
            visited += 1

    scale = nb / sample_blocks
    out = {
        "n_clusters": int(C),
        "tris_per_cluster": int(td.count // C),
        "blocks": int(nb),
        "cand_per_block_mean": float(cnt.mean()),
        "cand_per_block_max": int(cnt.max()),
        "grid_steps": int(nb * C),
        "active_steps_est": float(cnt.mean() * nb),
        "dma_mb_per_sweep": round(cnt.mean() * nb * bytes_per_cluster / 1e6, 1),
        "interior_iters_est": int(tot_i * scale),
        "leaf_iters_est": int(tot_l * scale),
        "pushes_est": int(tot_p * scale),
        "iters_per_block_cluster": round((tot_i + tot_l) / max(visited, 1), 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
