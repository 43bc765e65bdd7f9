"""BVH8 wide-node walk (ops/bvh8.py) vs the binary ordered walk.

The wide kernel is the production traversal (accel/bvh.py dispatch,
PBRT_TPU_WIDE); the binary kernel stays as the env-gated fallback, so
these tests pin their equality the same way tests/test_bvh.py pins the
fused-leaf variant.  Runs in Pallas interpret mode on the CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_tpu.accel.bvh import build_bvh
from pbrt_tpu.ops.bvh8 import NODE_COLS, PallasBVH8, collapse8, pack_tree8
from pbrt_tpu.ops.stream_bvh import StreamBVH, _stream_candidates, pack_leaf_rows


def _soup(n, seed=0, scale=0.08):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-scale, scale, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-scale, scale, (n, 3)).astype(np.float32)
    return c, c + e1, c + e2


def _rays(n, seed=2):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d), jnp.full((n,), 1e9, jnp.float32)


def test_wide_whole_tree_matches_binary():
    p0, p1, p2 = _soup(3000)
    # matched trees: the wide walk visits the SAME leaves as the binary
    # walk when both are built at leaf 16, so prim/t must agree exactly
    m, x, s, f, c, perm = build_bvh(p0, p1, p2, leaf_size=16)
    tp = (p0[perm], p1[perm], p2[perm])
    m8, x8, s8, f8, c8, perm8 = build_bvh(p0, p1, p2, leaf_size=8)
    tp8 = (p0[perm8], p1[perm8], p2[perm8])
    from pbrt_tpu.ops.pallas_bvh import PallasBVH2

    b2 = PallasBVH2(m8, x8, s8, f8, c8, *tp8, interpret=True)
    b8 = PallasBVH8(m, x, s, f, c, *tp, interpret=True, leaf_slots=16)
    o, d, tm = _rays(1024)
    t2, pr2 = b2.traverse(o, d, tm)
    t8, pr8 = b8.traverse(o, d, tm)
    h2 = np.asarray(pr2) >= 0
    h8 = np.asarray(pr8) >= 0
    assert (h2 == h8).all()
    assert np.allclose(np.asarray(t2)[h2], np.asarray(t8)[h8], rtol=1e-5, atol=1e-6)
    # original-triangle winners agree (trees differ, so compare via perm)
    g2 = np.asarray(perm8)[np.asarray(pr2)[h2]]
    g8 = np.asarray(perm)[np.asarray(pr8)[h8]]
    assert (g2 == g8).all()
    # any-hit agrees
    _, o2 = b2.traverse(o, d, tm, any_hit=True)
    _, o8 = b8.traverse(o, d, tm, any_hit=True)
    assert ((np.asarray(o2) >= 0) == (np.asarray(o8) >= 0)).all()


def test_wide_stream_matches_binary_stream_exactly():
    p0, p1, p2 = _soup(9000, seed=1)
    m, x, s, f, c, perm = build_bvh(p0, p1, p2, leaf_size=16)
    tp = (p0[perm], p1[perm], p2[perm])
    kw = dict(target_tris=2048, interpret=True, leaf_slots=16)
    sb = StreamBVH(m, x, s, f, c, *tp, wide=False, **kw)
    sw = StreamBVH(m, x, s, f, c, *tp, wide=True, **kw)
    assert sw.nodes.shape[-1] == NODE_COLS
    o, d, tm = _rays(1024, seed=3)
    tb, pb = sb.traverse(o, d, tm)
    tw, pw = sw.traverse(o, d, tm)
    tb, pb, tw, pw = map(np.asarray, (tb, pb, tw, pw))
    hb = pb >= 0
    # same clusters + same leaves -> bit-identical hits
    assert (hb == (pw >= 0)).all()
    assert (tb[hb] == tw[hb]).all()
    assert (pb[hb] == pw[hb]).all()
    _, ob = sb.traverse(o, d, tm, any_hit=True)
    _, ow = sw.traverse(o, d, tm, any_hit=True)
    assert ((np.asarray(ob) >= 0) == (np.asarray(ow) >= 0)).all()


def test_wide_single_leaf_tree():
    p0, p1, p2 = _soup(10, scale=0.5)
    m, x, s, f, c, perm = build_bvh(p0, p1, p2, leaf_size=16)
    b8 = PallasBVH8(m, x, s, f, c, p0[perm], p1[perm], p2[perm],
                    interpret=True, leaf_slots=16)
    o, d, tm = _rays(1024, seed=4)
    t8, pr8 = b8.traverse(o, d, tm)
    # brute-force reference
    from pbrt_tpu.shapes import TriangleData
    from pbrt_tpu.ops.intersect_soa import SoABruteForceIntersector

    uv = np.zeros((len(p0), 2), np.float32)
    td = TriangleData(p0, p1, p2, uv, uv, uv)
    ref = SoABruteForceIntersector(td, None).intersect(o, d, tm)
    hit8 = np.asarray(pr8) >= 0
    assert (hit8 == np.asarray(ref["hit"])).all()
    assert np.allclose(
        np.asarray(t8)[hit8], np.asarray(ref["t"])[hit8], rtol=1e-4, atol=1e-5
    )


def test_collapse8_invariants():
    p0, p1, p2 = _soup(2000, seed=5)
    m, x, s, f, c, perm = build_bvh(p0, p1, p2, leaf_size=16)
    tris, s2p, padded_firsts = pack_leaf_rows(f, c, p0[perm], p1[perm], p2[perm], 16)
    w = collapse8(m, x, s, f, c, padded_firsts)
    assert w.shape[1] == NODE_COLS
    refs = w[:, 48:56]
    assert np.abs(refs).max() < (1 << 24)
    # interior refs point at valid wide ranks; every rank except the root
    # is referenced exactly once
    interior = refs[refs >= 0].astype(np.int64)
    assert interior.max(initial=0) < len(w)
    counts = np.bincount(interior, minlength=len(w))
    assert (counts[1:] == 1).all() and counts[0] == 0
    # empty slots carry min = max = +inf boxes (can never slab-hit)
    for ni in range(len(w)):
        for cc in range(8):
            if w[ni, 48 + cc] == -1.0:  # empty-slot code
                assert np.all(np.isinf(w[ni, 6 * cc: 6 * cc + 6]))
    # children sorted ascending by centroid along the stored axis
    for ni in range(min(len(w), 64)):
        ax = int(w[ni, 56])
        cen = []
        for cc in range(8):
            if w[ni, 48 + cc] == -1.0:
                continue
            box = w[ni, 6 * cc: 6 * cc + 6]
            cen.append(0.5 * (box[ax] + box[3 + ax]))
        assert (np.diff(cen) >= -1e-6).all()


def test_stream_candidates_skip_padded_clusters():
    """Regression for the r4 ADVICE bug: padded clusters must never enter
    a block's candidate list.  Padding is cl_min = cl_max = +inf; the old
    inverted (-inf) padding made EVERY ray hit them."""
    real_min = np.array([[-1.0, -1.0, -1.0]], np.float32)
    real_max = np.array([[1.0, 1.0, 1.0]], np.float32)
    pad = np.full((1, 3), np.inf, np.float32)
    cl_min = jnp.asarray(np.concatenate([real_min, pad]))
    cl_max = jnp.asarray(np.concatenate([real_max, pad]))
    o, d, tm = _rays(1024, seed=6)
    from pbrt_tpu.ops.stream_bvh import split_pad_rays

    comps = split_pad_rays(o, d, tm, 1024)
    clist, cnt = _stream_candidates(cl_min, cl_max, 2, comps)
    cnt = np.asarray(cnt)
    clist = np.asarray(clist)
    assert (cnt <= 1).all()
    for b in range(clist.shape[0]):
        assert 1 not in clist[b, : cnt[b]]
