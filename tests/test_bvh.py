"""BVH correctness: traversal must agree exactly with brute force."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pbrt_tpu import float_t
from pbrt_tpu.accel.bvh import BVHIntersector, build_bvh
from pbrt_tpu.ops.intersect import BruteForceIntersector
from pbrt_tpu.shapes import TriangleData


def random_mesh(n_tris, seed=0, extent=10.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-extent, extent, size=(n_tris, 3)).astype(np.float32)
    e1 = rng.normal(0, 1, size=(n_tris, 3)).astype(np.float32)
    e2 = rng.normal(0, 1, size=(n_tris, 3)).astype(np.float32)
    uv = rng.uniform(0, 1, size=(n_tris, 2)).astype(np.float32)
    return TriangleData(
        p0=base,
        p1=base + e1,
        p2=base + e2,
        uv0=uv,
        uv1=uv,
        uv2=uv,
    )


def random_rays(n_rays, seed=1, extent=14.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-extent, extent, size=(n_rays, 3)).astype(np.float32)
    d = rng.normal(0, 1, size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("n_tris", [1, 5, 63, 500])
def test_bvh_matches_brute_force(n_tris):
    tri = random_mesh(n_tris)
    bvh = BVHIntersector(tri, None)
    brute = BruteForceIntersector(tri, None)
    o, d = random_rays(512)
    t_max = jnp.full((512,), 1e8, dtype=jnp.float32)
    hb = jax.jit(brute.intersect)(o, d, t_max)
    hv = jax.jit(bvh.intersect)(o, d, t_max)
    np.testing.assert_array_equal(np.asarray(hb["hit"]), np.asarray(hv["hit"]))
    hit = np.asarray(hb["hit"])
    np.testing.assert_allclose(
        np.asarray(hb["t"])[hit], np.asarray(hv["t"])[hit], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(hb["prim"])[hit], np.asarray(hv["prim"])[hit]
    )


def test_bvh_occlusion_matches():
    tri = random_mesh(200)
    bvh = BVHIntersector(tri, None)
    brute = BruteForceIntersector(tri, None)
    o, d = random_rays(512, seed=3)
    t_max = jnp.full((512,), 20.0, dtype=jnp.float32)
    ob = np.asarray(jax.jit(brute.occluded)(o, d, t_max))
    ov = np.asarray(jax.jit(bvh.occluded)(o, d, t_max))
    np.testing.assert_array_equal(ob, ov)


def test_build_structure_valid():
    tri = random_mesh(100)
    mins, maxs, skips, firsts, counts, perm = build_bvh(tri.p0, tri.p1, tri.p2)
    m = len(mins)
    assert skips[0] == m  # root subtree covers everything
    assert (skips > np.arange(m)).all()  # skips always advance
    # leaf ranges cover every prim exactly once
    covered = []
    for f, c in zip(firsts, counts):
        if c > 0:
            covered.extend(range(f, f + c))
    assert sorted(covered) == list(range(100))
    assert sorted(perm.tolist()) == list(range(100))
    # parent boxes contain children (DFS order: node i+1 is first child)
    for i in range(m):
        if counts[i] == 0:
            j = i + 1
            assert (mins[i] <= mins[j] + 1e-6).all()
            assert (maxs[i] >= maxs[j] - 1e-6).all()


def test_scene_with_bvh_renders_same_as_brute():
    """Full pipeline: same scene rendered with bvh vs brute-force
    accelerator must match exactly."""
    from pbrt_tpu import Options
    from pbrt_tpu.core.api import PbrtAPI
    from pbrt_tpu.render import render_scene

    def scene_text(accel):
        return f"""
        LookAt 0 1.5 -4  0 0.5 0  0 1 0
        Camera "perspective" "float fov" 50
        Sampler "halton" "integer pixelsamples" 2
        Integrator "path" "integer maxdepth" 2
        Film "image" "integer xresolution" [16] "integer yresolution" [16]
        Accelerator "{accel}" "integer minprims" 1
        WorldBegin
        LightSource "infinite" "rgb L" [.5 .5 .5]
        Material "matte" "rgb Kd" [0.6 0.5 0.4]
        Shape "loopsubdiv" "integer nlevels" 2
            "integer indices" [0 1 2  0 2 3  0 3 1  1 3 2]
            "point P" [0 1 0  -1 0 -1  1 0 -1  0 0 1]
        WorldEnd
        """

    def run(accel):
        api = PbrtAPI(Options(ray_batch=256), render_on_world_end=False)
        api.init()
        api.parse_string(scene_text(accel))
        return render_scene(api.scene, api.opt, write=False)["image"]

    img_bvh = run("bvh")
    img_brute = run("none")
    np.testing.assert_allclose(img_bvh, img_brute, atol=1e-6)


def test_native_sah_build_matches_brute_force():
    """Native binned-SAH tree must produce identical hits to brute force."""
    from pbrt_tpu.native import bvh_build_native

    tri = random_mesh(2000, seed=11)
    out = bvh_build_native(tri.p0, tri.p1, tri.p2)
    if out is None:
        pytest.skip("native library unavailable")
    bvh = BVHIntersector(tri, None)  # uses native build by default
    brute = BruteForceIntersector(tri, None)
    o, d = random_rays(512, seed=5)
    t_max = jnp.full((512,), 1e8, dtype=jnp.float32)
    hb = jax.jit(brute.intersect)(o, d, t_max)
    hv = jax.jit(bvh.intersect)(o, d, t_max)
    np.testing.assert_array_equal(np.asarray(hb["hit"]), np.asarray(hv["hit"]))
    hit = np.asarray(hb["hit"])
    np.testing.assert_allclose(
        np.asarray(hb["t"])[hit], np.asarray(hv["t"])[hit], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(hb["prim"])[hit], np.asarray(hv["prim"])[hit]
    )


def test_native_tokenizer_parity():
    from pbrt_tpu.core.parser import create_from_string
    from pbrt_tpu.native import tokenize_native

    data = open("/root/reference/scenes/check-sphere.pbrt", "rb").read()
    out = tokenize_native(data)
    if out is None:
        pytest.skip("native library unavailable")
    st, en = out
    native = [data[s:e].decode() for s, e in zip(st, en)]
    python = list(create_from_string(data))
    assert native == python


def test_sorted_pallas_traversal_matches_brute():
    """The TPU packet-traversal path (Pallas kernel + Morton ray sort) in
    interpret mode must agree exactly with brute force."""
    tri = random_mesh(800, seed=4)
    bvh = BVHIntersector(tri, None, use_pallas=True, pallas_interpret=True)
    brute = BruteForceIntersector(tri, None)
    o, d = random_rays(2048, seed=9)
    tm = jnp.full((2048,), 1e8, jnp.float32)
    hp = bvh.intersect(o, d, tm)
    hb = jax.jit(brute.intersect)(o, d, tm)
    np.testing.assert_array_equal(np.asarray(hb["hit"]), np.asarray(hp["hit"]))
    m = np.asarray(hb["hit"])
    np.testing.assert_allclose(
        np.asarray(hb["t"])[m], np.asarray(hp["t"])[m], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(hb["prim"])[m], np.asarray(hp["prim"])[m]
    )


def test_ordered_pallas_kernel_matches_brute():
    """The ordered stack-traversal kernel (PallasBVH2) in interpret mode
    must agree with brute force on hits/t and produce valid prims."""
    from pbrt_tpu.ops.pallas_bvh import PallasBVH2

    tri = random_mesh(800, seed=5)
    mins, maxs, skips, firsts, counts, perm = build_bvh(tri.p0, tri.p1, tri.p2)
    k = PallasBVH2(
        mins, maxs, skips, firsts, counts,
        tri.p0[perm], tri.p1[perm], tri.p2[perm], interpret=True,
    )
    brute = BruteForceIntersector(tri, None)
    o, d = random_rays(2048, seed=11)
    tm = jnp.full((2048,), 1e8, jnp.float32)
    t, prim = k.traverse(o, d, tm)
    hb = jax.jit(brute.intersect)(o, d, tm)
    hit = np.asarray(prim) >= 0
    np.testing.assert_array_equal(np.asarray(hb["hit"]), hit)
    np.testing.assert_allclose(
        np.asarray(hb["t"])[hit], np.asarray(t)[hit], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(hb["prim"])[hit], np.asarray(perm)[np.asarray(prim)[hit]]
    )
    # any-hit agrees on occlusion
    _, prim_any = k.traverse(o, d, tm, any_hit=True)
    np.testing.assert_array_equal(np.asarray(prim_any) >= 0, hit)


def test_ordered_pallas_kernel_single_leaf():
    """Tiny mesh (root is a single leaf) goes through the leaf-root path."""
    from pbrt_tpu.ops.pallas_bvh import PallasBVH2

    tri = random_mesh(3, seed=6)
    mins, maxs, skips, firsts, counts, perm = build_bvh(tri.p0, tri.p1, tri.p2)
    k = PallasBVH2(
        mins, maxs, skips, firsts, counts,
        tri.p0[perm], tri.p1[perm], tri.p2[perm], interpret=True,
    )
    brute = BruteForceIntersector(tri, None)
    o, d = random_rays(512, seed=12)
    tm = jnp.full((512,), 1e8, jnp.float32)
    t, prim = k.traverse(o, d, tm)
    hb = jax.jit(brute.intersect)(o, d, tm)
    np.testing.assert_array_equal(np.asarray(hb["hit"]), np.asarray(prim) >= 0)


def _brute_ref(tri, o, d, tm):
    brute = BruteForceIntersector(tri, None)
    return jax.jit(brute.intersect)(o, d, tm)


def test_stream_bvh_multi_cluster_matches_brute():
    """Two-level streaming kernel (small target_tris forces many clusters)
    must agree with brute force in interpret mode."""
    from pbrt_tpu.ops.stream_bvh import StreamBVH

    tri = random_mesh(3000, seed=21)
    mins, maxs, skips, firsts, counts, perm = build_bvh(
        tri.p0, tri.p1, tri.p2, leaf_size=8
    )
    k = StreamBVH(
        mins, maxs, skips, firsts, counts,
        tri.p0[perm], tri.p1[perm], tri.p2[perm],
        target_tris=256, interpret=True,
    )
    assert k.n_clusters > 4
    o, d = random_rays(2048, seed=22)
    tm = jnp.full((2048,), 1e8, jnp.float32)
    t, prim = k.traverse(o, d, tm)
    hb = _brute_ref(tri, o, d, tm)
    hit = np.asarray(prim) >= 0
    np.testing.assert_array_equal(np.asarray(hb["hit"]), hit)
    np.testing.assert_allclose(
        np.asarray(hb["t"])[hit], np.asarray(t)[hit], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(hb["prim"])[hit], np.asarray(perm)[np.asarray(prim)[hit]]
    )
    # any-hit finds exactly the occluded set
    _, prim_any = k.traverse(o, d, tm, any_hit=True)
    np.testing.assert_array_equal(np.asarray(prim_any) >= 0, hit)


def test_stream_bvh_single_cluster_and_dead_lanes():
    from pbrt_tpu.ops.stream_bvh import StreamBVH

    tri = random_mesh(300, seed=23)
    mins, maxs, skips, firsts, counts, perm = build_bvh(
        tri.p0, tri.p1, tri.p2, leaf_size=8
    )
    k = StreamBVH(
        mins, maxs, skips, firsts, counts,
        tri.p0[perm], tri.p1[perm], tri.p2[perm],
        target_tris=4096, interpret=True,
    )
    assert k.n_clusters == 1
    o, d = random_rays(1024, seed=24)
    tm = jnp.full((1024,), 1e8, jnp.float32)
    # half the lanes are dead (t_max = 0): they must report no hit
    tm = tm.at[::2].set(0.0)
    t, prim = k.traverse(o, d, tm)
    assert not np.any(np.asarray(prim)[::2] >= 0)
    hb = _brute_ref(tri, o, d, tm)
    live = np.ones(1024, bool)
    live[::2] = False
    np.testing.assert_array_equal(
        np.asarray(hb["hit"])[live], (np.asarray(prim) >= 0)[live]
    )
    hit_live = live & (np.asarray(prim) >= 0)
    np.testing.assert_allclose(
        np.asarray(hb["t"])[hit_live], np.asarray(t)[hit_live], rtol=1e-5
    )


def test_bvh_intersector_stream_path_matches_brute(monkeypatch):
    """Past the whole-tree VMEM budget the accelerator routes through
    StreamBVH; the full intersect/occluded interface must agree with
    brute force."""
    tri = random_mesh(5000, seed=25)
    bvh = BVHIntersector(tri, None, use_pallas=True, pallas_interpret=True)
    from pbrt_tpu.ops.stream_bvh import StreamBVH

    assert isinstance(bvh._pallas, StreamBVH)
    o, d = random_rays(2048, seed=26)
    tm = jnp.full((2048,), 1e8, jnp.float32)
    hp = bvh.intersect(o, d, tm)
    hb = _brute_ref(tri, o, d, tm)
    np.testing.assert_array_equal(np.asarray(hb["hit"]), np.asarray(hp["hit"]))
    m = np.asarray(hb["hit"])
    np.testing.assert_allclose(
        np.asarray(hb["t"])[m], np.asarray(hp["t"])[m], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(hb["prim"])[m], np.asarray(hp["prim"])[m]
    )
    ob = np.asarray(BruteForceIntersector(tri, None).occluded(o, d, jnp.full((2048,), 20.0, jnp.float32)))
    ov = np.asarray(bvh.occluded(o, d, jnp.full((2048,), 20.0, jnp.float32)))
    np.testing.assert_array_equal(ob, ov)


def test_split_clusters_partitions_prims():
    from pbrt_tpu.ops.stream_bvh import split_clusters

    tri = random_mesh(2000, seed=27)
    mins, maxs, skips, firsts, counts, perm = build_bvh(
        tri.p0, tri.p1, tri.p2, leaf_size=8
    )
    cl = split_clusters(skips, firsts, counts, 2000, 128)
    spans = sorted((lo, hi) for (_, lo, hi) in cl)
    assert spans[0][0] == 0 and spans[-1][1] == 2000
    for (a, b), (c2, d2) in zip(spans, spans[1:]):
        assert b == c2  # contiguous, non-overlapping
    assert all(hi - lo <= 128 or counts[i] > 0 for (i, lo, hi) in cl)


def test_stream_path_uv_bary_parity():
    """Full textured render through the interpret-mode streaming kernel:
    the post-kernel barycentric derivation (compute_interaction dual-basis
    projection) must reproduce the brute-force images — uv-dependent
    checkerboard shading included."""
    from pbrt_tpu import Options
    from pbrt_tpu.core.api import PbrtAPI
    from pbrt_tpu.render import Renderer
    from pbrt_tpu.testscenes import _torus_mesh_params

    api = PbrtAPI(Options(ray_batch=4096), render_on_world_end=False)
    api.init()
    api.parse_string(
        """
        LookAt 2.8 2.2 2.8  0 0 0  0 0 1
        Camera "perspective" "float fov" 45
        Sampler "halton" "integer pixelsamples" 2
        Integrator "path" "integer maxdepth" 2
        Film "image" "integer xresolution" [24] "integer yresolution" [24]
        Accelerator "bvh" "integer minprims" 1
        WorldBegin
        LightSource "infinite" "rgb L" [1 1 1]
        Texture "checks" "spectrum" "checkerboard"
            "float uscale" [8] "float vscale" [4]
            "rgb tex1" [.1 .2 .9] "rgb tex2" [.9 .8 .1]
        Material "matte" "texture Kd" "checks"
        """
    )
    ps, _ = _torus_mesh_params(48, 24)
    api.shape("trianglemesh", ps)

    def run(force_stream):
        r = Renderer(api.scene, api.opt)
        if force_stream:
            tri = r.compiled.tri_data
            r.compiled.intersector = BVHIntersector(
                tri, r.compiled.sph_data, use_pallas=True,
                pallas_interpret=True,
            )
            from pbrt_tpu.ops.stream_bvh import StreamBVH

            # 48x24 torus = 2304 tris < STREAM_MIN_TRIS; force the stream
            # kernel explicitly so the derived-bary path is what renders
            mins, maxs, skips, firsts, counts, perm = build_bvh(
                tri.p0, tri.p1, tri.p2, 16
            )
            bvh = r.compiled.intersector
            bvh._pallas = StreamBVH(
                mins, maxs, skips, firsts, counts,
                tri.p0[perm], tri.p1[perm], tri.p2[perm],
                target_tris=512, interpret=True, leaf_slots=16,
            )
            bvh._slot_to_dfs = jnp.asarray(
                bvh._pallas.slot_to_prim.astype(np.int32)
            )
            bvh.perm = jnp.asarray(
                perm.astype(np.int32)[bvh._pallas.slot_to_prim]
            )
            bvh.tri_c = tuple(
                jnp.asarray(arr[:, c].copy())
                for arr in (tri.p0[perm], tri.p1[perm], tri.p2[perm])
                for c in range(3)
            )
            bvh.leaf_size = 16
        state = r.render(progress=False)
        return np.asarray(r.film.to_rgb(state))

    img_brute = run(False)
    img_stream = run(True)
    np.testing.assert_allclose(img_stream, img_brute, atol=2e-3)


def test_stream_fused_leaf_walk_matches_plain():
    """Fused-leaf traversal (leaf children intersected at the parent under
    lax.cond — ~2x fewer loop iterations on 16-slot-leaf trees) must
    produce identical hits to the plain ordered walk."""
    from pbrt_tpu.ops import stream_bvh as SB
    from pbrt_tpu.ops.stream_bvh import StreamBVH

    tri = random_mesh(2500, seed=5)
    mins, maxs, skips, firsts, counts, perm = build_bvh(
        tri.p0, tri.p1, tri.p2, 16
    )
    sb = StreamBVH(
        mins, maxs, skips, firsts, counts,
        tri.p0[perm], tri.p1[perm], tri.p2[perm],
        target_tris=700, interpret=True, leaf_slots=16,
    )
    o, d = random_rays(1024, seed=6)
    tm = jnp.full((1024,), 1e8, jnp.float32)
    args = (sb.nodes, sb.tris, sb.roots, sb.cl_min, sb.cl_max, o, d, tm)
    t1, p1 = SB.stream_traverse(*args, fused=False, leaf_slots=16,
                                interpret=True)
    t2, p2 = SB.stream_traverse(*args, fused=True, leaf_slots=16,
                                interpret=True)
    h1 = np.asarray(p1) >= 0
    np.testing.assert_array_equal(h1, np.asarray(p2) >= 0)
    np.testing.assert_allclose(
        np.asarray(t1)[h1], np.asarray(t2)[h1], rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(p1)[h1], np.asarray(p2)[h1])
