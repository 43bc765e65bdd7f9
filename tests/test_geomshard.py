"""Geometry-sharded rendering tests: triangles split over a tp mesh axis
must produce the same image as replicated geometry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pbrt_tpu import float_t
from pbrt_tpu.core.film import Film
from pbrt_tpu.core.filters import BoxFilter
from pbrt_tpu.core.transform import Transform
from pbrt_tpu.cameras import PerspectiveCamera
from pbrt_tpu.parallel.geomshard import (
    allreduce_closest,
    local_closest_hit,
    make_sharded_path_fn,
    shard_triangle_arrays,
)
from pbrt_tpu.samplers import HaltonSampler
from pbrt_tpu.shapes import TriangleData, concat_triangle_data


def make_scene_mesh(n=40):
    """A little heightfield of triangles in front of the camera."""
    rng = np.random.default_rng(7)
    xs = np.linspace(-2, 2, n)
    ys = np.linspace(-2, 2, n)
    gx, gy = np.meshgrid(xs, ys)
    gz = 0.3 * np.sin(gx * 2) * np.cos(gy * 2)
    pts = np.stack([gx, gy, gz], axis=-1)
    p0s, p1s, p2s = [], [], []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = pts[i, j], pts[i + 1, j], pts[i + 1, j + 1], pts[i, j + 1]
            p0s += [a, a]
            p1s += [b, c]
            p2s += [c, d]
    uv = np.zeros((len(p0s), 2), dtype=np.float32)
    td = TriangleData(
        p0=np.asarray(p0s, np.float32),
        p1=np.asarray(p1s, np.float32),
        p2=np.asarray(p2s, np.float32),
        uv0=uv, uv1=uv, uv2=uv,
    )
    return concat_triangle_data([td])


def build_mesh(dp, tp):
    devs = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, ("dp", "tp"))


def render_with(dp, tp, spp=2, formulation="allreduce", bvh=False,
                pallas=False):
    td = make_scene_mesh()
    t = td.count
    mats = np.zeros(t, dtype=np.int32)
    lights = np.full(t, -1, dtype=np.int32)
    shards = shard_triangle_arrays(td, mats, lights, tp, bvh=bvh,
                                   pallas=pallas)
    mesh = build_mesh(dp, tp)
    film = Film((16, 16), ((0, 0), (1, 1)), BoxFilter((0.5, 0.5)))
    cam = PerspectiveCamera(
        Transform.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]).inverse(), 50.0, (16, 16)
    )
    sampler = HaltonSampler(spp)
    kd = np.array([[0.6, 0.5, 0.4]], dtype=np.float32)
    env = np.array([0.8, 0.9, 1.0], dtype=np.float32)
    fn = make_sharded_path_fn(mesh, cam, sampler, film, kd, env, max_depth=3,
                              formulation=formulation, bvh=bvh, pallas=pallas)
    state = film.initial_state()
    pixels = film.cropped_pixel_bounds.offsets().astype(np.int32)
    # lanes = pixels x samples, divisible by the ray-sharding factor
    lane_pix = np.repeat(pixels, spp, axis=0)
    lane_sidx = np.tile(np.arange(spp, dtype=np.uint32), len(pixels))
    ray_shards = dp * tp if formulation == "ring" else dp
    n = (len(lane_pix) // ray_shards) * ray_shards
    flat = {k: np.reshape(v, (-1,) + v.shape[2:]) for k, v in shards.items()}
    state = fn(state, {k: jnp.asarray(v) for k, v in flat.items()},
               jnp.asarray(lane_pix[:n]), jnp.asarray(lane_sidx[:n]))
    return np.asarray(film.to_rgb(state))


def test_local_closest_hit_basic():
    td = make_scene_mesh(10)
    shards = shard_triangle_arrays(td, np.zeros(td.count, np.int32),
                                   np.full(td.count, -1, np.int32), 1)
    flat = {k: jnp.asarray(np.reshape(v, (-1,) + v.shape[2:])) for k, v in shards.items()}
    o = jnp.asarray(np.array([[0, 0, -3.0], [5, 5, -3.0]], np.float32))
    d = jnp.asarray(np.array([[0, 0, 1.0], [0, 0, 1.0]], np.float32))
    t, idx, b0, b1 = local_closest_hit(flat, o, d, jnp.full((2,), 1e8))
    assert idx[0] >= 0  # center ray hits the heightfield
    assert idx[1] < 0  # ray outside the grid misses


def test_sharded_matches_replicated():
    img_tp1 = render_with(dp=8, tp=1)
    img_tp4 = render_with(dp=2, tp=4)
    np.testing.assert_allclose(img_tp4, img_tp1, atol=2e-6)
    assert img_tp1.max() > 0.05  # actually rendered something


def test_sharded_deterministic_across_meshes():
    img_a = render_with(dp=4, tp=2)
    img_b = render_with(dp=2, tp=4)
    np.testing.assert_allclose(img_a, img_b, atol=2e-6)


def test_ring_matches_allreduce():
    """Ring (rays sharded over tp, ppermute packet rotation) must produce
    the same image as the all-reduce formulation — identical tie-breaks."""
    img_ar = render_with(dp=2, tp=4)
    img_ring = render_with(dp=2, tp=4, formulation="ring")
    np.testing.assert_allclose(img_ring, img_ar, atol=2e-6)
    assert img_ring.max() > 0.05


def test_ring_deterministic_across_meshes():
    img_a = render_with(dp=4, tp=2, formulation="ring")
    img_b = render_with(dp=1, tp=8, formulation="ring")
    img_c = render_with(dp=8, tp=1, formulation="ring")
    np.testing.assert_allclose(img_a, img_b, atol=2e-6)
    np.testing.assert_allclose(img_a, img_c, atol=2e-6)


def test_bvh_shards_match_brute_shards():
    """Per-shard BVH traversal (the config-5 production path) must produce
    the same image as the brute-force sweep."""
    img_brute = render_with(dp=2, tp=4)
    img_bvh = render_with(dp=2, tp=4, bvh=True)
    np.testing.assert_allclose(img_bvh, img_brute, atol=2e-6)
    assert img_bvh.max() > 0.05


def test_bvh_shards_invariant_across_meshes():
    img_a = render_with(dp=8, tp=1, bvh=True)
    img_b = render_with(dp=4, tp=2, bvh=True)
    img_c = render_with(dp=2, tp=4, bvh=True)
    np.testing.assert_allclose(img_a, img_b, atol=2e-6)
    np.testing.assert_allclose(img_a, img_c, atol=2e-6)


def test_stream_shard_kernel_matches_xla_walk():
    """The production tp path: the per-shard streaming Pallas kernel
    (interpret mode on CPU) must agree with the per-shard XLA BVH walk —
    the kernel-vs-walk equality VERDICT r3 item 2 requires before the
    sharded path can claim the fast kernel."""
    from pbrt_tpu.parallel.geomshard import _local_bvh_hit, _local_stream_hit

    td = make_scene_mesh(16)
    t = td.count
    tp = 2
    shards = shard_triangle_arrays(
        td, np.zeros(t, np.int32), np.full(t, -1, np.int32), tp, pallas=True
    )
    rng = np.random.default_rng(3)
    n = 192
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    o[:, 2] = -3.0
    tgt = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    tgt[:, 2] = 0.0
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((n,), 1e8, jnp.float32)
    for s in range(tp):
        sh = {
            k: jnp.asarray(v[s : s + 1] if k == "nn" else v[s])
            for k, v in shards.items()
        }
        t_a, i_a, b0_a, b1_a = _local_bvh_hit(sh, o, d, tmax)
        t_b, i_b, b0_b, b1_b = _local_stream_hit(sh, o, d, tmax,
                                                 interpret=True, bary=True)
        hit_a = np.asarray(i_a) >= 0
        hit_b = np.asarray(i_b) >= 0
        np.testing.assert_array_equal(hit_a, hit_b)
        np.testing.assert_allclose(
            np.asarray(t_a)[hit_a], np.asarray(t_b)[hit_a], rtol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(i_a)[hit_a], np.asarray(i_b)[hit_a]
        )
        np.testing.assert_allclose(
            np.asarray(b0_a)[hit_a], np.asarray(b0_b)[hit_a], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(b1_a)[hit_a], np.asarray(b1_b)[hit_a], atol=1e-4
        )


def test_pallas_shard_tables_cpu_fallback_renders_same():
    """pallas=True tables on the CPU mesh dispatch to the XLA walk (16-wide
    leaves) — image must match the plain bvh and brute formulations."""
    img_pl = render_with(dp=2, tp=4, pallas=True)
    img_brute = render_with(dp=2, tp=4)
    np.testing.assert_allclose(img_pl, img_brute, atol=2e-6)
    assert img_pl.max() > 0.05


def _grad_with(dp, tp, bvh=True):
    from pbrt_tpu.parallel.geomshard import make_sharded_grad_fn

    td = make_scene_mesh()
    t = td.count
    mats = np.zeros(t, dtype=np.int32)
    lights = np.full(t, -1, dtype=np.int32)
    shards = shard_triangle_arrays(td, mats, lights, tp, bvh=bvh)
    mesh = build_mesh(dp, tp)
    film = Film((16, 16), ((0, 0), (1, 1)), BoxFilter((0.5, 0.5)))
    cam = PerspectiveCamera(
        Transform.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]).inverse(), 50.0, (16, 16)
    )
    sampler = HaltonSampler(2)
    theta = {
        "kd": jnp.asarray(np.array([[0.6, 0.5, 0.4]], dtype=np.float32)),
        "env_l": jnp.asarray(np.array([0.8, 0.9, 1.0], dtype=np.float32)),
    }
    target = np.full((16, 16, 3), 0.25, dtype=np.float32)
    fn = make_sharded_grad_fn(mesh, cam, sampler, film, target, max_depth=3,
                              bvh=bvh)
    pixels = film.cropped_pixel_bounds.offsets().astype(np.int32)
    n = (len(pixels) // dp) * dp
    flat = {k: jnp.asarray(np.reshape(v, (-1,) + v.shape[2:]))
            for k, v in shards.items()}
    loss, grads = fn(theta, flat, jnp.asarray(pixels[:n]),
                     jnp.zeros((n,), dtype=jnp.uint32))
    return float(loss), jax.tree_util.tree_map(np.asarray, grads)


def test_sharded_gradients_invariant_and_nonzero():
    """Path-replay gradient step (config 5): loss and parameter gradients
    must not depend on the (dp, tp) mesh factorization, and kd/env grads
    must actually flow."""
    l_a, g_a = _grad_with(dp=8, tp=1)
    l_b, g_b = _grad_with(dp=2, tp=4)
    assert np.isfinite(l_a) and l_a > 0
    np.testing.assert_allclose(l_a, l_b, rtol=1e-4)
    np.testing.assert_allclose(g_a["kd"], g_b["kd"], rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(g_a["env_l"], g_b["env_l"], rtol=2e-3, atol=1e-5)
    assert np.abs(g_a["kd"]).max() > 0
    assert np.abs(g_a["env_l"]).max() > 0
