"""Motion blur: animated transforms actually render (VERDICT r2 item 6).

The reference keeps the 2-slot TransformSet + ActiveTransform/
TransformTimes machinery (api.rs:157-198) and parses shutteropen/close but
renders nothing; here the machinery drives keyframed geometry and camera
motion.  Acceptance (per the round-2 verdict): a blurred render must equal
the average of static renders at interpolated transform times, within
noise.
"""

import numpy as np
import pytest

from pbrt_tpu import Options
from pbrt_tpu.core.api import PbrtAPI
from pbrt_tpu.core.transform import Transform
from pbrt_tpu.render import render_scene


def _render(text, spp_note=""):
    api = PbrtAPI(Options(ray_batch=1 << 14), render_on_world_end=False)
    api.init()
    api.parse_string(text)
    return render_scene(api.scene, api.opt, write=False)["image"]


def test_animated_transform_decompose_slerp():
    from pbrt_tpu.core.animated import AnimatedTransform

    start = Transform.translate([1.0, 0.0, 0.0]) * Transform.rotate_z(0.0)
    end = Transform.translate([3.0, 2.0, 0.0]) * Transform.rotate_z(90.0)
    at = AnimatedTransform(start, end)
    assert at.actually_animated
    np.testing.assert_allclose(at.interpolate(0.0).m, start.m, atol=1e-6)
    np.testing.assert_allclose(at.interpolate(1.0).m, end.m, atol=1e-6)
    mid = at.interpolate(0.5)
    want = Transform.translate([2.0, 1.0, 0.0]) * Transform.rotate_z(45.0)
    np.testing.assert_allclose(mid.m, want.m, atol=1e-5)
    # rotation angle drives the keyframe count
    assert at.n_keys() >= 3
    assert AnimatedTransform(start, start).n_keys() == 1


MOVING_QUAD = """
LookAt 0 0 -5  0 0 0  0 1 0
Camera "perspective" "float fov" 50 "float shutteropen" 0 "float shutterclose" 1
Sampler "halton" "integer pixelsamples" 64
Integrator "path" "integer maxdepth" 2
Film "image" "integer xresolution" [24] "integer yresolution" [24]
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
Material "matte" "rgb Kd" [0.9 0.2 0.2]
TransformBegin
{motion}
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-0.8 -0.8 0  0.8 -0.8 0  0.8 0.8 0  -0.8 0.8 0]
TransformEnd
WorldEnd
"""


def test_moving_quad_equals_average_of_static_renders():
    """Translating quad: blurred render == average of static renders at
    stratified shutter times (translation => interpolation is exact)."""
    blurred = _render(
        MOVING_QUAD.format(
            motion=(
                "ActiveTransform EndTime\nTranslate 1.5 0 0\n"
                "ActiveTransform All"
            )
        )
    )
    k = 8
    acc = None
    for i in range(k):
        t = (i + 0.5) / k
        img = _render(MOVING_QUAD.format(motion=f"Translate {1.5 * t} 0 0"))
        acc = img if acc is None else acc + img
    avg = acc / k
    # red channel integrates motion; compare per-row means (robust to the
    # sub-pixel differences between stratified-time sets)
    np.testing.assert_allclose(
        blurred.mean(axis=1), avg.mean(axis=1), atol=0.03
    )
    # blur actually happened: the smeared band is wider than any static
    # one (the quad reads as low-green against the white environment)
    static0 = _render(MOVING_QUAD.format(motion="Translate 0 0 0"))
    quad_cols_blur = (blurred[12, :, 1] < 0.8).sum()
    quad_cols_static = (static0[12, :, 1] < 0.8).sum()
    assert quad_cols_blur > quad_cols_static


def test_moving_sphere_blur():
    """Animated sphere (tessellated to keyframed triangles): blurred
    render matches the average of interpolated static renders."""
    tmpl = """
    LookAt 0 0 -5  0 0 0  0 1 0
    Camera "perspective" "float fov" 50
    Sampler "halton" "integer pixelsamples" 64
    Integrator "path" "integer maxdepth" 2
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    WorldBegin
    LightSource "infinite" "rgb L" [1 1 1]
    Material "matte" "rgb Kd" [0.2 0.8 0.3]
    AttributeBegin
    {motion}
    Shape "sphere" "float radius" 0.7
    AttributeEnd
    WorldEnd
    """
    blurred = _render(
        tmpl.format(
            motion=(
                "ActiveTransform EndTime\nTranslate 1.2 0 0\n"
                "ActiveTransform All"
            )
        )
    )
    k = 6
    acc = None
    for i in range(k):
        t = (i + 0.5) / k
        acc_i = _render(tmpl.format(motion=f"Translate {1.2 * t} 0 0"))
        acc = acc_i if acc is None else acc + acc_i
    avg = acc / k
    np.testing.assert_allclose(blurred.mean(axis=1), avg.mean(axis=1), atol=0.03)


def test_camera_motion_blur():
    """Animated camera-to-world: the static quad smears across the film."""
    tmpl = """
    {motion}
    LookAt 0 0 -5  0 0 0  0 1 0
    Camera "perspective" "float fov" 50
    Sampler "halton" "integer pixelsamples" 32
    Integrator "path" "integer maxdepth" 2
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    WorldBegin
    LightSource "infinite" "rgb L" [1 1 1]
    Material "matte" "rgb Kd" [0.9 0.2 0.2]
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-0.8 -0.8 0  0.8 -0.8 0  0.8 0.8 0  -0.8 0.8 0]
    WorldEnd
    """
    blurred = _render(
        tmpl.format(
            motion=(
                "ActiveTransform EndTime\nTranslate 1.5 0 0\n"
                "ActiveTransform All"
            )
        )
    )
    static = _render(tmpl.format(motion=""))
    row = 12
    assert (blurred[row, :, 1] < 0.8).sum() > (static[row, :, 1] < 0.8).sum()
    # energy conserved: equal mean brightness within noise
    np.testing.assert_allclose(blurred.mean(), static.mean(), atol=0.05)


def test_animated_bvh_matches_brute_sweep():
    """Shutter-union BVH culling must produce exactly the same hits as
    the full keyframed sweep at arbitrary lane times."""
    import jax.numpy as jnp

    from pbrt_tpu.ops.animated_intersect import AnimatedTriIntersector
    from pbrt_tpu.shapes import TriangleData, concat_triangle_data

    rng = np.random.default_rng(3)
    n_tri = 300
    base = rng.uniform(-5, 5, (n_tri, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.7, (n_tri, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.7, (n_tri, 3)).astype(np.float32)
    vel = rng.normal(0, 1.5, (n_tri, 3)).astype(np.float32)
    uv = np.zeros((n_tri, 2), np.float32)

    def key(t):
        off = vel * t
        return concat_triangle_data([TriangleData(
            p0=base + off, p1=base + e1 + off, p2=base + e2 + off,
            uv0=uv, uv1=uv, uv2=uv,
        )])

    keys = [key(0.0), key(0.5), key(1.0)]
    fast = AnimatedTriIntersector(keys)
    assert fast._bvh is not None
    try:
        AnimatedTriIntersector.BVH_MIN_TRIS = 10**9  # force the scan sweep
        slow = AnimatedTriIntersector(keys)
    finally:
        AnimatedTriIntersector.BVH_MIN_TRIS = 64
    assert slow._bvh is None

    n = 1024
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tm = jnp.full((n,), 1e8, jnp.float32)
    time = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    hf = fast.intersect(o, d, tm, time)
    hs = slow.intersect(o, d, tm, time)
    np.testing.assert_array_equal(np.asarray(hf["hit"]), np.asarray(hs["hit"]))
    m = np.asarray(hs["hit"])
    # einsum vs scalar-sum blend reassociate the fma chain: ~1 ulp drift
    np.testing.assert_allclose(
        np.asarray(hf["t"])[m], np.asarray(hs["t"])[m], rtol=2e-4, atol=1e-6
    )
    assert (np.asarray(hf["prim"])[m] == np.asarray(hs["prim"])[m]).mean() > 0.99, (
        np.asarray(hf["prim"])[m][:8], np.asarray(hs["prim"])[m][:8])
