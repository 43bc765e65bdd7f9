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
