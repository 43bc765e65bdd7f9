"""DirectLighting / Whitted / AO integrator semantics (pbrt-v3 §14.3).

The reference names these integrators through its defaults
(/root/reference/src/core/api.rs:244) but never builds them; pbrt-v3's
semantics are the parity target:

* directlighting == path restricted to one shading vertex (exact equality
  on a purely diffuse scene — both run the identical wavefront program),
  and strictly darker than full path on a strong-indirect scene.
* whitted == directlighting when there are no area/env lights (delta
  lights make the MIS pair degenerate), and follows mirror chains.
* ao matches closed-form visibility: 1 in the open, 0 inside a closed box.
"""

import numpy as np

from pbrt_tpu import Options
from pbrt_tpu.core.api import PbrtAPI
from pbrt_tpu.render import render_scene

HEAD = """
LookAt 0 1 4  0 1 0  0 1 0
Camera "perspective" "float fov" 60
Sampler "halton" "integer pixelsamples" 16
Integrator "{integ}" {extra}
Film "image" "integer xresolution" [20] "integer yresolution" [20]
WorldBegin
"""

# closed high-albedo GI box lit by a ceiling area light: interreflection
# carries a large share of the total radiance
DIFFUSE_BOX = HEAD + """
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [8 8 8]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [ -0.5 2.49 -0.5   0.5 2.49 -0.5   0.5 2.49 0.5   -0.5 2.49 0.5 ]
AttributeEnd
Material "matte" "rgb Kd" [0.9 0.9 0.9]
# floor
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ -2.5 0 -2.5   2.5 0 -2.5   2.5 0 2.5   -2.5 0 2.5 ]
# ceiling
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ -2.5 2.5 -2.5   2.5 2.5 -2.5   2.5 2.5 2.5   -2.5 2.5 2.5 ]
# back wall
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ -2.5 0 -2.5   2.5 0 -2.5   2.5 2.5 -2.5   -2.5 2.5 -2.5 ]
# left / right walls
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ -2.5 0 -2.5   -2.5 0 2.5   -2.5 2.5 2.5   -2.5 2.5 -2.5 ]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ 2.5 0 -2.5   2.5 0 2.5   2.5 2.5 2.5   2.5 2.5 -2.5 ]
WorldEnd
"""

# mirror sphere over a diffuse floor, delta (point) light only
MIRROR_POINT = HEAD + """
LightSource "point" "rgb I" [20 20 20] "point from" [0 2.2 1]
Material "mirror" "rgb Kr" [0.9 0.9 0.9]
AttributeBegin
  Translate 0 1 0
  Shape "sphere" "float radius" 0.6
AttributeEnd
Material "matte" "rgb Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ -2.5 0 -2.5   2.5 0 -2.5   2.5 0 2.5   -2.5 0 2.5 ]
WorldEnd
"""


def render(integ, scene, extra='"integer maxdepth" 5', seed=0):
    api = PbrtAPI(Options(ray_batch=20 * 20 * 16), render_on_world_end=False)
    api.init()
    api.parse_string(scene.format(integ=integ, extra=extra))
    return render_scene(api.scene, api.opt, seed=seed, write=False)["image"]


def test_directlighting_equals_depth2_path_on_diffuse_scene():
    """On a purely diffuse scene every directlighting lane dies after its
    emission-only segment, so the wavefront program is identical to path
    with maxdepth=2 — images must agree exactly (same sampler streams)."""
    dl = render("directlighting", DIFFUSE_BOX)  # maxdepth 5: must not GI
    p2 = render("path", DIFFUSE_BOX, extra='"integer maxdepth" 2')
    np.testing.assert_allclose(dl, p2, atol=1e-6)


def test_directlighting_excludes_indirect():
    """maxdepth>2 must NOT turn directlighting into a path tracer (the r3
    regression: it silently rendered full GI)."""
    dl = render("directlighting", DIFFUSE_BOX)
    full = render("path", DIFFUSE_BOX)
    # indirect bounce light off the 0.7-albedo walls is a large fraction
    # of total radiance in a box; direct-only must be clearly darker
    assert dl.mean() < full.mean() * 0.9
    assert np.all(dl <= full + 1e-4)


def test_whitted_equals_directlighting_on_delta_light_scene():
    """With only a point light the MIS pair degenerates (w=1 light term,
    no emission to gather), so Whitted and DirectLighting coincide."""
    wh = render("whitted", MIRROR_POINT)
    dl = render("directlighting", MIRROR_POINT)
    np.testing.assert_allclose(wh, dl, atol=1e-6)


def test_whitted_mirror_chain():
    """The mirror sphere must reflect the lit floor (specular recursion),
    and removing the sphere's reflection (maxdepth=2 kills the chain after
    the camera hit... depth 2 still shades the mirror vertex) — compare
    center pixels against the no-recursion render."""
    wh = render("whitted", MIRROR_POINT, extra='"integer maxdepth" 5')
    # sphere center of the 20x20 frame: camera looks at (0,1,0), sphere
    # there; mirror shows floor/background
    center = wh[8:12, 8:12]
    assert np.isfinite(wh).all()
    assert center.mean() > 0.01  # reflected lit floor, not black
    # direct lighting on the floor region follows inverse-square from the
    # point light; just assert the floor is lit
    assert wh[17:20, :].mean() > 0.05


def test_whitted_no_diffuse_interreflection():
    wh = render("whitted", DIFFUSE_BOX)
    full = render("path", DIFFUSE_BOX)
    assert wh.mean() < full.mean() * 0.9


AO_OPEN = HEAD + """
Material "matte" "rgb Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ -50 0 -50   50 0 -50   50 0 50   -50 0 50 ]
WorldEnd
"""

# camera fully enclosed: unit-ish box around the LookAt eye point
AO_CLOSED = HEAD + """
Material "matte" "rgb Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3  4 6 5 4 7 6  0 4 1 1 4 5  2 6 3 3 6 7  0 3 4 3 7 4  1 5 2 2 5 6]
  "point P" [ -3 -1 2   3 -1 2   3 -1 6   -3 -1 6
              -3 3 2    3 3 2    3 3 6    -3 3 6 ]
WorldEnd
"""


def test_ao_open_plane_is_unoccluded():
    img = render("ao", AO_OPEN, extra='"integer nsamples" 2')
    # bottom rows see the plane with an empty hemisphere above -> exactly 1
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img[16:, :], 1.0, atol=1e-6)
    # background (no hit) stays white
    np.testing.assert_allclose(img[0, 0], 1.0, atol=1e-6)


def test_ao_closed_box_is_black():
    img = render("ao", AO_CLOSED, extra='"integer nsamples" 2')
    np.testing.assert_allclose(img, 0.0, atol=1e-6)
