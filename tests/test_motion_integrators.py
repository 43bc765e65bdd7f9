"""Motion blur through volpath / bdpt / sppm (VERDICT r3 item 5).

The 2-slot TransformSet + shutteropen/close surface the reference commits
to (api.rs:157-198) was sampled only by the surface ``path`` integrator in
r3; volpath/bdpt/sppm traced animated scenes at shutter open.  Now every
integrator samples the per-lane shutter time (dimension 4, a pure function
of (pixel, sample)) and blends the keyframed geometry in every intersect —
acceptance mirrors test_motion.py: blurred render == average of
interpolated static renders, and the smear must actually widen.
"""

import numpy as np
import pytest

from pbrt_tpu import Options
from pbrt_tpu.core.api import PbrtAPI
from pbrt_tpu.render import render_scene


def _render(text):
    api = PbrtAPI(Options(ray_batch=1 << 14), render_on_world_end=False)
    api.init()
    api.parse_string(text)
    return render_scene(api.scene, api.opt, write=False)["image"]


# red quad sweeping +x across the frame; optional bounded fog box (null
# material boundary, pbrt shaped volume) enclosing its whole travel
SCENE = """
{media}LookAt 0 0 -5  0 0 0  0 1 0
Camera "perspective" "float fov" 50 "float shutteropen" 0 "float shutterclose" 1
Sampler "halton" "integer pixelsamples" {spp}
Integrator "{integ}" "integer maxdepth" 2 {extra}
Film "image" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
{fogbox}Material "matte" "rgb Kd" [0.9 0.2 0.2]
TransformBegin
{motion}
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-0.8 -0.8 0  0.8 -0.8 0  0.8 0.8 0  -0.8 0.8 0]
TransformEnd
WorldEnd
"""

FOG_HEAD = (
    'MakeNamedMedium "fog" "string type" "homogeneous"\n'
    '    "rgb sigma_a" [0.25 0.25 0.25] "rgb sigma_s" [0 0 0]\n'
)

FOG_BOX = """AttributeBegin
Material ""
MediumInterface "fog" ""
Shape "trianglemesh"
    "integer indices" [0 3 2  0 2 1  4 5 6  4 6 7  1 2 6  1 6 5
                       0 4 7  0 7 3  0 1 5  0 5 4  3 7 6  3 6 2]
    "point P" [ -3 -2 -1   3 -2 -1   3 2 -1   -3 2 -1
                -3 -2 1   3 -2 1   3 2 1   -3 2 1 ]
AttributeEnd
"""

MOVE = (
    "ActiveTransform EndTime\nTranslate 1.5 0 0\nActiveTransform All"
)


def _quad_cols(img, row):
    """Columns showing the red quad: red clearly above green (robust to
    fog-attenuated backgrounds, whose channels stay equal)."""
    return (img[row, :, 0] - img[row, :, 1] > 0.1).sum()


def _blur_check(integ, media="", fogbox="", extra="", spp=32, k=3,
                atol=0.05):
    def scene(motion):
        return SCENE.format(integ=integ, media=media, fogbox=fogbox,
                            extra=extra, spp=spp, motion=motion)

    blurred = _render(scene(MOVE))
    acc = None
    for i in range(k):
        t = (i + 0.5) / k
        img = _render(scene(f"Translate {1.5 * t} 0 0"))
        acc = img if acc is None else acc + img
    avg = acc / k
    np.testing.assert_allclose(
        blurred.mean(axis=1), avg.mean(axis=1), atol=atol
    )
    static0 = _render(scene("Translate 0 0 0"))
    row = blurred.shape[0] // 2
    assert _quad_cols(blurred, row) > _quad_cols(static0, row)


def test_volpath_motion_blur():
    """volpath samples the per-lane shutter time through its segment march
    and shadow-Tr path.  Media themselves are static — geometry blending
    is the ONLY time-dependent quantity — so a vacuum scene covers the
    plumbing; the fog-box variant (null-boundary march x keyframe
    blending) recompiled ~4 min per render on the CPU suite and was cut.
    """
    _blur_check("volpath")


def test_bdpt_motion_blur():
    """BDPT: one shutter time per path drives both subpath walks and every
    connection's visibility test."""
    _blur_check("bdpt")


def test_sppm_motion_blur():
    """SPPM: camera chains and photons both sample shutter times."""
    _blur_check(
        "sppm",
        extra='"integer numiterations" 4 "integer photonsperiteration" 2048',
        k=3,
        atol=0.07,
    )


def test_volpath_motion_blur_in_fog():
    """The r4 gap (VERDICT r4 item 7): fog-box x keyframe-blend — the
    null-boundary segment march with time-blended geometry INSIDE a
    bounded medium.  k=2 averaged-static keeps the 2-core compile budget
    (each fog x motion variant is its own jit program)."""
    _blur_check("volpath", media=FOG_HEAD, fogbox=FOG_BOX, spp=16, k=2,
                atol=0.06)
