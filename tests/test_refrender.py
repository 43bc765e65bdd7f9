"""Whole-image parity against the independent scalar reference renderer.

``pbrt_tpu/refrender.py`` is a pure-numpy recursive path tracer that
shares nothing with the device code paths except the sampler streams
(every sampler value is a pure function of (pixel, sample, dim)).  With
matched streams both renderers walk the same paths, so images must agree
to floating-point noise — a shared systematic bias in the wavefront
machinery (MIS bookkeeping, masking, sorted-carry permutation, film
accumulation) would break this.  VERDICT r3 item 4; the reference's
golden-parity model rng.rs:132-176 applied at image level.
"""

import numpy as np
import pytest

from pbrt_tpu import Options
from pbrt_tpu.core.api import PbrtAPI
from pbrt_tpu.refrender import RefScene, look_at, render_reference
from pbrt_tpu.render import Renderer


def device_render(scene_text, xres, yres, spp):
    api = PbrtAPI(Options(ray_batch=xres * yres * spp),
                  render_on_world_end=False)
    api.init()
    api.parse_string(scene_text)
    r = Renderer(api.scene, api.opt)
    state = r.render(spp=spp, progress=False)
    img = np.asarray(r.film.to_rgb(state))
    return img, r


def sample_table(r, xres, yres, spp, n_dims):
    """Precompute the shared sampler stream, lane = (y*xres+x)*spp + s —
    the same (pixel, sample, dim) pure function the device consumed."""
    sampler = r.sampler.bounded(spp)
    ys, xs = np.mgrid[0:yres, 0:xres]
    pix = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.int32)
    pix = np.repeat(pix, spp, axis=0)
    sidx = np.tile(np.arange(spp, dtype=np.uint32), xres * yres)
    cols = [
        np.asarray(sampler.get(pix, sidx, dim), np.float64)
        for dim in range(n_dims)
    ]
    return np.stack(cols, axis=-1)


XRES = YRES = 16
SPP = 4
DEPTH = 4

GI_BOX_TEXT = f"""
LookAt 0 1 3.2  0 1 0  0 1 0
Camera "perspective" "float fov" 60
Sampler "halton" "integer pixelsamples" {SPP}
Integrator "path" "integer maxdepth" {DEPTH}
Film "image" "integer xresolution" [{XRES}] "integer yresolution" [{YRES}]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [6 6 6]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [ -0.5 2.49 -0.5   0.5 2.49 -0.5   0.5 2.49 0.5   -0.5 2.49 0.5 ]
AttributeEnd
Material "matte" "rgb Kd" [0.7 0.6 0.5]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ -2 0 -2   2 0 -2   2 0 2   -2 0 2 ]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ -2 0 -2   2 0 -2   2 2.5 -2   -2 2.5 -2 ]
WorldEnd
"""


def _quad(p):
    """indices [0 1 2, 0 2 3] tessellation of a 4-point quad (the device
    trianglemesh order)."""
    p = [np.asarray(q, np.float64) for q in p]
    return [(p[0], p[1], p[2]), (p[0], p[2], p[3])]


def _gi_box_ref():
    lq = _quad([[-0.5, 2.49, -0.5], [0.5, 2.49, -0.5],
                [0.5, 2.49, 0.5], [-0.5, 2.49, 0.5]])
    floor = _quad([[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]])
    wall = _quad([[-2, 0, -2], [2, 0, -2], [2, 2.5, -2], [-2, 2.5, -2]])
    tris = [(a, b, c, 0, 0) for a, b, c in lq]
    tris += [(a, b, c, 0, -1) for a, b, c in floor + wall]
    mats = [{"type": "matte", "kd": [0.7, 0.6, 0.5]}]
    lights = [{"type": "area", "L": [6, 6, 6], "tris": lq, "id": 0}]
    return RefScene([], tris, mats, lights)


MIRROR_TEXT = f"""
LookAt 0 1 3.2  0 1 0  0 1 0
Camera "perspective" "float fov" 60
Sampler "halton" "integer pixelsamples" {SPP}
Integrator "path" "integer maxdepth" {DEPTH}
Film "image" "integer xresolution" [{XRES}] "integer yresolution" [{YRES}]
WorldBegin
LightSource "infinite" "rgb L" [0.3 0.4 0.5]
LightSource "point" "rgb I" [8 8 8] "point from" [1.5 2.5 1.5]
Material "mirror" "rgb Kr" [0.85 0.85 0.85]
AttributeBegin
  Translate 0 1 0
  Shape "sphere" "float radius" 0.6
AttributeEnd
Material "matte" "rgb Kd" [0.6 0.6 0.6]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ -3 0 -3   3 0 -3   3 0 3   -3 0 3 ]
WorldEnd
"""


def _mirror_ref():
    floor = _quad([[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]])
    tris = [(a, b, c, 1, -1) for a, b, c in floor]
    spheres = [([0, 1, 0], 0.6, 0)]
    mats = [{"type": "mirror", "kr": [0.85, 0.85, 0.85]},
            {"type": "matte", "kd": [0.6, 0.6, 0.6]}]
    lights = [
        {"type": "infinite", "L": [0.3, 0.4, 0.5]},
        {"type": "point", "p": [1.5, 2.5, 1.5], "I": [8, 8, 8]},
    ]
    return RefScene(spheres, tris, mats, lights)


def _compare(dev, ref):
    diff = np.abs(dev - ref)
    # matched streams: images agree except where a float-epsilon direction
    # difference flips a discrete decision (an edge/occlusion boundary) —
    # allow isolated outlier pixels, bound the rest tightly
    frac_bad = float((diff.max(axis=-1) > 0.02).mean())
    assert frac_bad < 0.03, f"{frac_bad:.3f} of pixels differ by >0.02"
    assert abs(float(dev.mean() - ref.mean())) < 5e-3
    assert np.isfinite(ref).all() and ref.max() > 0.01


def test_gi_box_matches_scalar_reference():
    dev, r = device_render(GI_BOX_TEXT, XRES, YRES, SPP)
    table = sample_table(r, XRES, YRES, SPP, 5 + 7 * DEPTH)
    c2w = look_at([0, 1, 3.2], [0, 1, 0], [0, 1, 0])
    ref = render_reference(_gi_box_ref(), c2w, 60.0, XRES, YRES, SPP,
                           DEPTH, table)
    _compare(dev, ref)


def test_mirror_scene_matches_scalar_reference():
    dev, r = device_render(MIRROR_TEXT, XRES, YRES, SPP)
    table = sample_table(r, XRES, YRES, SPP, 5 + 7 * DEPTH)
    c2w = look_at([0, 1, 3.2], [0, 1, 0], [0, 1, 0])
    ref = render_reference(_mirror_ref(), c2w, 60.0, XRES, YRES, SPP,
                           DEPTH, table)
    _compare(dev, ref)


# ---------------------------------------------------------------------------
# r5 (VERDICT r4 item 5): the acceptance-scene class — checkerboard texture,
# distant (blackbody) light, mirror over textured matte — and the smooth
# dielectric path, neither of which the r4 independent check could see.
# Larger frames with the tightened outlier bound (<= 1%).
# ---------------------------------------------------------------------------


def _compare_tight(dev, ref):
    diff = np.abs(dev - ref)
    frac_bad = float((diff.max(axis=-1) > 0.02).mean())
    assert frac_bad < 0.01, f"{frac_bad:.4f} of pixels differ by >0.02"
    assert abs(float(dev.mean() - ref.mean())) < 5e-3
    assert np.isfinite(ref).all() and ref.max() > 0.01


CHECK_XRES = CHECK_YRES = 64
CHECK_SPP = 2
CHECK_DEPTH = 5  # the scene's Integrator "path" default

CHECK_SPHERE_TEXT = f"""
LookAt 3 4 1.5  .5 .5 0  0 0 1
Camera "perspective" "float fov" 45
Sampler "halton" "integer pixelsamples" {CHECK_SPP}
Integrator "path"
Film "image" "integer xresolution" [{CHECK_XRES}] "integer yresolution" [{CHECK_YRES}]
WorldBegin
LightSource "infinite" "rgb L" [.4 .45 .5]
LightSource "distant"  "point from" [ -30 40  100 ]
   "blackbody L" [3000 1.5]
AttributeBegin
  Material "mirror"
  Shape "sphere" "float radius" 1
AttributeEnd
AttributeBegin
  Texture "checks" "spectrum" "checkerboard"
          "float uscale" [8] "float vscale" [8]
          "rgb tex1" [.1 .1 .1] "rgb tex2" [.8 .8 .8]
  Material "matte" "texture Kd" "checks"
  Translate 0 0 -1
  Shape "trianglemesh"
      "integer indices" [0 1 2 0 2 3]
      "point P" [ -20 -20 0   20 -20 0   20 20 0   -20 20 0 ]
      "float st" [ 0 0   1 0    1 1   0 1 ]
AttributeEnd
WorldEnd
"""


def test_blackbody_conversion_independent():
    """The scalar renderer's Planck + CIE-fit blackbody agrees with the
    device's binned-CIE conversion — different tables, same physics."""
    from pbrt_tpu.core import spectrum as S
    from pbrt_tpu.refrender import blackbody_rgb

    for temp in (3000.0, 6500.0):
        ref = blackbody_rgb(temp, 1.5)
        dev = np.asarray(S.blackbody_to_rgb(temp, 1.5))
        # luminance-relative agreement; the fit vs the 60-bin tables
        # differ by a few percent per channel
        assert np.abs(dev - ref).max() / max(dev.max(), 1e-6) < 0.08, (
            temp, dev, ref
        )


def test_check_sphere_matches_scalar_reference():
    """BASELINE config 1, literally: the reference's acceptance scene
    (scenes/check-sphere.pbrt) at 64x64 with matched sample streams."""
    from pbrt_tpu.core import spectrum as S

    dev, r = device_render(CHECK_SPHERE_TEXT, CHECK_XRES, CHECK_YRES, CHECK_SPP)
    table = sample_table(r, CHECK_XRES, CHECK_YRES, CHECK_SPP,
                         5 + 7 * CHECK_DEPTH)
    c2w = look_at([3, 4, 1.5], [0.5, 0.5, 0], [0, 0, 1])
    # the blackbody RGB enters the ref scene as the device-computed
    # constant: test_blackbody_conversion_independent pins the conversion
    # itself against the independent Planck+CIE-fit implementation, so
    # stream parity here isolates transport/texture/light-sampling
    sun = np.asarray(S.blackbody_to_rgb(3000.0, 1.5), np.float64)
    uv = [np.array([0.0, 0.0]), np.array([1.0, 0.0]),
          np.array([1.0, 1.0]), np.array([0.0, 1.0])]
    pq = [np.array([-20.0, -20.0, -1.0]), np.array([20.0, -20.0, -1.0]),
          np.array([20.0, 20.0, -1.0]), np.array([-20.0, 20.0, -1.0])]
    tris = [
        (pq[0], pq[1], pq[2], 1, -1, uv[0], uv[1], uv[2]),
        (pq[0], pq[2], pq[3], 1, -1, uv[0], uv[2], uv[3]),
    ]
    mats = [
        {"type": "mirror", "kr": [0.9, 0.9, 0.9]},
        {"type": "matte",
         "checker": {"su": 8.0, "sv": 8.0,
                     "tex1": [0.1, 0.1, 0.1], "tex2": [0.8, 0.8, 0.8]}},
    ]
    lights = [
        {"type": "infinite", "L": [0.4, 0.45, 0.5]},
        # distant: dir = from - to with the factory default to = (0,0,1)
        {"type": "distant", "dir": [-30.0, 40.0, 99.0], "L": sun},
    ]
    ref_scene = RefScene([([0, 0, 0], 1.0, 0)], tris, mats, lights)
    ref = render_reference(ref_scene, c2w, 45.0, CHECK_XRES, CHECK_YRES,
                           CHECK_SPP, CHECK_DEPTH, table)
    _compare_tight(dev, ref)


GLASS_XRES = GLASS_YRES = 32
GLASS_SPP = 4
GLASS_DEPTH = 5

GLASS_TEXT = f"""
LookAt 0 1.2 3.0  0 0.6 0  0 1 0
Camera "perspective" "float fov" 55
Sampler "halton" "integer pixelsamples" {GLASS_SPP}
Integrator "path" "integer maxdepth" {GLASS_DEPTH}
Film "image" "integer xresolution" [{GLASS_XRES}] "integer yresolution" [{GLASS_YRES}]
WorldBegin
LightSource "infinite" "rgb L" [0.3 0.35 0.4]
LightSource "point" "rgb I" [10 10 10] "point from" [2 3 2]
AttributeBegin
  Material "glass"
  Translate 0 0.8 0
  Shape "sphere" "float radius" 0.5
AttributeEnd
Material "matte" "rgb Kd" [0.55 0.5 0.45]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ -4 0 -4   4 0 -4   4 0 4   -4 0 4 ]
WorldEnd
"""


def test_glass_scene_matches_scalar_reference():
    """Smooth dielectric with matched streams: Fresnel reflect/refract
    choice, TIR, radiance-transport eta^2 scaling — the code path the
    r4 independent check could not see."""
    dev, r = device_render(GLASS_TEXT, GLASS_XRES, GLASS_YRES, GLASS_SPP)
    table = sample_table(r, GLASS_XRES, GLASS_YRES, GLASS_SPP,
                         5 + 7 * GLASS_DEPTH)
    c2w = look_at([0, 1.2, 3.0], [0, 0.6, 0], [0, 1, 0])
    floor = _quad([[-4, 0, -4], [4, 0, -4], [4, 0, 4], [-4, 0, 4]])
    tris = [(a, b, c, 1, -1) for a, b, c in floor]
    mats = [
        {"type": "glass", "kr": [1, 1, 1], "kt": [1, 1, 1], "eta": 1.5},
        {"type": "matte", "kd": [0.55, 0.5, 0.45]},
    ]
    lights = [
        {"type": "infinite", "L": [0.3, 0.35, 0.4]},
        {"type": "point", "p": [2, 3, 2], "I": [10, 10, 10]},
    ]
    ref_scene = RefScene([([0, 0.8, 0], 0.5, 0)], tris, mats, lights)
    ref = render_reference(ref_scene, c2w, 55.0, GLASS_XRES, GLASS_YRES,
                           GLASS_SPP, GLASS_DEPTH, table)
    _compare_tight(dev, ref)
