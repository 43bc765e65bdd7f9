"""SPPM integrator: agreement with the path tracer on a simple GI scene."""

import numpy as np
import pytest

from pbrt_tpu import Options
from pbrt_tpu.core.api import PbrtAPI
from pbrt_tpu.render import render_scene

BOX = """
LookAt 0 1 4  0 1 0  0 1 0
Camera "perspective" "float fov" 60
Sampler "halton" "integer pixelsamples" 32
Integrator "{integ}" {extra} "integer maxdepth" 4
Film "image" "integer xresolution" [24] "integer yresolution" [24]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [8 8 8]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [ -0.5 2.49 -0.5   0.5 2.49 -0.5   0.5 2.49 0.5   -0.5 2.49 0.5 ]
AttributeEnd
Material "matte" "rgb Kd" [0.7 0.7 0.7]
# floor
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ -2.5 0 -2.5   2.5 0 -2.5   2.5 0 2.5   -2.5 0 2.5 ]
# back wall
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ -2.5 0 -2.5   2.5 0 -2.5   2.5 2.5 -2.5   -2.5 2.5 -2.5 ]
WorldEnd
"""


def render(integ, extra=""):
    api = PbrtAPI(Options(ray_batch=24 * 24 * 32), render_on_world_end=False)
    api.init()
    api.parse_string(BOX.format(integ=integ, extra=extra))
    return render_scene(api.scene, api.opt, write=False)["image"]


def test_sppm_matches_path_tracer():
    path_img = render("path")
    sppm_img = render(
        "sppm",
        '"integer numiterations" 24 "integer photonsperiteration" 16384',
    )
    assert np.isfinite(sppm_img).all()
    # compare mean radiance over the directly-lit floor region
    p = path_img[14:22, 6:18].mean()
    s = sppm_img[14:22, 6:18].mean()
    assert s > 0.01
    np.testing.assert_allclose(s, p, rtol=0.30)
    # direct emitter view matches closely (same camera machinery)
    bright_p = path_img.max()
    bright_s = sppm_img.max()
    np.testing.assert_allclose(bright_s, bright_p, rtol=0.05)


GLOSSY_BOX = BOX.replace(
    'Material "matte" "rgb Kd" [0.7 0.7 0.7]',
    'Material "plastic" "rgb Kd" [0.5 0.5 0.5] "rgb Ks" [0.4 0.4 0.4]'
    ' "float roughness" 0.2',
)


def test_sppm_glossy_gather_matches_path_tracer():
    """Non-matte scenes route through the full-BSDF photon gather
    (f(wo, wi_photon) per photon, pbrt sppm.cpp Phi) instead of the
    Lambertian kd/pi shortcut; radiance must still agree with the
    unidirectional path tracer."""
    from pbrt_tpu.integrators.sppm import SPPMIntegrator
    from pbrt_tpu.scene.builder import build_scene

    def render_g(integ, extra=""):
        api = PbrtAPI(Options(ray_batch=24 * 24 * 32), render_on_world_end=False)
        api.init()
        api.parse_string(GLOSSY_BOX.format(integ=integ, extra=extra))
        return api

    api = render_g(
        "sppm", '"integer numiterations" 12 "integer photonsperiteration" 8192'
    )
    compiled = build_scene(api.scene, api.opt)
    assert SPPMIntegrator(compiled)._gather_full_bsdf, (
        "plastic scene must select the full-BSDF gather"
    )
    # matte-only scene keeps the exact Lambertian shortcut
    api_m = PbrtAPI(Options(ray_batch=24 * 24 * 32), render_on_world_end=False)
    api_m.init()
    api_m.parse_string(BOX.format(integ="sppm", extra=""))
    assert not SPPMIntegrator(build_scene(api_m.scene, api_m.opt))._gather_full_bsdf

    sppm_img = render_scene(api.scene, api.opt, write=False)["image"]
    api_p = render_g("path")
    path_img = render_scene(api_p.scene, api_p.opt, write=False)["image"]
    assert np.isfinite(sppm_img).all()
    s = sppm_img[14:22, 6:18].mean()
    p = path_img[14:22, 6:18].mean()
    assert s > 0.01
    np.testing.assert_allclose(s, p, rtol=0.30)


def test_bdpt_matches_path_tracer():
    path_img = render("path")
    api = PbrtAPI(Options(ray_batch=24 * 24 * 32), render_on_world_end=False)
    api.init()
    api.parse_string(BOX.format(integ="bdpt", extra=""))
    out = render_scene(api.scene, api.opt, write=False)
    bdpt_img = out["image"]
    assert np.isfinite(bdpt_img).all()
    p = path_img[14:22, 6:18].mean()
    b = bdpt_img[14:22, 6:18].mean()
    np.testing.assert_allclose(b, p, rtol=0.05)
    # whole-image energy agreement (every (s,t) strategy weighted right)
    np.testing.assert_allclose(bdpt_img.mean(), path_img.mean(), rtol=0.04)
    # the light-tracing (t=1) strategies actually splatted energy
    splat = np.abs(np.asarray(out["state"]["splat_xyz"])).sum()
    assert splat > 0.0, "BDPT light-tracing splats missing"


POINT_BOX = """
LookAt 0 1 4  0 1 0  0 1 0
Camera "perspective" "float fov" 60
Sampler "halton" "integer pixelsamples" 32
Integrator "{integ}" "integer maxdepth" 4
Film "image" "integer xresolution" [24] "integer yresolution" [24]
WorldBegin
LightSource "point" "rgb I" [6 6 6] "point from" [0 2.2 0]
Material "matte" "rgb Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ -2.5 0 -2.5   2.5 0 -2.5   2.5 0 2.5   -2.5 0 2.5 ]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [ -2.5 0 -2.5   2.5 0 -2.5   2.5 2.5 -2.5   -2.5 2.5 -2.5 ]
WorldEnd
"""


def test_bdpt_point_light_matches_path():
    """Point lights: delta origin (s'=0 partition excluded) but traceable
    (s>=2 and t=1 strategies live); totals must still match."""
    def render_pt(integ):
        api = PbrtAPI(Options(ray_batch=24 * 24 * 32), render_on_world_end=False)
        api.init()
        api.parse_string(POINT_BOX.format(integ=integ))
        return render_scene(api.scene, api.opt, write=False)["image"]

    path_img = render_pt("path")
    bdpt_img = render_pt("bdpt")
    assert np.isfinite(bdpt_img).all()
    np.testing.assert_allclose(bdpt_img.mean(), path_img.mean(), rtol=0.05)
    c = (slice(14, 22), slice(6, 18))
    np.testing.assert_allclose(bdpt_img[c].mean(), path_img[c].mean(), rtol=0.06)


def test_mlt_matches_path_tracer():
    path_img = render("path")
    mlt_img = render("mlt")
    assert np.isfinite(mlt_img).all()
    p = path_img[14:22, 6:18].mean()
    m = mlt_img[14:22, 6:18].mean()
    np.testing.assert_allclose(m, p, rtol=0.10)
