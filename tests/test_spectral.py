"""Sampled-spectrum render mode (the reference's `sampled-spectrum` cargo
feature, Cargo.toml:26-28 / spectrum.rs:151-193, implemented as full
spectral transport decomposed into per-bin passes)."""

import numpy as np
import pytest

from pbrt_tpu import Options
from pbrt_tpu.core.api import PbrtAPI
from pbrt_tpu.core import spectrum as S
from pbrt_tpu.render import render_scene

SCENE = """
LookAt 0 0 -3  0 0 0  0 1 0
Camera "perspective" "float fov" 40
Sampler "halton" "integer pixelsamples" 16
Integrator "path" "integer maxdepth" %d
Film "image" "integer xresolution" [12] "integer yresolution" [12]
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
Material "matte" "rgb Kd" [%s]
Shape "sphere" "float radius" 1
WorldEnd
"""


def _render(kd, spectral, maxdepth=2, n_bins=15):
    api = PbrtAPI(Options(ray_batch=4096), render_on_world_end=False)
    api.init()
    api.parse_string(SCENE % (maxdepth, kd))
    opt = Options(ray_batch=4096, sampled_spectrum=spectral,
                  n_spectral_bins=n_bins)
    return render_scene(api.scene, opt, seed=0, write=False)["image"]


def test_promotion_roundtrip_xyz_exact():
    """Illuminant promotion preserves XYZ directly; reflectance promotion
    preserves XYZ as viewed under the illuminant white (pbrt's
    RGBIllum2Spect / RGBRefl2Spect split)."""
    cols = np.array([[0.8, 0.3, 0.1], [0.2, 0.6, 0.9], [1, 1, 1], [0, 0, 0]])
    back_i = S.sampled_to_rgb(S.rgb_to_sampled(cols, illuminant=True))
    np.testing.assert_allclose(back_i, cols, atol=5e-3)
    w = S.rgb_to_sampled(np.ones(3), illuminant=True)
    back_r = S.sampled_to_rgb(w * S.rgb_to_sampled(cols))
    np.testing.assert_allclose(back_r, cols, atol=5e-3)
    # white reflectance is near-flat (ridge term leaves <2% ripple), so
    # gray products compose almost exactly
    flat = S.rgb_to_sampled(np.ones(3))
    np.testing.assert_allclose(flat, 1.0, atol=0.02)


def test_spectral_matches_rgb_for_gray_scene():
    """Gray albedo under a white light: spectral transport must agree with
    RGB transport (flat spectra make the bin decomposition trivial)."""
    img_rgb = _render("0.5 0.5 0.5", spectral=False)
    img_spec = _render("0.5 0.5 0.5", spectral=True)
    c = (slice(3, 9), slice(3, 9))
    np.testing.assert_allclose(img_spec[c], img_rgb[c], atol=0.02)


def test_spectral_close_to_rgb_single_bounce_saturated():
    """One reflection of a saturated color: promotion is XYZ-exact, so the
    spectral result matches RGB up to the white-basis flatness error."""
    img_rgb = _render("0.8 0.2 0.1", spectral=False)
    img_spec = _render("0.8 0.2 0.1", spectral=True)
    c = (slice(3, 9), slice(3, 9))
    np.testing.assert_allclose(
        img_spec[c].mean(axis=(0, 1)), img_rgb[c].mean(axis=(0, 1)), atol=0.03
    )


def test_spectral_multibounce_saturates_more():
    """Double reflection of a saturated red: the spectral product S_red^2
    is *more* saturated than the RGB product (the physically expected
    difference), and overall energy stays comparable."""
    img_rgb = _render("0.9 0.25 0.15", spectral=False, maxdepth=4)
    img_spec = _render("0.9 0.25 0.15", spectral=True, maxdepth=4)
    c = (slice(3, 9), slice(3, 9))
    m_rgb = img_rgb[c].mean(axis=(0, 1))
    m_spec = img_spec[c].mean(axis=(0, 1))
    np.testing.assert_allclose(m_spec, m_rgb, atol=0.06)
    # saturation ratio (r / g) should not decrease under spectral transport
    assert m_spec[0] / max(m_spec[1], 1e-6) >= 0.95 * m_rgb[0] / max(m_rgb[1], 1e-6)


def test_spectral_context_always_cleared():
    with pytest.raises(ValueError):
        _render("0.5 0.5 0.5", spectral=True, n_bins=14)
    assert S.get_spectral_bins() is None


def test_spectral_deterministic():
    a = _render("0.4 0.5 0.6", spectral=True)
    b = _render("0.4 0.5 0.6", spectral=True)
    np.testing.assert_array_equal(a, b)
