"""Math-core parity tests, mirroring the reference's doctests.

Sources: src/lib.rs doctests (clamp/lerp/quadratic), transform.rs doctests
(translate/rotate/scale/look_at), spectrum.rs matrices.
"""

import numpy as np
import pytest

import pbrt_tpu
from pbrt_tpu import clamp, gamma_correct, inverse_gamma_correct, lerp, quadratic
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core.geometry import Bounds2i
from pbrt_tpu.core.transform import Transform


def test_clamp():
    assert clamp(-1.0, 0.0, 1.0) == 0.0
    assert clamp(0.5, 0.0, 1.0) == 0.5
    assert clamp(2.0, 0.0, 1.0) == 1.0
    assert clamp(-1, 0, 2) == 0
    assert clamp(1, 0, 2) == 1
    assert clamp(3, 0, 2) == 2


def test_lerp():
    assert lerp(0.0, 0.0, 1.0) == 0.0
    assert lerp(0.5, 0.0, 1.0) == 0.5
    assert lerp(1.0, 0.0, 1.0) == 1.0
    assert lerp(0.75, 0.0, 2.0) == 1.5


def test_quadratic():
    # lib.rs:171-180 doctest values
    assert quadratic(1.0, 1.0, 1.0) is None
    assert quadratic(1.0, -6.0, -16.0) == (-2.0, 8.0)
    assert quadratic(1.0, 6.0, 5.0) == (-5.0, -1.0)
    assert quadratic(1.0, 0.0, -16.0) == (-4.0, 4.0)
    assert quadratic(1.0, 6.0, 0.0) == (-6.0, 0.0)
    t0, t1 = quadratic(1.0, 2.0, -2.0)
    np.testing.assert_allclose([t0, t1], [-1 - 3**0.5, -1 + 3**0.5], atol=1e-6)


def test_gamma_roundtrip():
    v = np.linspace(0, 1, 64)
    np.testing.assert_allclose(inverse_gamma_correct(gamma_correct(v)), v, atol=1e-5)
    # scalar path
    assert abs(gamma_correct(0.0)) < 1e-8
    assert abs(gamma_correct(1.0) - 1.0) < 1e-5


def test_transform_constructors():
    t = Transform.translate([2.0, 4.0, 6.0])
    np.testing.assert_allclose(t.m[0:3, 3], [2, 4, 6])
    np.testing.assert_allclose(t.m_inv[0:3, 3], [-2, -4, -6])

    s = Transform.scale(2.0, 4.0, 6.0)
    np.testing.assert_allclose(np.diag(s.m), [2, 4, 6, 1])

    # rotate doctests (transform.rs:395-443): 180deg about each axis
    th = np.deg2rad(180.0)
    c, si = np.cos(th), np.sin(th)
    rx = Transform.rotate(180.0, [1.0, 0.0, 0.0])
    np.testing.assert_allclose(
        rx.m,
        [[1, 0, 0, 0], [0, c, -si, 0], [0, si, c, 0], [0, 0, 0, 1]],
        atol=1e-7,
    )
    ry = Transform.rotate(180.0, [0.0, 1.0, 0.0])
    np.testing.assert_allclose(
        ry.m,
        [[c, 0, si, 0], [0, 1, 0, 0], [-si, 0, c, 0], [0, 0, 0, 1]],
        atol=1e-7,
    )


def test_transform_compose_inverse_correct():
    """(A*B)^-1 must equal B^-1 A^-1 — the reference got this wrong
    (transform.rs:618-626); verify we did not inherit the bug."""
    a = Transform.translate([1.0, 2.0, 3.0]) * Transform.rotate(30.0, [0.0, 0.0, 1.0])
    b = Transform.scale(2.0, 3.0, 4.0)
    ab = a * b
    np.testing.assert_allclose(ab.m @ ab.m_inv, np.eye(4), atol=1e-10)


def test_look_at_is_world_to_camera():
    t = Transform.look_at([0.0, 0.0, -5.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    # camera-to-world (m_inv) maps origin to eye
    np.testing.assert_allclose(t.m_inv[0:3, 3], [0, 0, -5], atol=1e-12)
    # world origin maps to (0,0,5) in camera space (5 ahead of eye)
    p = t.apply_p(np.array([0.0, 0.0, 0.0]))
    np.testing.assert_allclose(p, [0, 0, 5], atol=1e-6)


def test_xyz_rgb_roundtrip():
    rgb = np.random.default_rng(0).uniform(0, 1, size=(100, 3))
    back = spec.xyz_to_rgb(spec.rgb_to_xyz(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-3)


def test_rgb_to_xyz_reference_values():
    # spectrum.rs:139-145 coefficients
    xyz = spec.rgb_to_xyz(np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(xyz, [0.412453, 0.212671, 0.019334], atol=1e-6)


def test_blackbody_rgb_is_warm():
    rgb = spec.blackbody_to_rgb(3000.0)
    assert rgb[0] > rgb[1] > rgb[2] > 0  # 3000K is reddish-orange
    rgb_hot = spec.blackbody_to_rgb(10000.0)
    assert rgb_hot[2] > rgb_hot[0]  # 10000K is bluish


def test_sampled_spectrum_roundtrip():
    rgbs = np.array([[1.0, 1.0, 1.0], [0.5, 0.2, 0.8], [0.0, 1.0, 0.0]])
    # Illuminant promotion is XYZ-exact directly: a light with this
    # spectrum IS that color.
    s_illum = spec.rgb_to_sampled(rgbs, illuminant=True)
    np.testing.assert_allclose(spec.sampled_to_rgb(s_illum), rgbs, atol=0.05)
    # Reflectance promotion (the default) is exact as *viewed under the
    # illuminant white*: CMF . (S_refl * W_white) == XYZ(rgb).
    s_refl = spec.rgb_to_sampled(rgbs)
    white = spec.rgb_to_sampled(np.array([1.0, 1.0, 1.0]), illuminant=True)
    np.testing.assert_allclose(
        spec.sampled_to_rgb(s_refl * white), rgbs, atol=0.05
    )
    # White reflectance is near-flat (flatness is the zero-curvature KKT
    # solution, up to the smoothness regularizer), so gray transport
    # composes to ~0.5^n.
    np.testing.assert_allclose(
        spec.rgb_to_sampled(np.array([0.5, 0.5, 0.5])), 0.5, atol=0.02
    )


def test_bounds2i_semantics():
    b = Bounds2i.from_points((5, 7), (1, 2))
    assert b.p_min == (1, 2) and b.p_max == (5, 7)
    assert b.area() == 4 * 5
    assert b.inside_exclusive((1, 2))
    assert not b.inside_exclusive((5, 7))
    # intersection that becomes empty stays inverted (bounds.rs:244-252)
    c = Bounds2i.from_points((10, 10), (20, 20))
    i = b.intersect(c)
    assert i.is_empty()
    # row-major iteration
    pts = list(Bounds2i.from_points((0, 0), (2, 2)))
    assert pts == [(0, 0), (1, 0), (0, 1), (1, 1)]
