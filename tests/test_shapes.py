"""Curve and NURBS shape tessellation tests.

The reference names these shape types but implements no shapes at all
(SURVEY.md §0); correctness anchors here are analytic surfaces: a straight
constant-width curve must tessellate to a cylinder of known area/normals,
and a rational quadratic NURBS arc must reproduce an exact circular
cross-section (the classic w = cos(theta/2) construction).
"""

import numpy as np
import pytest

from pbrt_tpu.core.paramset import ParamSet
from pbrt_tpu.core.transform import Transform
from pbrt_tpu.shapes import make_shape
from pbrt_tpu.shapes.curve import bezier_eval, _bspline_to_bezier


IDENT = Transform.identity() if hasattr(Transform, "identity") else Transform()


def _curve_params(P, ctype="cylinder", width=0.1, basis="bezier", degree=3, N=None):
    ps = ParamSet()
    ps.add_point3f("P", np.asarray(P, dtype=np.float64))
    ps.add_string("type", [ctype])
    ps.add_string("basis", [basis])
    ps.add_int("degree", [degree])
    ps.add_float("width", [width])
    if N is not None:
        ps.add_normal3f("N", np.asarray(N, dtype=np.float64))
    return ps


def test_straight_curve_is_cylinder():
    # straight cubic along +x, length 3, radius 0.05
    P = [[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]]
    td = make_shape("curve", _curve_params(P, width=0.1), IDENT, False)
    assert td is not None and td.count > 0
    # total area approximates lateral cylinder area 2*pi*r*L
    area = td.areas().sum()
    exact = 2 * np.pi * 0.05 * 3.0
    assert area == pytest.approx(exact, rel=0.15)  # hexagonal prism underestimates
    # every shading normal is perpendicular to the axis (+x)
    assert np.abs(td.n0[:, 0]).max() < 1e-6
    # tangents are unit +x everywhere
    assert np.allclose(td.tan0, [1, 0, 0], atol=1e-6)
    # normals are unit radial vectors
    assert np.allclose(np.linalg.norm(td.n0, axis=-1), 1.0, atol=1e-5)


def test_curve_width_interpolation():
    P = [[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]]
    ps = _curve_params(P)
    ps.add_float("width0", [0.2])
    ps.add_float("width1", [0.4])
    td = make_shape("curve", ps, IDENT, False)
    pts = np.concatenate([td.p0, td.p1, td.p2])
    r = np.linalg.norm(pts[:, 1:], axis=-1)  # distance from x axis
    # radius spans [0.1, 0.2]
    assert r.min() == pytest.approx(0.1, abs=1e-6)
    assert r.max() == pytest.approx(0.2, abs=1e-6)


def test_ribbon_follows_normals():
    P = [[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]]
    N = [[0, 0, 1], [0, 0, 1]]  # constant normal -> flat strip in the xy plane
    td = make_shape("curve", _curve_params(P, ctype="ribbon", N=N), IDENT, False)
    assert td is not None and td.count > 0
    assert np.allclose(td.n0, [0, 0, 1], atol=1e-6)
    assert np.abs(td.p0[:, 2]).max() < 1e-9  # strip lies in z=0
    # width 0.1 -> y in [-0.05, 0.05]
    assert np.abs(td.p0[:, 1]).max() == pytest.approx(0.05, abs=1e-6)


def test_bspline_matches_dense_bezier():
    # uniform cubic b-spline through 6 points: converted Bezier segments
    # must join with C2 continuity (endpoint of seg s == start of seg s+1)
    rng = np.random.default_rng(7)
    P = rng.normal(size=(6, 3))
    segs = _bspline_to_bezier(P, 3)
    for s in range(len(segs) - 1):
        p_end, _ = bezier_eval(segs[s : s + 1], np.array([1.0]))
        p_start, _ = bezier_eval(segs[s + 1 : s + 2], np.array([0.0]))
        assert np.allclose(p_end, p_start, atol=1e-12)
    # convexity: every Bezier point is inside the control hull
    lo, hi = P.min(axis=0) - 1e-9, P.max(axis=0) + 1e-9
    pts, _ = bezier_eval(segs, np.linspace(0, 1, 17))
    assert (pts >= lo).all() and (pts <= hi).all()


def _nurbs_quarter_cylinder():
    """Rational quadratic 90-degree arc (xz), extruded linearly along y."""
    ps = ParamSet()
    w = np.sqrt(2.0) / 2.0
    # u: 3 ctrl points, order 3 (quadratic rational); v: 2 points, order 2
    ps.add_int("nu", [3])
    ps.add_int("uorder", [3])
    ps.add_float("uknots", [0, 0, 0, 1, 1, 1])
    ps.add_int("nv", [2])
    ps.add_int("vorder", [2])
    ps.add_float("vknots", [0, 0, 1, 1])
    # homogeneous (wx, wy, wz, w); arc from (1,0,0) to (0,0,1), radius 1
    arc = [([1, 0, 0], 1.0), ([1, 0, 1], w), ([0, 0, 1], 1.0)]
    pw = []
    for vrow in (0.0, 2.0):  # v extrusion along y
        for (x, y, z), wt in arc:  # u fastest (pbrt P[v*nu+u])
            pw.extend([wt * x, wt * (y + vrow), wt * z, wt])
    ps.add_float("Pw", pw)
    return ps


def test_nurbs_rational_arc_exact_radius():
    td = make_shape("nurbs", _nurbs_quarter_cylinder(), IDENT, False)
    assert td is not None and td.count > 0
    for p in (td.p0, td.p1, td.p2):
        r = np.sqrt(p[:, 0] ** 2 + p[:, 2] ** 2)
        # rational quadratic circles are EXACT (not approximated)
        assert np.allclose(r, 1.0, atol=1e-6)
        assert p[:, 1].min() >= -1e-9 and p[:, 1].max() <= 2.0 + 1e-9
    # analytic normals: radial in xz, zero y component
    assert np.abs(td.n0[:, 1]).max() < 1e-6
    nr = td.n0[:, [0, 2]] / np.linalg.norm(td.n0[:, [0, 2]], axis=-1, keepdims=True)
    pr = np.stack([td.p0[:, 0], td.p0[:, 2]], axis=-1)
    align = np.abs(np.sum(nr * pr, axis=-1))
    assert np.allclose(align, 1.0, atol=1e-5)


def test_curve_renders_end_to_end():
    """A thick curve in front of the camera occludes the environment
    (exercises the tangent-table plumbing through the wavefront)."""
    from pbrt_tpu import Options
    from pbrt_tpu.core.api import PbrtAPI
    from pbrt_tpu.render import render_scene

    scene = """
LookAt 0 0 -3  0 0 0  0 1 0
Camera "perspective" "float fov" 40
Sampler "halton" "integer pixelsamples" 4
Integrator "path" "integer maxdepth" 2
Film "image" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
Material "matte" "rgb Kd" [0 0 0]
Shape "curve" "point3 P" [ -2 0 0  -0.7 0 0  0.7 0 0  2 0 0 ]
    "string type" "cylinder" "float width" 0.6
WorldEnd
"""
    api = PbrtAPI(Options(ray_batch=4096), render_on_world_end=False)
    api.init()
    api.parse_string(scene)
    img = render_scene(api.scene, api.opt, seed=0, write=False)["image"]
    mid = img[8, :, :]  # middle row crosses the curve
    assert mid.max() <= 1.0 + 1e-3
    # center pixels see the black curve, edge pixels see the white env
    assert mid[8].mean() < 0.05
    assert img[0, 0].mean() > 0.9


def test_nurbs_nonrational_plane():
    ps = ParamSet()
    ps.add_int("nu", [2]); ps.add_int("uorder", [2])
    ps.add_float("uknots", [0, 0, 1, 1])
    ps.add_int("nv", [2]); ps.add_int("vorder", [2])
    ps.add_float("vknots", [0, 0, 1, 1])
    ps.add_point3f("P", np.array(
        [[0, 0, 0], [2, 0, 0], [0, 3, 0], [2, 3, 0]], dtype=np.float64))
    td = make_shape("nurbs", ps, IDENT, False)
    assert td is not None
    assert np.abs(td.p0[:, 2]).max() < 1e-9
    assert td.areas().sum() == pytest.approx(6.0, rel=1e-6)
    assert np.allclose(np.abs(td.n0[:, 2]), 1.0, atol=1e-6)
