"""Realistic (lens-system) camera tests (pbrt-v3 cameras/realistic.cpp).

Anchors are closed-form optics: the thick-lens focal length of the builtin
biconvex singlet must match the lensmaker's equation; thick-lens autofocus
must image a film point to a tight spot at the focus distance (stopped
down, so spherical aberration is negligible); vignetting must kill rays
that miss the aperture stop.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pbrt_tpu.cameras.realistic import (
    LensElement,
    RealisticCamera,
    load_lens_file,
)
from pbrt_tpu.core.film import Film
from pbrt_tpu.core.transform import Transform


def _film():
    return Film(resolution=(64, 64), diagonal_mm=35.0)


def _stopped_lens(stop_mm=6.0):
    els = load_lens_file("biconvex-50mm")
    els[-1] = LensElement(
        els[-1].curvature_radius, 0.001, els[-1].eta, els[-1].aperture_radius
    )
    els.append(LensElement(0.0, 0.0, 0.0, 0.5 * stop_mm * 1e-3))
    return els


def test_focal_length_matches_lensmaker():
    cam = RealisticCamera(
        Transform(), load_lens_file("biconvex-50mm"), _film(), focus_distance=2.0
    )
    # thick lensmaker: 1/f = (n-1)(1/R1 - 1/R2 + (n-1) d / (n R1 R2))
    n, r1, r2, d = 1.5, 0.048, -0.048, 0.004
    inv_f = (n - 1) * (1 / r1 - 1 / r2 + (n - 1) * d / (n * r1 * r2))
    assert cam.focal_length == pytest.approx(1 / inv_f, rel=1e-4)


def test_autofocus_converges_at_focus_distance():
    cam = RealisticCamera(Transform(), _stopped_lens(), _film(), focus_distance=2.0)
    n = 512
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((n, 2), dtype=np.float32))
    o, d, w = cam.generate_rays(jnp.full((n, 2), 32.0), u)
    o, d, w = np.asarray(o), np.asarray(d), np.asarray(w)
    alive = w > 0
    # exit-pupil BOUNDS are a square circumscribing the circular stop, so
    # on-axis survival inside them is ~pi/4 (pbrt SampleExitPupil has the
    # same behavior; the area weighting keeps the estimator unbiased)
    assert alive.mean() > 0.7
    t = (2.0 - o[alive, 2]) / d[alive, 2]
    pts = o[alive] + t[:, None] * d[alive]
    # spot radius well under a millimetre at 2 m
    assert pts[:, :2].std(axis=0).max() < 1e-3
    # center film point images on the optical axis
    assert np.abs(pts[:, :2].mean(axis=0)).max() < 5e-3


def test_wide_open_singlet_shows_spherical_aberration():
    """Physics check: the f/0.8 singlet must blur far MORE than f/8 —
    aberration scales with the aperture, which the element trace must
    reproduce (a thin-lens approximation would focus both perfectly)."""
    film = _film()
    cam_open = RealisticCamera(
        Transform(), load_lens_file("biconvex-50mm"), film, focus_distance=2.0
    )
    cam_stop = RealisticCamera(Transform(), _stopped_lens(), film, focus_distance=2.0)
    n = 512
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.random((n, 2), dtype=np.float32))

    def spot(cam):
        o, d, w = cam.generate_rays(jnp.full((n, 2), 32.0), u)
        o, d, w = np.asarray(o), np.asarray(d), np.asarray(w)
        a = w > 0
        t = (2.0 - o[a, 2]) / d[a, 2]
        return (o[a] + t[:, None] * d[a])[:, :2].std()

    assert spot(cam_open) > 20 * spot(cam_stop)


def test_image_inversion_and_magnification():
    """An off-center film point images to the OPPOSITE side of the axis at
    the focus plane, scaled by the thick-lens magnification."""
    cam = RealisticCamera(Transform(), _stopped_lens(), _film(), focus_distance=2.0)
    n = 256
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.random((n, 2), dtype=np.float32))
    # film x = 48 of 64 -> physical x positive quarter-diagonal; pbrt flips x
    o, d, w = cam.generate_rays(jnp.asarray(np.full((n, 2), [48.0, 32.0], dtype=np.float32)), u)
    o, d, w = np.asarray(o), np.asarray(d), np.asarray(w)
    a = w > 0
    t = (2.0 - o[a, 2]) / d[a, 2]
    pts = o[a] + t[:, None] * d[a]
    x_world = pts[:, 0].mean()
    assert x_world > 0.1  # film +x (flipped to -x physical) lands at +x world
    assert pts[:, 0].std() < 4e-3  # off-axis spot (slight coma at f/8)
    assert abs(pts[:, 1].mean()) < 1e-3


def test_aperture_vignettes_oblique_rays():
    """Rays that geometrically miss an element's clear aperture must die
    (alive=False) while on-axis rays survive the full trace."""
    from pbrt_tpu.cameras.realistic import trace_from_film

    cam = RealisticCamera(Transform(), _stopped_lens(), _film(), focus_distance=2.0)
    o = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    d = np.array([[0.0, 0.0, -1.0], [0.95, 0.0, -0.31]])  # axial vs near-grazing
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    _, _, alive = trace_from_film(cam.elements, o, d, np)
    assert bool(alive[0]) and not bool(alive[1])
    # and generate_rays returns finite rays with nonzero weights
    n = 128
    u = jnp.asarray(np.random.default_rng(3).random((n, 2), dtype=np.float32))
    ow, dw, w = cam.generate_rays(jnp.full((n, 2), 32.0), u)
    assert np.isfinite(np.asarray(ow)).all() and np.isfinite(np.asarray(dw)).all()
    # pupil-bounds sampling: the square bounds circumscribe the circular
    # stop, so ~pi/4 of samples survive with near-unit weight, rest are 0
    wa = np.asarray(w)
    assert (wa >= 0).all() and (wa > 0).mean() > 0.7


def test_realistic_camera_scene_end_to_end():
    """Camera "realistic" via the full pipeline: a checkered plane at the
    focus distance renders sharp (crisp transition rows exist)."""
    from pbrt_tpu import Options
    from pbrt_tpu.core.api import PbrtAPI
    from pbrt_tpu.render import render_scene

    scene = """
LookAt 0 0 0  0 0 1  0 1 0
Camera "realistic" "string lensfile" "biconvex-50mm-f8"
    "float focusdistance" 2 "float aperturediameter" 6
Sampler "halton" "integer pixelsamples" 8
Integrator "path" "integer maxdepth" 2
Film "image" "integer xresolution" [32] "integer yresolution" [32]
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
Material "matte" "rgb Kd" [0.8 0.1 0.1]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point3 P" [-0.06 -0.06 2  0.06 -0.06 2  0.06 0.06 2  -0.06 0.06 2]
WorldEnd
"""
    api = PbrtAPI(Options(ray_batch=8192), render_on_world_end=False)
    api.init()
    api.parse_string(scene)
    img = render_scene(api.scene, api.opt, seed=0, write=False)["image"]
    assert np.isfinite(img).all()
    # the red card covers the center region; background is white env
    center = img[14:18, 14:18]
    assert center[..., 0].mean() > 3 * center[..., 2].mean()
    assert img[1, 1].mean() > 0.5


def test_exit_pupil_reduces_vignetted_waste():
    """Exit-pupil sampling (pbrt BoundExitPupil/SampleExitPupil): off-axis
    film points must see a far higher survival rate than uniform
    rear-disk sampling, with on-axis weights unchanged (~cos^4)."""
    import jax.numpy as jnp

    from pbrt_tpu.core.film import Film
    from pbrt_tpu.core.filters import BoxFilter
    from pbrt_tpu.core.transform import Transform
    from pbrt_tpu.cameras.realistic import RealisticCamera, load_lens_file

    from pbrt_tpu.cameras.realistic import LensElement

    film = Film((64, 64), ((0, 0), (1, 1)), BoxFilter((0.5, 0.5)),
                diagonal_mm=20.0)
    # mid-stop singlet: the REAR element (15mm radius) is much larger than
    # the 3mm stop buried between the surfaces, so uniform rear-disk
    # sampling wastes most rays and pupil bounds matter
    mid_stop = [
        LensElement(0.048, 0.002, 1.5, 0.015),
        LensElement(0.0, 0.002, 0.0, 0.003),
        LensElement(-0.048, 0.0, 1.0, 0.015),
    ]
    cam = RealisticCamera(Transform.identity(), mid_stop, film,
                          focus_distance=2.0)
    n = 4096
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32))
    # far off-axis film points (corner-ish)
    p_corner = jnp.tile(jnp.asarray([[6.0, 6.0]], jnp.float32), (n, 1))
    _, _, w = cam.generate_rays(p_corner, u)
    survival_pupil = float(jnp.mean(w > 0))

    # compare against uniform rear-disk sampling through the same trace
    from pbrt_tpu.core.sampling import concentric_sample_disk

    res = jnp.asarray(cam.resolution, jnp.float32)
    s = p_corner / res
    ext_min = jnp.asarray(cam._ext_min, jnp.float32)
    ext_max = jnp.asarray(cam._ext_max, jnp.float32)
    p_phys = ext_min + s * (ext_max - ext_min)
    o_film = jnp.stack(
        [-p_phys[..., 0], p_phys[..., 1], jnp.zeros_like(p_phys[..., 0])], -1
    )
    p_disk = cam.rear_radius * concentric_sample_disk(u)
    p_rear = jnp.concatenate(
        [p_disk, jnp.full((n, 1), -cam.rear_z, jnp.float32)], axis=-1
    )
    d = p_rear - o_film
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    from pbrt_tpu.cameras.realistic import trace_from_film

    _, _, alive_disk = trace_from_film(cam.elements, o_film, d, jnp)
    survival_disk = float(jnp.mean(alive_disk))
    assert survival_pupil > 1.5 * max(survival_disk, 1e-3), (
        survival_pupil, survival_disk,
    )
    # on-axis: pupil ~= stop projection, weights near cos^4 ~ 1
    p_center = jnp.tile(jnp.asarray([[32.0, 32.0]], jnp.float32), (n, 1))
    _, _, w0 = cam.generate_rays(p_center, u)
    assert float(jnp.mean(w0 > 0)) > 0.5
