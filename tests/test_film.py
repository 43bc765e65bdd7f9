"""Film parity tests against reference doctest values (film.rs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pbrt_tpu.core.film import Film
from pbrt_tpu.core.filters import BoxFilter, GaussianFilter, MitchellFilter, TriangleFilter
from pbrt_tpu.core.geometry import Bounds2i
from pbrt_tpu.core.spectrum import rgb_to_xyz


def test_sample_bounds_reference_values():
    """film.rs:141-165 doctest: 1920x1080, crop [.25,.75]^2, box r=8."""
    film = Film((1920, 1080), ((0.25, 0.25), (0.75, 0.75)), BoxFilter((8.0, 8.0)))
    b = film.get_sample_bounds()
    assert b.p_min == (472, 262)
    assert b.p_max == (1448, 818)


def test_physical_extent_reference_values():
    """film.rs:179-217 doctest: 800x600 @ 100mm diagonal."""
    film = Film((800, 600), ((0.0, 0.0), (1.0, 1.0)), BoxFilter((8.0, 8.0)),
                diagonal_mm=100.0)
    e = film.get_physical_extent()
    np.testing.assert_allclose(e.p_min, (-0.04, -0.03), atol=1e-9)
    np.testing.assert_allclose(e.p_max, (0.04, 0.03), atol=1e-9)
    # crop window doesn't change physical extent
    film2 = Film((800, 600), ((0.25, 0.25), (0.75, 0.75)), BoxFilter((8.0, 8.0)),
                 diagonal_mm=100.0)
    e2 = film2.get_physical_extent()
    np.testing.assert_allclose(e2.p_min, e.p_min)


def test_tile_bounds_reference_values():
    """film.rs:232-263 doctest: tile clipping behavior."""
    film = Film((1920, 1080), ((0.25, 0.25), (0.75, 0.75)), BoxFilter((8.0, 8.0)))
    t1 = film.tile_bounds(Bounds2i.from_points((0, 0), (1920, 1080)))
    assert t1.p_min == (1920 // 4, 1080 // 4)
    assert t1.p_max == (3 * 1920 // 4, 3 * 1080 // 4)
    t2 = film.tile_bounds(Bounds2i.from_points((500, 500), (600, 600)))
    assert t2.p_min == (492, 492)
    assert t2.p_max == (608, 608)


def test_merge_semantics_reference():
    """film.rs:504-535 merge_film_tile test: two halves filled with
    green/red at weight 1 -> pixel xyz equals the color's xyz."""
    film = Film((200, 10), ((0.0, 0.0), (1.0, 1.0)), BoxFilter((8.0, 8.0)))
    state = film.initial_state()
    green = np.array([0.0, 1.0, 0.0], dtype=np.float32)
    red = np.array([1.0, 0.0, 0.0], dtype=np.float32)
    # emulate: every pixel gets one weight-1 sample of its color.
    pix = film.cropped_pixel_bounds.offsets()
    colors = np.where((pix[:, 0] < 100)[:, None], green, red)
    # place samples at pixel centers with a tiny filter so each sample hits
    # exactly its own pixel like the tile fill
    film_small = Film((200, 10), ((0.0, 0.0), (1.0, 1.0)), BoxFilter((0.5, 0.5)))
    state = film_small.initial_state()
    p_film = pix.astype(np.float32) + 0.5
    state = film_small.add_samples(state, jnp.asarray(p_film), jnp.asarray(colors))
    np.testing.assert_allclose(
        film_small.get_pixel_xyz(state, (4, 4)), rgb_to_xyz(green), atol=1e-6
    )
    np.testing.assert_allclose(
        film_small.get_pixel_xyz(state, (196, 4)), rgb_to_xyz(red), atol=1e-6
    )
    # write path: to_rgb divides by weight
    img = np.asarray(film_small.to_rgb(state))
    np.testing.assert_allclose(img[4, 4], green, atol=1e-5)
    np.testing.assert_allclose(img[4, 196], red, atol=1e-5)


def test_wide_filter_spreads_weight():
    film = Film((9, 9), ((0.0, 0.0), (1.0, 1.0)), TriangleFilter((2.0, 2.0)))
    state = film.initial_state()
    p = jnp.asarray(np.array([[4.5, 4.5]], dtype=np.float32))
    c = jnp.asarray(np.array([[1.0, 1.0, 1.0]], dtype=np.float32))
    state = film.add_samples(state, p, c)
    w = np.asarray(state["weight"])
    assert w[4, 4] > 0
    assert w[3, 4] > 0 and w[4, 3] > 0  # neighbors got weight
    assert w[0, 0] == 0
    # triangle filter is symmetric
    np.testing.assert_allclose(w[3, 4], w[5, 4], atol=1e-6)
    np.testing.assert_allclose(w[4, 3], w[4, 5], atol=1e-6)


def test_splat_accumulation():
    film = Film((8, 8), ((0.0, 0.0), (1.0, 1.0)), BoxFilter((0.5, 0.5)))
    state = film.initial_state()
    p = jnp.asarray(np.array([[3.5, 3.5], [3.2, 3.7]], dtype=np.float32))
    c = jnp.asarray(np.ones((2, 3), dtype=np.float32))
    state = film.add_splats(state, p, c)
    img = np.asarray(film.to_rgb(state, splat_scale=0.5))
    # both splats land in pixel (3,3): 2 * 0.5 = 1.0
    np.testing.assert_allclose(img[3, 3], [1.0, 1.0, 1.0], atol=1e-5)
    assert img[0, 0].sum() == 0


def test_max_sample_luminance_clamps():
    film = Film((4, 4), ((0.0, 0.0), (1.0, 1.0)), BoxFilter((0.5, 0.5)),
                max_sample_luminance=1.0)
    state = film.initial_state()
    p = jnp.asarray(np.array([[1.5, 1.5]], dtype=np.float32))
    c = jnp.asarray(np.array([[100.0, 100.0, 100.0]], dtype=np.float32))
    state = film.add_samples(state, p, c)
    img = np.asarray(film.to_rgb(state))
    assert img[1, 1].max() < 2.0


def test_filter_table_matches_direct_eval():
    """film.rs:113-123: table sampled at (i+.5)*r/W."""
    for filt in (
        BoxFilter((0.5, 0.5)),
        TriangleFilter((2.0, 2.0)),
        GaussianFilter((2.0, 2.0)),
        MitchellFilter((2.0, 2.0)),
    ):
        tbl = filt.table(16)
        assert tbl.shape == (16, 16)
        x = (3 + 0.5) * filt.radius[0] / 16
        y = (7 + 0.5) * filt.radius[1] / 16
        np.testing.assert_allclose(tbl[7, 3], filt.evaluate(x, y), rtol=1e-6)
