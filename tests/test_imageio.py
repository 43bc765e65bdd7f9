"""Image I/O round-trip tests (imageio.rs:285-391)."""

import numpy as np
import pytest

from pbrt_tpu.core.geometry import Bounds2i
from pbrt_tpu.core.imageio import read_image, to_byte, write_image


def make_image():
    res = (64, 64)
    bounds = Bounds2i.from_points((0, 0), res)
    h, w = res[1], res[0]
    ys, xs = np.mgrid[0:h, 0:w]
    pixels = np.stack([xs / w, ys / h, np.ones_like(xs, dtype=float)], axis=-1)
    return pixels.astype(np.float32), bounds, res


def test_roundtrip_png(tmp_path):
    pixels, bounds, res = make_image()
    name = str(tmp_path / "roundtrip.png")
    write_image(name, pixels, bounds, res)
    read_pixels, read_res = read_image(name)
    assert read_res == res
    # 8-bit formats gamma correct on save (imageio.rs:345-351)
    expected = to_byte(pixels).astype(np.float32) / 255.0
    np.testing.assert_array_equal(read_pixels, expected.astype(np.float32))


def test_roundtrip_pfm(tmp_path):
    pixels, bounds, res = make_image()
    name = str(tmp_path / "roundtrip.pfm")
    write_image(name, pixels, bounds, res)
    read_pixels, read_res = read_image(name)
    assert read_res == res
    np.testing.assert_array_equal(read_pixels, pixels)


def test_write_crop_only(tmp_path):
    """write_image writes output_bounds-sized data (imageio.rs:235-236)."""
    bounds = Bounds2i.from_points((10, 20), (20, 25))
    data = np.random.default_rng(0).uniform(size=(5, 10, 3)).astype(np.float32)
    name = str(tmp_path / "crop.pfm")
    write_image(name, data, bounds, (100, 100))
    read_pixels, read_res = read_image(name)
    assert read_res == (10, 5)
    np.testing.assert_array_equal(read_pixels, data)


def test_unknown_extension(tmp_path):
    with pytest.raises(ValueError):
        read_image(str(tmp_path / "x.webp"))


def test_floatfile(tmp_path):
    from pbrt_tpu.core.floatfile import read_float_file

    f = tmp_path / "good.floats"
    f.write_text("1.0 2.5 # comment\n3 4e1\n# whole line comment\n5\n")
    assert read_float_file(str(f)) == [1.0, 2.5, 3.0, 40.0, 5.0]


def test_floatfile_f32_overflow_to_inf(tmp_path):
    """f32 parse of 1e300 overflows to inf (floatfile.rs:76-90 fixture)."""
    from pbrt_tpu.core.floatfile import read_float_file

    f = tmp_path / "big.floats"
    f.write_text("1e300\n")
    vals = read_float_file(str(f))
    assert np.isinf(vals[0])
