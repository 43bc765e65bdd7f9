"""Image I/O: PNG (8-bit sRGB) and PFM (float), plus EXR/TGA errors.

Mirrors /root/reference/src/core/imageio.rs semantics exactly:

* PNG write quantizes with ``to_byte = clamp(255*gamma_correct(v)+0.5, 0, 255)``
  (imageio.rs:66-68); PNG read maps 8-bit RGB to [0,1] *without* degamma
  (imageio.rs:163-173) so write-then-read equals ``to_byte(v)/255``
  (roundtrip test imageio.rs:325-360).
* PFM: header "PF"/"Pf", scale sign encodes endianness, rows stored
  bottom-up (imageio.rs:87-138, 186-213).
* ``write_image`` writes only the ``output_bounds`` crop (imageio.rs:235-236).
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np

from pbrt_tpu import float_t, gamma_correct
from pbrt_tpu.core.geometry import Bounds2i


class ImageIOError(ValueError):
    pass


def to_byte(v):
    """Gamma-correct float -> byte (imageio.rs:66-68), vectorized."""
    return np.clip(255.0 * gamma_correct(np.asarray(v, dtype=float_t)) + 0.5, 0.0, 255.0).astype(
        np.uint8
    )


def _read_pfm(name: str):
    with open(name, "rb") as f:
        data = f.read()

    pos = 0

    def read_word():
        nonlocal pos
        start = pos
        while pos < len(data) and data[pos : pos + 1] not in (b" ", b"\n", b"\t"):
            pos += 1
        word = data[start:pos].decode("ascii")
        pos += 1  # consume single whitespace
        return word

    hdr = read_word()
    if hdr == "PF":
        n_channels = 3
    elif hdr == "Pf":
        n_channels = 1
    else:
        raise ImageIOError(f"invalid PFM header {hdr!r}")
    width = int(read_word())
    height = int(read_word())
    scale = float(read_word())
    n_floats = n_channels * width * height
    dt = np.dtype("<f4") if scale < 0 else np.dtype(">f4")
    raw = np.frombuffer(data[pos : pos + 4 * n_floats], dtype=dt).astype(np.float64)
    raw = raw * abs(scale) if abs(scale) != 1.0 else raw
    img = raw.reshape(height, width, n_channels)[::-1]  # rows bottom-up
    if n_channels == 1:
        img = np.repeat(img, 3, axis=-1)
    return img.astype(float_t), (width, height)


def read_image(name: str):
    """Read image -> ([H, W, 3] float RGB in [0,1]-ish, (width, height)).

    PNG bytes are divided by 255 with no degamma (imageio.rs:163-173).
    """
    ext = Path(name).suffix.lower()
    if ext == ".png":
        from PIL import Image

        with Image.open(name) as im:
            im = im.convert("RGB")
            arr = np.asarray(im, dtype=float_t) / float_t(255.0)
        return arr, (arr.shape[1], arr.shape[0])
    if ext == ".pfm":
        return _read_pfm(name)
    if ext in (".exr", ".tga"):
        raise ImageIOError(f"reading '{ext}' files is not yet implemented")
    raise ImageIOError(f"unknown extension '{ext}'")


def _write_pfm(name: str, rgb: np.ndarray, width: int, height: int) -> None:
    host_le = sys.byteorder == "little"
    scale = -1.0 if host_le else 1.0
    with open(name, "wb") as f:
        f.write(f"PF\n{width} {height}\n{scale}\n".encode("ascii"))
        img = np.asarray(rgb, dtype=np.float32).reshape(height, width, 3)
        # bottom-up rows per netpbm PFM spec (imageio.rs:198-209)
        f.write(img[::-1].astype("<f4" if host_le else ">f4").tobytes())


def write_image(name: str, rgb, output_bounds: Bounds2i, total_resolution=None) -> None:
    """Write cropped RGB data; format chosen by extension (imageio.rs:235-283).

    ``rgb`` is flat [w*h*3] or [h, w, 3] covering ``output_bounds``.
    """
    w, h = output_bounds.diagonal()
    rgb = np.asarray(rgb, dtype=float_t).reshape(h, w, 3)
    ext = Path(name).suffix.lower()
    if ext == ".png":
        from PIL import Image

        Image.fromarray(to_byte(rgb), mode="RGB").save(name, format="PNG")
    elif ext == ".pfm":
        _write_pfm(name, rgb, w, h)
    elif ext in (".exr", ".tga"):
        raise ImageIOError(f"writing '{ext}' files is not implemented")
    else:
        raise ImageIOError(f"unknown file extension {ext}")
