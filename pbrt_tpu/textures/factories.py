"""Texture factories: parameter decoding per pbrt-v3 CreateXxxTexture.

Each factory takes (tex2world: Transform, tp: TextureParams, spectral: bool)
and returns a texture object with a batched ``eval(si)``.
"""

from __future__ import annotations

import numpy as np

from pbrt_tpu import float_t
from pbrt_tpu.textures.checkerboard import Checkerboard3DTexture, CheckerboardTexture
from pbrt_tpu.textures.constant import ConstantTexture
from pbrt_tpu.textures.imagemap import ImageTexture
from pbrt_tpu.textures.mapping import TransformMapping3D, mapping_from_params
from pbrt_tpu.textures.mix import BilerpTexture, MixTexture
from pbrt_tpu.textures.noise import (
    DotsTexture,
    FBmTexture,
    MarbleTexture,
    WindyTexture,
    WrinkledTexture,
)
from pbrt_tpu.textures.scale import ScaleTexture
from pbrt_tpu.textures.uv import UVTexture


def _get_tex(tp, name, default, spectral):
    if spectral:
        return tp.get_spectrum_texture(name, np.full(3, default, dtype=float_t))
    return tp.get_float_texture(name, float(default))


def _constant(t2w, tp, spectral):
    if spectral:
        return ConstantTexture(tp.find_spectrum("value", np.ones(3, dtype=float_t)))
    return ConstantTexture(tp.find_float("value", 1.0))


def _scale(t2w, tp, spectral):
    return ScaleTexture(_get_tex(tp, "tex1", 1.0, spectral), _get_tex(tp, "tex2", 1.0, False))


def _mix(t2w, tp, spectral):
    return MixTexture(
        _get_tex(tp, "tex1", 0.0, spectral),
        _get_tex(tp, "tex2", 1.0, spectral),
        tp.get_float_texture("amount", 0.5),
    )


def _bilerp(t2w, tp, spectral):
    mapping = mapping_from_params(tp, t2w)
    if spectral:
        g = lambda n: tp.find_spectrum(n, np.zeros(3, dtype=float_t))
    else:
        g = lambda n: tp.find_float(n, 0.0)
    return BilerpTexture(mapping, g("v00"), g("v01"), g("v10"), g("v11"))


def _checkerboard(t2w, tp, spectral):
    dim = tp.find_int("dimension", 2)
    tex1 = _get_tex(tp, "tex1", 1.0, spectral)
    tex2 = _get_tex(tp, "tex2", 0.0, spectral)
    if dim == 3:
        return Checkerboard3DTexture(TransformMapping3D(t2w.inverse()), tex1, tex2)
    # "aamode" accepted but antialiasing is handled by supersampling on TPU
    tp.find_string("aamode", "closedform")
    return CheckerboardTexture(mapping_from_params(tp, t2w), tex1, tex2)


def _dots(t2w, tp, spectral):
    return DotsTexture(
        mapping_from_params(tp, t2w),
        _get_tex(tp, "inside", 1.0, spectral),
        _get_tex(tp, "outside", 0.0, spectral),
    )


def _uv(t2w, tp, spectral):
    return UVTexture(mapping_from_params(tp, t2w))


def _imagemap(t2w, tp, spectral):
    filename = tp.find_filename("filename", "")
    gamma_default = filename.lower().endswith((".png", ".tga"))
    return ImageTexture(
        mapping_from_params(tp, t2w),
        filename,
        do_trilinear=tp.find_bool("trilinear", False),
        max_aniso=tp.find_float("maxanisotropy", 8.0),
        wrap=tp.find_string("wrap", "repeat"),
        scale=tp.find_float("scale", 1.0),
        gamma=tp.find_bool("gamma", gamma_default),
        spectral=spectral,
    )


def _fbm(t2w, tp, spectral):
    return FBmTexture(
        TransformMapping3D(t2w.inverse()),
        tp.find_int("octaves", 8),
        tp.find_float("roughness", 0.5),
    )


def _wrinkled(t2w, tp, spectral):
    return WrinkledTexture(
        TransformMapping3D(t2w.inverse()),
        tp.find_int("octaves", 8),
        tp.find_float("roughness", 0.5),
    )


def _windy(t2w, tp, spectral):
    return WindyTexture(TransformMapping3D(t2w.inverse()))


def _marble(t2w, tp, spectral):
    return MarbleTexture(
        TransformMapping3D(t2w.inverse()),
        tp.find_int("octaves", 8),
        tp.find_float("roughness", 0.5),
        tp.find_float("scale", 1.0),
        tp.find_float("variation", 0.2),
    )


FACTORIES = {
    "constant": _constant,
    "scale": _scale,
    "mix": _mix,
    "bilerp": _bilerp,
    "imagemap": _imagemap,
    "uv": _uv,
    "checkerboard": _checkerboard,
    "dots": _dots,
    "fbm": _fbm,
    "wrinkled": _wrinkled,
    "marble": _marble,
    "windy": _windy,
}
