"""Checkerboard textures, 2D and 3D (pbrt-v3 §10.5)."""

from __future__ import annotations

import jax.numpy as jnp


class CheckerboardTexture:
    """2D checkerboard: tex1 where (floor(s)+floor(t)) even, else tex2."""

    def __init__(self, mapping, tex1, tex2):
        self.mapping = mapping
        self.tex1 = tex1
        self.tex2 = tex2

    def eval(self, si):
        s, t = self.mapping.map(si)
        parity = (jnp.floor(s) + jnp.floor(t)).astype(jnp.int32) % 2
        v1 = self.tex1.eval(si)
        v2 = self.tex2.eval(si)
        mask = parity == 0
        if v1.ndim > mask.ndim:
            mask = mask[..., None]
        return jnp.where(mask, v1, v2)


class Checkerboard3DTexture:
    def __init__(self, mapping3d, tex1, tex2):
        self.mapping = mapping3d
        self.tex1 = tex1
        self.tex2 = tex2

    def eval(self, si):
        p = self.mapping.map(si)
        parity = (
            jnp.floor(p[..., 0]) + jnp.floor(p[..., 1]) + jnp.floor(p[..., 2])
        ).astype(jnp.int32) % 2
        v1 = self.tex1.eval(si)
        v2 = self.tex2.eval(si)
        mask = parity == 0
        if v1.ndim > mask.ndim:
            mask = mask[..., None]
        return jnp.where(mask, v1, v2)
