"""Checkerboard textures, 2D and 3D (pbrt-v3 §10.5).

The 2D checker antialiases with pbrt's CLOSEDFORM box filter when the
interaction carries ray-differential footprints (``tex_width``, round-3
differentials): the fraction of the filter box covered by odd checks has
the closed form built on ``bumpint(x) = floor(x/2) + 2 max(x/2 -
floor(x/2) - 1/2, 0)`` (pbrt-v3 checkerboard.h:88-102); point sampling
remains the path for footprint-less lookups.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bumpint(x):
    h = x * 0.5
    return jnp.floor(h) + 2.0 * jnp.maximum(h - jnp.floor(h) - 0.5, 0.0)


class CheckerboardTexture:
    """2D checkerboard: tex1 where (floor(s)+floor(t)) even, else tex2."""

    def __init__(self, mapping, tex1, tex2):
        self.mapping = mapping
        self.tex1 = tex1
        self.tex2 = tex2

    def eval(self, si):
        s, t = self.mapping.map(si)
        v1 = self.tex1.eval(si)
        v2 = self.tex2.eval(si)
        width = si.get("tex_width")
        parity = (jnp.floor(s) + jnp.floor(t)).astype(jnp.int32) % 2
        mask = parity == 0
        if v1.ndim > mask.ndim:
            mask = mask[..., None]
        point = jnp.where(mask, v1, v2)
        if width is None:
            return point
        # box-filter over [s-w, s+w] x [t-w, t+w] in checker space
        w = width * getattr(self.mapping, "width_scale", 1.0)
        s0, s1 = s - w, s + w
        t0, t1 = t - w, t + w
        # average parity along each axis over the interval (pbrt CLOSEDFORM)
        sint = (_bumpint(s1) - _bumpint(s0)) / jnp.maximum(2.0 * w, 1e-12)
        tint = (_bumpint(t1) - _bumpint(t0)) / jnp.maximum(2.0 * w, 1e-12)
        area2 = sint + tint - 2.0 * sint * tint  # fraction of ODD checks
        area2 = jnp.clip(jnp.where(w > 1.0, 0.5, area2), 0.0, 1.0)
        if v1.ndim > area2.ndim:
            area2 = area2[..., None]
        filtered = (1.0 - area2) * v1 + area2 * v2
        # footprint-less lanes (w == 0) keep the exact point lookup
        use_filtered = w > 1e-9
        if v1.ndim > use_filtered.ndim:
            use_filtered = use_filtered[..., None]
        return jnp.where(use_filtered, filtered, point)


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
