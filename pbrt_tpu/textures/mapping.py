"""Texture coordinate mappings (pbrt-v3 §10.2), batched.

Each mapping maps an SoA interaction dict to (s, t) arrays of shape [N].
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pbrt_tpu import INV_2PI, INV_PI, float_t
from pbrt_tpu.core.transform import Transform, apply_point


class UVMapping2D:
    """(u,v) scaled/offset: s = su*u + du, t = sv*v + dv."""

    def __init__(self, su=1.0, sv=1.0, du=0.0, dv=0.0):
        self.su, self.sv, self.du, self.dv = (
            float(su),
            float(sv),
            float(du),
            float(dv),
        )
        # scale factors for uv-space ray-differential footprints
        # (other mappings default to 1 via getattr)
        self.width_scale = max(abs(self.su), abs(self.sv))
        self.width_vec = (self.su, self.sv)

    def map(self, si):
        uv = si["uv"]
        return self.su * uv[..., 0] + self.du, self.sv * uv[..., 1] + self.dv


class SphericalMapping2D:
    def __init__(self, world_to_texture: Transform):
        self.w2t = jnp.asarray(world_to_texture.m.astype(float_t))

    def map(self, si):
        p = apply_point(self.w2t, si["p"])
        vec = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
        theta = jnp.arccos(jnp.clip(vec[..., 2], -1.0, 1.0))
        phi = jnp.arctan2(vec[..., 1], vec[..., 0])
        phi = jnp.where(phi < 0, phi + 2 * np.pi, phi)
        return theta * INV_PI, phi * INV_2PI


class CylindricalMapping2D:
    def __init__(self, world_to_texture: Transform):
        self.w2t = jnp.asarray(world_to_texture.m.astype(float_t))

    def map(self, si):
        p = apply_point(self.w2t, si["p"])
        phi = jnp.arctan2(p[..., 1], p[..., 0])
        phi = jnp.where(phi < 0, phi + 2 * np.pi, phi)
        return phi * INV_2PI, p[..., 2]


class PlanarMapping2D:
    def __init__(self, vs, vt, ds=0.0, dt=0.0):
        self.vs = jnp.asarray(np.asarray(vs, dtype=float_t))
        self.vt = jnp.asarray(np.asarray(vt, dtype=float_t))
        self.ds, self.dt = float(ds), float(dt)

    def map(self, si):
        p = si["p"]
        return (
            self.ds + jnp.sum(p * self.vs, axis=-1),
            self.dt + jnp.sum(p * self.vt, axis=-1),
        )


class TransformMapping3D:
    def __init__(self, world_to_texture: Transform):
        self.w2t = jnp.asarray(world_to_texture.m.astype(float_t))

    def map(self, si):
        return apply_point(self.w2t, si["p"])


def mapping_from_params(tp, tex2world: Transform):
    """Build the 2D mapping requested by the 'mapping' parameter
    (pbrt-v3 CreateCheckerboard/ImageTexture pattern)."""
    map_type = tp.find_string("mapping", "uv")
    if map_type == "uv":
        return UVMapping2D(
            tp.find_float("uscale", 1.0),
            tp.find_float("vscale", 1.0),
            tp.find_float("udelta", 0.0),
            tp.find_float("vdelta", 0.0),
        )
    if map_type == "spherical":
        return SphericalMapping2D(tex2world.inverse())
    if map_type == "cylindrical":
        return CylindricalMapping2D(tex2world.inverse())
    if map_type == "planar":
        return PlanarMapping2D(
            tp.find_vector3f("v1", np.array([1.0, 0.0, 0.0])),
            tp.find_vector3f("v2", np.array([0.0, 1.0, 0.0])),
            tp.find_float("udelta", 0.0),
            tp.find_float("vdelta", 0.0),
        )
    import logging

    logging.getLogger("pbrt_tpu").error("2D texture mapping '%s' unknown", map_type)
    return UVMapping2D()
