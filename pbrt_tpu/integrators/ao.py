"""Ambient-occlusion integrator (pbrt-v3 AOIntegrator).

One cosine-weighted occlusion sample per camera ray: L = visibility of the
hemisphere, independent of scene lights.
"""

from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.core.geometry import coordinate_system, vface_forward
from pbrt_tpu.core.sampling import cosine_sample_hemisphere
from pbrt_tpu.integrators.path import INF_T, SHADOW_EPS
from pbrt_tpu.scene.builder import compute_interaction


class AOIntegrator:
    def __init__(self, compiled, cos_sample=True, n_samples=1, max_dist=None):
        self.c = compiled
        self.cos_sample = bool(cos_sample)
        self.n_samples = max(1, int(n_samples))
        self.max_dist = max_dist

    def li(self, sampler, pixel_xy, sample_index, o, d, theta=None):
        c = self.c
        n = o.shape[0]
        hit = c.intersector.intersect(o, d, jnp.full((n,), INF_T, dtype=o.dtype))
        si = compute_interaction(c.tables, hit, o, d)
        ns = vface_forward(si["ns"], si["wo"])
        ss, ts = coordinate_system(ns)
        max_dist = self.max_dist if self.max_dist is not None else INF_T
        acc = jnp.zeros((n,), dtype=o.dtype)
        for s in range(self.n_samples):
            u2 = sampler.get2(pixel_xy, sample_index, 5 + 2 * s)
            w_local = cosine_sample_hemisphere(u2)
            wi = (
                w_local[..., 0:1] * ss
                + w_local[..., 1:2] * ts
                + w_local[..., 2:3] * ns
            )
            shadow_o = si["p"] + ns * SHADOW_EPS
            occ = c.intersector.occluded(
                shadow_o, wi, jnp.full((n,), max_dist, dtype=o.dtype)
            )
            acc = acc + jnp.where(hit["hit"] & ~occ, 1.0, 0.0)
        v = acc / self.n_samples
        # background stays white (unoccluded)
        v = jnp.where(hit["hit"], v, 1.0)
        return jnp.stack([v, v, v], axis=-1)
