"""Keyframed-triangle intersection for motion blur.

The reference parses shutter times and keeps the 2-slot animated
``TransformSet`` (api.rs:157-198) but never renders; pbrt-v3 interpolates
the transform at each ray's time and transforms the ray.  The TPU
formulation avoids per-lane matrix work entirely: the host bakes K
world-space vertex keyframes per animated shape (decompose + slerp,
core/animated.py — K adapts to the rotation angle so the per-segment
linear chord stays within tolerance of the slerp arc), and the wavefront
blends vertex positions with per-lane piecewise-linear hat weights
``w_k(t) = max(0, 1 - |t (K-1) - k|)`` — every inner-loop op is a dense
[N]-vector fma, no gathers, no matrix inversions.

Time is a pure function of (pixel, sample index, dimension 4), so motion
blur keeps the determinism contract (CLAUDE.md): renders are bit-stable
across batch sizes and mesh shapes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pbrt_tpu import float_t
from pbrt_tpu.ops.intersect import KIND_NONE, KIND_TRI, RAY_EPS


def time_weights(time_norm, n_keys: int):
    """[N] normalized times in [0,1] -> [N, K] hat-function weights."""
    x = jnp.clip(time_norm, 0.0, 1.0) * (n_keys - 1)
    k = jnp.arange(n_keys, dtype=time_norm.dtype)[None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - k))


class AnimatedTriIntersector:
    """Brute-force sweep over K-keyframed triangles with per-lane time.

    ``key_tris``: K TriangleData with identical topology (same count/order);
    key k holds world-space vertices at shutter time k/(K-1).
    Same hit contract as the static intersectors, plus the ``time`` kwarg
    ([N] in [0,1]; None = shutter open).
    """

    def __init__(self, key_tris):
        self.n_keys = len(key_tris)
        self.n_tri = key_tris[0].count
        self.n_sph = 0
        # [T, K, 9] per-prim per-key vertex scalars
        cols = np.stack(
            [
                np.concatenate(
                    [kt.p0.astype(float_t), kt.p1.astype(float_t),
                     kt.p2.astype(float_t)], axis=1,
                )
                for kt in key_tris
            ],
            axis=1,
        )
        self.cols = jnp.asarray(cols)

    def _weights(self, time, n, dt):
        if time is None:
            time = jnp.zeros((n,), dtype=dt)
        return time_weights(jnp.broadcast_to(time, (n,)).astype(dt), self.n_keys)

    def intersect(self, o, d, t_max, time=None):
        n = o.shape[0]
        dt = o.dtype
        w = self._weights(time, n, dt)  # [N, K]
        ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
        dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]

        def blend(cols_k, j):
            # cols_k: [K, 9]; per-lane blended scalar column j -> [N]
            acc = w[:, 0] * cols_k[0, j]
            for k in range(1, self.n_keys):
                acc = acc + w[:, k] * cols_k[k, j]
            return acc

        def body(carry, cols_k):
            bt, bp, b0a, b1a, k = carry
            p0x, p0y, p0z = blend(cols_k, 0), blend(cols_k, 1), blend(cols_k, 2)
            p1x, p1y, p1z = blend(cols_k, 3), blend(cols_k, 4), blend(cols_k, 5)
            p2x, p2y, p2z = blend(cols_k, 6), blend(cols_k, 7), blend(cols_k, 8)
            e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
            e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = jnp.where(
                jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0
            )
            tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
            b0 = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            b1 = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            ok = (
                (jnp.abs(det) > 1e-12)
                & (b0 >= 0.0)
                & (b1 >= 0.0)
                & (b0 + b1 <= 1.0)
                & (tt > RAY_EPS)
                & (tt < bt)
            )
            bt = jnp.where(ok, tt, bt)
            bp = jnp.where(ok, k, bp)
            b0a = jnp.where(ok, b0, b0a)
            b1a = jnp.where(ok, b1, b1a)
            return (bt, bp, b0a, b1a, k + 1), None

        init = (
            jnp.broadcast_to(t_max, (n,)).astype(dt),
            jnp.full((n,), -1, jnp.int32),
            jnp.zeros((n,), dt),
            jnp.zeros((n,), dt),
            jnp.int32(0),
        )
        (bt, bp, b0a, b1a, _), _ = jax.lax.scan(body, init, self.cols)
        got = bp >= 0
        return {
            "t": bt,
            "hit": got,
            "kind": jnp.where(got, KIND_TRI, KIND_NONE),
            "prim": jnp.maximum(bp, 0),
            "b0": b0a,
            "b1": b1a,
        }

    def occluded(self, o, d, t_max, time=None):
        return self.intersect(o, d, t_max, time)["hit"]


class AnimatedIntersector:
    """Animated triangles + static analytic spheres, merged hit records."""

    def __init__(self, key_tris, sph_data):
        from pbrt_tpu.ops.intersect import KIND_SPHERE
        from pbrt_tpu.ops.intersect_soa import SoABruteForceIntersector

        self._kind_sphere = KIND_SPHERE
        self.tris = AnimatedTriIntersector(key_tris) if key_tris[0].count else None
        self.n_tri = key_tris[0].count
        self.n_sph = sph_data.count if sph_data is not None else 0
        self._sph = (
            SoABruteForceIntersector(None, sph_data) if self.n_sph else None
        )

    def intersect(self, o, d, t_max, time=None):
        n = o.shape[0]
        if self.tris is not None:
            out = self.tris.intersect(o, d, t_max, time)
        else:
            out = {
                "t": jnp.broadcast_to(t_max, (n,)).astype(o.dtype),
                "hit": jnp.zeros((n,), bool),
                "kind": jnp.full((n,), KIND_NONE, jnp.int32),
                "prim": jnp.zeros((n,), jnp.int32),
                "b0": jnp.zeros((n,), o.dtype),
                "b1": jnp.zeros((n,), o.dtype),
            }
        if self._sph is not None:
            sph = self._sph.intersect(o, d, out["t"])
            closer = sph["hit"] & (sph["t"] < out["t"])
            out = {
                "t": jnp.where(closer, sph["t"], out["t"]),
                "hit": out["hit"] | closer,
                "kind": jnp.where(closer, self._kind_sphere, out["kind"]),
                "prim": jnp.where(closer, sph["prim"], out["prim"]),
                "b0": jnp.where(closer, 0.0, out["b0"]),
                "b1": jnp.where(closer, 0.0, out["b1"]),
            }
        return out

    def occluded(self, o, d, t_max, time=None):
        occ = jnp.zeros(o.shape[:-1], bool)
        if self.tris is not None:
            occ = self.tris.occluded(o, d, t_max, time)
        if self._sph is not None:
            occ = occ | self._sph.occluded(o, d, t_max)
        return occ
