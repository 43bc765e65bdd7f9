"""Bidirectional path tracing (pbrt-v3 ch. 16.3), wavefront SoA form.

Both subpaths are traced as fixed-length SoA vertex tables (length = the
static max depth), every (s, t) connection strategy is evaluated with a
static double loop of dense vector ops, and MIS weights use the balance
heuristic computed with pbrt's pdf-ratio walk — all [N]-wide arithmetic,
no per-path recursion.

Round-1 scope (documented):
  * strategies: s = 0 (camera path hits emitter), s = 1 (NEE connection to
    a light sample), s >= 2 (vertex-vertex connections); t >= 2.  The
    t = 1 light-tracing-to-lens strategies are not sampled, and are
    correspondingly excluded from every MIS denominator, so the estimator
    stays unbiased without them.
  * connections only at non-specular vertices (standard practice);
  * light subpaths start from area lights and point lights (env/distant
    handled by the s = 0/1 strategies).

Vertex tables per subpath: p, ns, wo, beta, pdf_fwd/pdf_rev (area
densities), delta flag, material params; all [N, depth].
"""

from __future__ import annotations

import logging

import numpy as np

import jax.numpy as jnp

from pbrt_tpu import PI, float_t
from pbrt_tpu.core.geometry import coordinate_system, shading_frame, vface_forward
from pbrt_tpu.core.sampling import cosine_sample_hemisphere
from pbrt_tpu.integrators.path import INF_T, SHADOW_EPS, PathIntegrator, _to_local, _to_world
from pbrt_tpu.materials import eval_material_params
from pbrt_tpu.materials import bsdf as B
from pbrt_tpu.scene.builder import compute_interaction

log = logging.getLogger("pbrt_tpu")


def _dir_pdf_to_area(pdf_dir, p_from, p_to, n_to):
    """Solid-angle pdf at p_from -> area density at p_to."""
    d = p_to - p_from
    dist2 = jnp.sum(d * d, axis=-1)
    w = d / jnp.sqrt(jnp.maximum(dist2, 1e-20))[..., None]
    cos_to = jnp.abs(jnp.sum(n_to * (-w), axis=-1))
    return pdf_dir * cos_to / jnp.maximum(dist2, 1e-20)


class _Vertex:
    """SoA vertex record (one bounce slot across the wavefront)."""

    __slots__ = ("p", "ns", "wo", "beta", "pdf_fwd", "pdf_rev", "delta",
                 "valid", "params", "is_light", "light_id")

    def __init__(self, n, dt):
        z3 = jnp.zeros((n, 3), dtype=dt)
        z1 = jnp.zeros((n,), dtype=dt)
        self.p = z3
        self.ns = z3
        self.wo = z3
        self.beta = z3
        self.pdf_fwd = z1
        self.pdf_rev = z1
        self.delta = jnp.zeros((n,), dtype=bool)
        self.valid = jnp.zeros((n,), dtype=bool)
        self.params = None
        self.is_light = jnp.zeros((n,), dtype=bool)
        self.light_id = jnp.full((n,), -1, jnp.int32)


class BDPTIntegrator(PathIntegrator):
    def __init__(self, compiled, max_depth=5):
        super().__init__(compiled, max_depth)
        self.t_max = max(2, min(int(max_depth) + 1, 6))  # camera vertices
        self.s_max = max(1, min(int(max_depth), 5))  # light vertices

    # -- subpath tracing ----------------------------------------------------

    def _walk(self, sampler, key_xy, sidx, o, d, beta0, pdf_dir0, n_verts,
              dim_base, theta):
        """Trace a subpath; returns (list[_Vertex], escaped_dir_info)."""
        c = self.c
        n = o.shape[0]
        dt = o.dtype
        verts = []
        beta = beta0
        alive = jnp.ones((n,), dtype=bool)
        pdf_dir = pdf_dir0
        prev_p = o
        prev_ns = None
        esc_mask = jnp.zeros((n,), dtype=bool)
        esc_beta = jnp.zeros((n, 3), dtype=dt)
        esc_d = d
        esc_pdf = jnp.zeros((n,), dtype=dt)

        for k in range(n_verts):
            base = dim_base + 7 * k
            hit = c.intersector.intersect(o, d, jnp.full((n,), INF_T, dtype=dt))
            esc_new = alive & ~hit["hit"]
            esc_beta = jnp.where(esc_new[..., None], beta, esc_beta)
            esc_d = jnp.where(esc_new[..., None], d, esc_d)
            esc_pdf = jnp.where(esc_new, pdf_dir, esc_pdf)
            esc_mask = esc_mask | esc_new
            alive = alive & hit["hit"]
            si = compute_interaction(c.tables, hit, o, d)
            wo = si["wo"]
            ns, ss, ts = shading_frame(si, wo)
            params = eval_material_params(c.materials, si["mat"], si, theta)
            params["outside"] = jnp.sum(si["ns"] * wo, axis=-1) > 0.0

            v = _Vertex(n, dt)
            v.p = si["p"]
            v.ns = ns
            v.wo = wo
            v.beta = beta
            v.valid = alive & (si["mat"] >= 0)
            v.params = params
            v.is_light = si["light"] >= 0
            v.light_id = si["light"]
            v.pdf_fwd = _dir_pdf_to_area(pdf_dir, prev_p, si["p"], ns)
            verts.append(v)

            if k == n_verts - 1:
                break
            wo_l = _to_local(ns, ss, ts, wo)
            u_lobe = sampler.get(key_xy, sidx, base + 3)
            u_b = sampler.get2(key_xy, sidx, base + 4)
            wi_l, f, pdf, spec = B.bsdf_sample(params, wo_l, u_lobe, u_b)
            wi_w = _to_world(ns, ss, ts, wi_l)
            v.delta = spec
            ok = v.valid & (pdf > 0.0) & (jnp.max(f, axis=-1) > 0.0)
            # reverse pdf of the PREVIOUS vertex (direction wi -> wo swapped)
            pdf_rev_dir = B.bsdf_pdf(params, wi_l, wo_l)
            if k > 0:
                verts[k - 1].pdf_rev = _dir_pdf_to_area(
                    pdf_rev_dir, si["p"], verts[k - 1].p, verts[k - 1].ns
                )
            beta = jnp.where(
                ok[..., None],
                beta * f * (jnp.abs(wi_l[..., 2]) / jnp.maximum(pdf, 1e-12))[..., None],
                beta,
            )
            alive = ok
            prev_p = si["p"]
            o = si["p"] + si["ng"] * SHADOW_EPS * jnp.sign(
                jnp.sum(wi_w * si["ng"], axis=-1, keepdims=True)
            )
            d = wi_w
            pdf_dir = pdf
        return verts, (esc_mask, esc_beta, esc_d, esc_pdf)

    # -- MIS ----------------------------------------------------------------

    @staticmethod
    def _mis_weight(cam_verts, light_verts, s, t, pdf_light_area, pdf_connect_cam,
                    pdf_connect_light):
        """Balance-heuristic weight for strategy (s, t) on total length s+t.

        Implements pbrt's ratio walk: sum r_i over alternate strategies
        with the connection-edge densities substituted.  Delta vertices
        zero their ratios.  t=1 strategies are excluded by construction.
        """
        one = 1.0
        sum_ri = 0.0
        # walk back over the camera subpath: strategies with smaller t
        ri = one
        for i in range(t - 1, 0, -1):
            v = cam_verts[i]
            num = pdf_connect_cam if i == t - 1 else v.pdf_rev
            den = v.pdf_fwd
            ri = ri * num / jnp.maximum(den, 1e-18)
            usable = ~v.delta & (
                ~cam_verts[i - 1].delta if i - 1 > 0 else jnp.zeros_like(v.delta)
            ) if False else ~v.delta
            # exclude the (s', t'=1) strategy (not sampled): stop before t'==1
            if i >= 2:
                sum_ri = sum_ri + jnp.where(usable, ri, 0.0)
        # walk back over the light subpath: strategies with smaller s
        ri = one
        for j in range(s - 1, -1, -1):
            v = light_verts[j]
            num = pdf_connect_light if j == s - 1 else v.pdf_rev
            den = v.pdf_fwd if j > 0 else pdf_light_area
            ri = ri * num / jnp.maximum(den, 1e-18)
            usable = ~v.delta
            sum_ri = sum_ri + jnp.where(usable, ri, 0.0)
        return 1.0 / (1.0 + sum_ri)

    # -- main ---------------------------------------------------------------

    def li(self, sampler, pixel_xy, sample_index, o, d, theta=None):
        c = self.c
        n = o.shape[0]
        dt = o.dtype
        L = jnp.zeros((n, 3), dtype=dt)

        # ---- camera subpath --------------------------------------------
        cam_verts, (esc, esc_beta, esc_d, esc_pdf) = self._walk(
            sampler, pixel_xy, sample_index, o, d,
            jnp.ones((n, 3), dtype=dt), jnp.ones((n,), dtype=dt),
            self.t_max, 5, theta,
        )

        # ---- s=0: escaped rays see infinite lights ----------------------
        env_le = self._env_radiance(esc_d, theta)
        # weight vs the s=1 NEE strategy at the previous vertex
        light_pdf = self._env_pdf(o, esc_d)
        w_env = 1.0 / (1.0 + light_pdf / jnp.maximum(esc_pdf, 1e-12))
        first_esc = esc & (esc_pdf == 1.0)  # camera ray itself escaped
        w_env = jnp.where(first_esc, 1.0, w_env)
        L = L + jnp.where(esc[..., None], esc_beta * env_le * w_env[..., None], 0.0)

        # ---- s=0: camera vertices that are emitters ---------------------
        if c.area_lights:
            for tci in range(len(cam_verts)):
                v = cam_verts[tci]
                le = self._emitted(
                    {"light": v.light_id, "ng": v.ns}, v.wo, theta
                )
                mask = v.valid & v.is_light
                if tci == 0:
                    w = jnp.ones((n,), dtype=dt)
                else:
                    prev = cam_verts[tci - 1]
                    # weight vs the s=1 NEE strategy at the previous vertex
                    # (area-density ratio; delta predecessors get weight 1)
                    al_pdf_dir = self._area_light_pdf(
                        prev.p, {"light": v.light_id, "ng": v.ns, "p": v.p},
                        -v.wo,
                    )
                    al_pdf_area = _dir_pdf_to_area(al_pdf_dir, prev.p, v.p, v.ns)
                    w = jnp.where(
                        prev.delta,
                        1.0,
                        1.0 / (1.0 + al_pdf_area / jnp.maximum(v.pdf_fwd, 1e-18)),
                    )
                L = L + jnp.where(mask[..., None], v.beta * le * w[..., None], 0.0)

        # ---- s=1: NEE from each camera vertex ---------------------------
        if c.lights:
            for tci in range(len(cam_verts)):
                v = cam_verts[tci]
                base = 5 + 7 * tci
                u_sel = sampler.get(pixel_xy, sample_index, base + 0)
                u_l = sampler.get2(pixel_xy, sample_index, base + 1)
                wi_w, li, l_pdf, l_dist, l_delta = self._sample_one_light(
                    v.p, u_sel, u_l, theta
                )
                ss, ts = coordinate_system(v.ns)
                wo_l = _to_local(v.ns, ss, ts, v.wo)
                wi_l = _to_local(v.ns, ss, ts, wi_w)
                f = B.bsdf_eval(v.params, wo_l, wi_l)
                b_pdf = B.bsdf_pdf(v.params, wo_l, wi_l)
                can = v.valid & ~v.delta & (l_pdf > 0) & (jnp.max(f, axis=-1) > 0)
                shadow_o = v.p + v.ns * SHADOW_EPS * jnp.sign(
                    jnp.sum(wi_w * v.ns, axis=-1, keepdims=True)
                )
                occ = c.intersector.occluded(shadow_o, wi_w, l_dist - 2 * SHADOW_EPS)
                w_l = jnp.where(
                    l_delta, 1.0, 1.0 / (1.0 + b_pdf / jnp.maximum(l_pdf, 1e-12))
                )
                contrib = (
                    v.beta * f * li
                    * (jnp.abs(wi_l[..., 2]) * w_l / jnp.maximum(l_pdf, 1e-12))[..., None]
                )
                L = L + jnp.where((can & ~occ)[..., None], contrib, 0.0)

        # ---- light subpath + s>=2 connections ---------------------------
        if self._has_traceable_lights():
            lo, ld, lbeta, lpdf_pos, lpdf_dir, l_ns = self._sample_light_origin(
                sampler, n, sample_index, theta
            )
            light_verts, _ = self._walk(
                sampler,
                # decorrelate from camera dims with an offset pixel key
                pixel_xy + jnp.asarray([7919, 104729], jnp.int32),
                sample_index, lo, ld, lbeta, lpdf_dir,
                self.s_max, 5 + 7 * self.t_max, theta,
            )
            for s in range(2, self.s_max + 1):
                lv = light_verts[s - 2]  # light vertex index s-1 => slot s-2
                for t in range(2, self.t_max + 1):
                    cv = cam_verts[t - 1]
                    conn = cv.valid & lv.valid & ~cv.delta & ~lv.delta
                    seg = lv.p - cv.p
                    dist2 = jnp.sum(seg * seg, axis=-1)
                    w_dir = seg / jnp.sqrt(jnp.maximum(dist2, 1e-20))[..., None]
                    # camera-side bsdf
                    ssc, tsc = coordinate_system(cv.ns)
                    wo_c = _to_local(cv.ns, ssc, tsc, cv.wo)
                    wi_c = _to_local(cv.ns, ssc, tsc, w_dir)
                    f_c = B.bsdf_eval(cv.params, wo_c, wi_c)
                    # light-side bsdf
                    ssl, tsl = coordinate_system(lv.ns)
                    wo_lv = _to_local(lv.ns, ssl, tsl, lv.wo)
                    wi_lv = _to_local(lv.ns, ssl, tsl, -w_dir)
                    f_l = B.bsdf_eval(lv.params, wo_lv, wi_lv)
                    g = (
                        jnp.abs(wi_c[..., 2]) * jnp.abs(wi_lv[..., 2])
                        / jnp.maximum(dist2, 1e-20)
                    )
                    any_f = (jnp.max(f_c, axis=-1) > 0) & (jnp.max(f_l, axis=-1) > 0)
                    conn = conn & any_f & (g > 0)
                    shadow_o = cv.p + cv.ns * SHADOW_EPS * jnp.sign(
                        jnp.sum(w_dir * cv.ns, axis=-1, keepdims=True)
                    )
                    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
                    occ = c.intersector.occluded(shadow_o, w_dir, dist - 2 * SHADOW_EPS)
                    # MIS: connection-edge densities
                    pdf_c_dir = B.bsdf_pdf(cv.params, wo_c, wi_c)
                    pdf_l_dir = B.bsdf_pdf(lv.params, wo_lv, wi_lv)
                    pdf_connect_cam = _dir_pdf_to_area(pdf_l_dir, lv.p, cv.p, cv.ns)
                    pdf_connect_light = _dir_pdf_to_area(pdf_c_dir, cv.p, lv.p, lv.ns)
                    w = self._mis_weight(
                        cam_verts, light_verts, s, t,
                        lpdf_pos, pdf_connect_cam, pdf_connect_light,
                    )
                    contrib = cv.beta * f_c * g[..., None] * f_l * lv.beta
                    L = L + jnp.where(
                        (conn & ~occ)[..., None], contrib * w[..., None], 0.0
                    )
        return L

    # -- helpers -------------------------------------------------------------

    def _fwd_dir_pdf(self, v, prev):
        """Area pdf of reaching v from prev via BSDF sampling (stored)."""
        return v.pdf_fwd

    def _has_traceable_lights(self):
        from pbrt_tpu.lights import DiffuseAreaLight, PointLight

        return any(
            isinstance(lt, (DiffuseAreaLight, PointLight)) for lt in self.c.lights
        )

    def _sample_light_origin(self, sampler, n, sidx, theta):
        """Sample a light-subpath origin: returns (o, d, beta, pdf_pos_area,
        pdf_dir, normal)."""
        from pbrt_tpu.core.sampling import uniform_sample_sphere, uniform_sample_triangle
        from pbrt_tpu.lights import DiffuseAreaLight, PointLight

        c = self.c
        lane = jnp.arange(n, dtype=jnp.int32)
        pkey = jnp.stack([lane, jnp.full_like(lane, -13)], axis=-1)
        traceable = [
            (i, lt)
            for i, lt in enumerate(c.lights)
            if isinstance(lt, (DiffuseAreaLight, PointLight))
        ]
        nl = len(traceable)
        u_sel = sampler.get(pkey, sidx, 0)
        pick = jnp.minimum((u_sel * nl).astype(jnp.int32), nl - 1)
        u_pos = sampler.get2(pkey, sidx, 1)
        u_dir = sampler.get2(pkey, sidx, 3)
        o = jnp.zeros((n, 3), jnp.float32)
        d = uniform_sample_sphere(u_dir)
        beta = jnp.zeros((n, 3), jnp.float32)
        pdf_pos = jnp.ones((n,), jnp.float32)
        pdf_dir = jnp.ones((n,), jnp.float32)
        nrm = jnp.zeros((n, 3), jnp.float32)
        for k, (i, lt) in enumerate(traceable):
            mask = pick == k
            if isinstance(lt, PointLight):
                oi = jnp.broadcast_to(lt._pd, (n, 3))
                di = uniform_sample_sphere(u_dir)
                pp = jnp.ones((n,), jnp.float32)
                pd = jnp.full((n,), 1.0 / (4 * PI), jnp.float32)
                bi = jnp.broadcast_to(lt._id, (n, 3)) / (
                    (1.0 / nl) * pp * pd
                )[..., None]
                ni = di
            else:
                x, _, tri_idx = lt.area_dist.sample_continuous(u_pos[..., 0])
                frac = jnp.clip(x * lt.area_dist.n - tri_idx, 0.0, 0.999999)
                b = uniform_sample_triangle(jnp.stack([frac, u_pos[..., 1]], axis=-1))
                p0 = lt.tri_p0[tri_idx]
                p1 = lt.tri_p1[tri_idx]
                p2 = lt.tri_p2[tri_idx]
                oi = p0 + b[..., 0:1] * (p1 - p0) + b[..., 1:2] * (p2 - p0)
                n_l = lt.tri_n[tri_idx]
                local = cosine_sample_hemisphere(u_dir)
                s1, s2 = coordinate_system(n_l)
                di = local[..., 0:1] * s1 + local[..., 1:2] * s2 + local[..., 2:3] * n_l
                cos_l = jnp.maximum(local[..., 2], 1e-6)
                pp = jnp.full((n,), 1.0 / max(lt.total_area, 1e-9), jnp.float32)
                pd = cos_l / PI
                le = jnp.broadcast_to(lt._ld, (n, 3))
                bi = le * (cos_l / ((1.0 / nl) * pp * pd))[..., None]
                oi = oi + n_l * SHADOW_EPS
                ni = n_l
            o = jnp.where(mask[..., None], oi, o)
            d = jnp.where(mask[..., None], di, d)
            beta = jnp.where(mask[..., None], bi, beta)
            pdf_pos = jnp.where(mask, pp / nl, pdf_pos)
            pdf_dir = jnp.where(mask, pd, pdf_dir)
            nrm = jnp.where(mask[..., None], ni, nrm)
        return o, d, beta, pdf_pos, pdf_dir, nrm
