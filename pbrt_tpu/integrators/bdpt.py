"""Bidirectional path tracing (pbrt-v3 ch. 16.3), wavefront SoA form.

Both subpaths are traced as fixed-length SoA vertex tables (length = the
static max depth), every (s, t) connection strategy is evaluated with a
static double loop of dense vector ops, and MIS weights use the balance
heuristic computed with pbrt's pdf-ratio walk (bdpt.cpp MISWeight) — all
[N]-wide arithmetic, no per-path recursion.

Strategy conventions (this module counts only camera SURFACE vertices in
t; pbrt's t includes the camera vertex, so pbrt-t = t + 1):

  * s = 0, t >= 1 : camera path hits an emitter (or escapes to an env map);
  * s = 1, t >= 1 : NEE connection to a light sample;
  * s >= 2, t >= 1: vertex-vertex connections;
  * s >= 2, t = 0 : light tracing to the pinhole lens, splatted through the
    film's splat channel (pbrt's t == 1 strategies) — enabled for pinhole
    perspective cameras.

Every strategy's MIS weight runs the same ratio walk with the connection
densities remapped at the two vertices adjacent to the connection edge
(pbrt's ScopedAssignment remaps), the light-origin densities at the path's
light end, and the camera ray density (Pdf_We) at the camera end.
Partitions outside the sampled set (depth caps, unhittable delta lights,
light tracing disabled) are excluded from every denominator so the
per-path weights still sum to one.

Like pbrt, the walk treats the light-position density of the NEE partition
and the light-tracing origin as the same uniform-area density — exact when
NEE samples lights uniformly by area (it does here).

Light subpaths start from area lights and point lights (env/distant are
covered by the s = 0/1 strategies and excluded from light-traced
partitions per lane).
"""

from __future__ import annotations

import logging

import numpy as np

import jax.numpy as jnp

from pbrt_tpu import PI, INV_PI, float_t
from pbrt_tpu.core.geometry import coordinate_system, shading_frame
from pbrt_tpu.core.sampling import cosine_sample_hemisphere
from pbrt_tpu.integrators.path import INF_T, SHADOW_EPS, PathIntegrator, _to_local, _to_world
from pbrt_tpu.materials import eval_material_params
from pbrt_tpu.materials import bsdf as B
from pbrt_tpu.scene.builder import compute_interaction

log = logging.getLogger("pbrt_tpu")

INV_4PI = 1.0 / (4.0 * PI)


def _dir_pdf_to_area(pdf_dir, p_from, p_to, n_to):
    """Solid-angle pdf at p_from -> area density at p_to."""
    d = p_to - p_from
    dist2 = jnp.sum(d * d, axis=-1)
    w = d / jnp.sqrt(jnp.maximum(dist2, 1e-20))[..., None]
    cos_to = jnp.abs(jnp.sum(n_to * (-w), axis=-1))
    return pdf_dir * cos_to / jnp.maximum(dist2, 1e-20)


def _remap0(x):
    """pbrt's remap0: use 1 in ratio products where a density is zero
    (delta interactions)."""
    return jnp.where(jnp.abs(x) < 1e-18, 1.0, x)


class _Vertex:
    """SoA vertex record (one bounce slot across the wavefront)."""

    __slots__ = ("p", "ns", "ss", "ts", "wo", "beta", "pdf_fwd", "pdf_rev",
                 "delta", "valid", "params", "is_light", "light_id")

    def __init__(self, n, dt):
        z3 = jnp.zeros((n, 3), dtype=dt)
        z1 = jnp.zeros((n,), dtype=dt)
        self.p = z3
        self.ns = z3
        self.ss = z3
        self.ts = z3
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
    provides_splats = True

    def __init__(self, compiled, max_depth=5):
        super().__init__(compiled, max_depth)
        self.t_max = max(2, min(int(max_depth) + 1, 6))  # camera surface verts
        self.s_max = max(1, min(int(max_depth), 5))  # light verts (incl. origin)
        cam = compiled.camera
        self.enable_t0 = bool(getattr(cam, "supports_light_tracing", False))
        # per-light tables for the s=0 walk terms (index = area-light id)
        from pbrt_tpu.lights import DiffuseAreaLight, PointLight

        nl_tr = sum(
            isinstance(lt, (DiffuseAreaLight, PointLight)) for lt in compiled.lights
        )
        origin_pdf = []
        for al in compiled.area_lights:
            origin_pdf.append(1.0 / (max(nl_tr, 1) * max(al.total_area, 1e-9)))
        self._origin_pdf_by_area_light = (
            jnp.asarray(np.asarray(origin_pdf, dtype=np.float32))
            if origin_pdf
            else None
        )
        self._nl_traceable = max(nl_tr, 1)

    # -- subpath tracing ----------------------------------------------------

    def _walk(self, sampler, key_xy, sidx, o, d, beta0, pdf_dir0, n_verts,
              dim_base, theta, origin_p=None, origin_ns=None, time=None):
        """Trace a subpath; returns (list[_Vertex], escape info, origin_rev).

        origin_rev (when origin_p given) = area density of re-reaching the
        subpath origin from vertex 0's sampled continuation — the stored
        qs[0].pdfRev of pbrt's light subpath.
        """
        c = self.c
        n = o.shape[0]
        dt = o.dtype
        verts = []
        beta = beta0
        alive = jnp.ones((n,), dtype=bool)
        pdf_dir = pdf_dir0
        prev_p = o
        esc_mask = jnp.zeros((n,), dtype=bool)
        esc_beta = jnp.zeros((n, 3), dtype=dt)
        esc_d = d
        esc_pdf = jnp.zeros((n,), dtype=dt)
        esc_first = jnp.zeros((n,), dtype=bool)
        origin_rev = jnp.zeros((n,), dtype=dt)

        for k in range(n_verts):
            base = dim_base + 7 * k
            hit = self._intersect(o, d, jnp.full((n,), INF_T, dtype=dt), time)
            esc_new = alive & ~hit["hit"]
            esc_beta = jnp.where(esc_new[..., None], beta, esc_beta)
            esc_d = jnp.where(esc_new[..., None], d, esc_d)
            esc_pdf = jnp.where(esc_new, pdf_dir, esc_pdf)
            if k == 0:
                esc_first = esc_new
            esc_mask = esc_mask | esc_new
            alive = alive & hit["hit"]
            si = compute_interaction(c.tables, hit, o, d, None, time)
            wo = si["wo"]
            ns, ss, ts = shading_frame(si, wo)
            params = eval_material_params(c.materials, si["mat"], si, theta)
            params["outside"] = jnp.sum(si["ns"] * wo, axis=-1) > 0.0

            v = _Vertex(n, dt)
            v.p = si["p"]
            v.ns = ns
            # tangent-aligned frame (hair) preserved for connection phases
            v.ss = ss
            v.ts = ts
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
            elif origin_p is not None:
                origin_rev = _dir_pdf_to_area(pdf_rev_dir, si["p"], origin_p, origin_ns)
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
        return verts, (esc_mask, esc_beta, esc_d, esc_pdf, esc_first), origin_rev

    # -- MIS ratio walks ------------------------------------------------------

    def _cam_side_sum(self, s, t, cam_verts, rc1, rc2, traceable, enable_t0,
                      rc1_first=None):
        """Sum of balance-heuristic ratios over camera-side partitions
        (t' = t-1 .. 0) of an L = s + t vertex path sampled with t camera
        surface vertices.  rc1/rc2 = connection-remapped reverse densities
        at cam_verts[t-1]/cam_verts[t-2].  rc1_first, when given, replaces
        rc1 in the FIRST term only (the s'=s+1 partition) while rc1 stays
        in the carried product — used by the s=0 walk where the first
        alternative is NEE (selection-weighted) but deeper alternatives are
        light-traced (origin density)."""
        L = s + t
        sum_ri = jnp.zeros(cam_verts[0].pdf_fwd.shape, dtype=cam_verts[0].pdf_fwd.dtype)
        ri = 1.0
        for i in range(t - 1, -1, -1):
            v = cam_verts[i]
            if i == t - 1:
                num = rc1
            elif i == t - 2:
                num = rc2
            else:
                num = v.pdf_rev
            ri = ri * _remap0(num) / _remap0(v.pdf_fwd)
            term = ri
            if i == t - 1 and rc1_first is not None:
                term = ri * _remap0(rc1_first) / _remap0(rc1)
            s_alt = L - i
            if s_alt > self.s_max:
                continue  # partition not sampled (light-depth cap)
            if i == 0:
                # t' = 0: light tracing to the lens
                if not enable_t0 or s_alt < 2:
                    continue
                usable = ~v.delta
            else:
                usable = ~v.delta & ~cam_verts[i - 1].delta
            if s_alt >= 2 and traceable is not None:
                usable = usable & traceable
            sum_ri = sum_ri + jnp.where(usable, term, 0.0)
        return sum_ri

    def _light_side_sum(self, s, t, light, rl1, rl2):
        """Sum of ratios over light-side partitions (s' = s-1 .. 0).

        light = dict(verts, origin_fwd, origin_rev, origin_delta,
        origin_hittable); LV(0) is the origin, LV(j>=1) = verts[j-1]."""
        L = s + t
        lv_list = light["verts"]
        sum_ri = jnp.zeros(
            light["origin_fwd"].shape, dtype=light["origin_fwd"].dtype
        )
        ri = 1.0
        for j in range(s - 1, -1, -1):
            if j == 0:
                fwd = light["origin_fwd"]
                delta_v = jnp.zeros(fwd.shape, dtype=bool)
            else:
                fwd = lv_list[j - 1].pdf_fwd
                delta_v = lv_list[j - 1].delta
            if j == s - 1:
                num = rl1
            elif j == s - 2:
                num = rl2
            elif j == 0:
                num = light["origin_rev"]
            else:
                num = lv_list[j - 1].pdf_rev
            ri = ri * _remap0(num) / _remap0(fwd)
            t_alt = L - j
            if t_alt > self.t_max:
                continue  # partition not sampled (camera-depth cap)
            if j == 0:
                usable = light["origin_hittable"]
            elif j == 1:
                # predecessor is the origin vertex, whose delta flag is
                # False (pbrt: position delta-ness enters only via the j=0
                # IsDeltaLight gate; the NEE partition exists for all kinds)
                usable = ~delta_v
            else:
                usable = ~delta_v & ~lv_list[j - 2].delta
            sum_ri = sum_ri + jnp.where(usable, ri, 0.0)
        return sum_ri

    # -- main ---------------------------------------------------------------

    def li(self, sampler, pixel_xy, sample_index, o, d, theta=None):
        # plain-radiance callers (sharded/grad paths) collect no splats, so
        # light-tracing strategies are neither sampled nor counted in any
        # MIS denominator here — the estimator stays unbiased either way.
        L, _ = self.li_splat(
            sampler, pixel_xy, sample_index, o, d, theta, enable_t0=False
        )
        return L

    def li_splat(self, sampler, pixel_xy, sample_index, o, d, theta=None,
                 enable_t0=None):
        c = self.c
        n = o.shape[0]
        dt = o.dtype
        L = jnp.zeros((n, 3), dtype=dt)
        splats = []
        enable_t0 = self.enable_t0 if enable_t0 is None else (
            enable_t0 and self.enable_t0
        )

        # one shutter time per path (pbrt-v3: the camera ray's time applies
        # to every vertex and connection of the BDPT path)
        time = (
            sampler.get(pixel_xy, sample_index, 4) if self._animated else None
        )

        cam = c.camera
        if enable_t0:
            cam_pdf_dir0 = cam.pdf_we_dir(d)
        else:
            cam_pdf_dir0 = jnp.ones((n,), dtype=dt)

        # ---- camera subpath --------------------------------------------
        cam_verts, (esc, esc_beta, esc_d, esc_pdf, esc_first), _ = self._walk(
            sampler, pixel_xy, sample_index, o, d,
            jnp.ones((n, 3), dtype=dt), cam_pdf_dir0,
            self.t_max, 5, theta, time=time,
        )

        # ---- s=0: escaped rays see infinite lights ----------------------
        # (env paths admit only the escape and NEE strategies, so the
        # pairwise weight is the full walk)
        env_le = self._env_radiance(esc_d, theta)
        light_pdf = self._env_pdf(o, esc_d)
        w_env = 1.0 / (1.0 + light_pdf / jnp.maximum(esc_pdf, 1e-12))
        w_env = jnp.where(esc_first, 1.0, w_env)
        L = L + jnp.where(esc[..., None], esc_beta * env_le * w_env[..., None], 0.0)

        # ---- s=0: camera vertices that are emitters ---------------------
        if c.area_lights:
            for tci in range(len(cam_verts)):
                t = tci + 1
                v = cam_verts[tci]
                le = self._emitted({"light": v.light_id, "ng": v.ns}, v.wo, theta)
                mask = v.valid & v.is_light
                if t == 1:
                    w = jnp.ones((n,), dtype=dt)
                else:
                    prev = cam_verts[tci - 1]
                    # rc1: light-subpath origin area density at this vertex
                    # (carried through the s'>=2 light-traced partitions)
                    rc1 = self._origin_pdf_by_area_light[
                        jnp.clip(v.light_id, 0, len(c.area_lights) - 1)
                    ]
                    # the first term (s'=1) is the NEE partition whose
                    # density carries the 1/n_lights selection instead of
                    # the 1/nl_traceable one (NEE is uniform-area here too)
                    rc1_nee = rc1 * self._nl_traceable / max(len(c.lights), 1)
                    # rc2: cosine-emission density toward the predecessor
                    cos_e = jnp.abs(jnp.sum(v.ns * v.wo, axis=-1))
                    rc2 = _dir_pdf_to_area(cos_e * INV_PI, v.p, prev.p, prev.ns)
                    sum_ri = self._cam_side_sum(
                        0, t, cam_verts[:t], rc1, rc2, mask, enable_t0,
                        rc1_first=rc1_nee,
                    )
                    w = 1.0 / (1.0 + sum_ri)
                L = L + jnp.where(mask[..., None], v.beta * le * w[..., None], 0.0)

        # ---- s=1: NEE from each camera vertex ---------------------------
        if c.lights:
            for tci in range(len(cam_verts)):
                t = tci + 1
                v = cam_verts[tci]
                base = 5 + 7 * tci
                u_sel = sampler.get(pixel_xy, sample_index, base + 0)
                u_l = sampler.get2(pixel_xy, sample_index, base + 1)
                (wi_w, li, l_pdf, l_dist, l_delta, l_info) = self._sample_one_light_ex(
                    v.p, u_sel, u_l, theta
                )
                ss, ts = v.ss, v.ts
                wo_l = _to_local(v.ns, ss, ts, v.wo)
                wi_l = _to_local(v.ns, ss, ts, wi_w)
                f = B.bsdf_eval(v.params, wo_l, wi_l)
                b_pdf = B.bsdf_pdf(v.params, wo_l, wi_l)
                can = v.valid & ~v.delta & (l_pdf > 0) & (jnp.max(f, axis=-1) > 0)
                shadow_o = v.p + v.ns * SHADOW_EPS * jnp.sign(
                    jnp.sum(wi_w * v.ns, axis=-1, keepdims=True)
                )
                occ = self._occluded(shadow_o, wi_w, l_dist - 2 * SHADOW_EPS, time)
                # light-side term (s'=0): camera continues and hits the light
                j0 = jnp.where(
                    l_info["hittable"] & (t + 1 <= self.t_max),
                    b_pdf / jnp.maximum(l_pdf, 1e-12),
                    0.0,
                )
                # camera-side terms: rc1 = emission density toward v
                rc1 = _dir_pdf_to_area(l_info["emit_pdf_dir"], l_info["p_l"], v.p, v.ns)
                if t >= 2:
                    prev = cam_verts[tci - 1]
                    b_rev = B.bsdf_pdf(v.params, wi_l, wo_l)
                    rc2 = _dir_pdf_to_area(b_rev, v.p, prev.p, prev.ns)
                else:
                    rc2 = jnp.zeros((n,), dtype=dt)
                cam_sum = self._cam_side_sum(
                    1, t, cam_verts[:t], rc1, rc2, l_info["traceable"], enable_t0
                )
                # delta, non-traceable lights (distant/spot/...) have no
                # alternative strategies: j0 and cam_sum are already 0 there
                w_l = 1.0 / (1.0 + j0 + cam_sum)
                contrib = (
                    v.beta * f * li
                    * (jnp.abs(wi_l[..., 2]) * w_l / jnp.maximum(l_pdf, 1e-12))[..., None]
                )
                L = L + jnp.where((can & ~occ)[..., None], contrib, 0.0)

        # ---- light subpath: s>=2 connections + t=0 light tracing --------
        if self._has_traceable_lights():
            (lo, ld, lbeta, lpdf_pos, lpdf_dir, l_ns,
             origin_delta, origin_hittable) = self._sample_light_origin(
                sampler, n, sample_index, theta
            )
            light_verts, _, origin_rev = self._walk(
                sampler,
                # decorrelate from camera dims with an offset pixel key
                pixel_xy + jnp.asarray([7919, 104729], jnp.int32),
                sample_index, lo, ld, lbeta, lpdf_dir,
                self.s_max, 5 + 7 * self.t_max, theta,
                origin_p=lo, origin_ns=l_ns, time=time,
            )
            light = {
                "verts": light_verts,
                "origin_fwd": lpdf_pos,
                "origin_rev": origin_rev,
                "origin_delta": origin_delta,
                "origin_hittable": origin_hittable,
            }

            for s in range(2, self.s_max + 1):
                lv = light_verts[s - 2]  # light vertex index s-1 => slot s-2
                lv_prev_p = lo if s == 2 else light_verts[s - 3].p
                lv_prev_ns = l_ns if s == 2 else light_verts[s - 3].ns
                ssl, tsl = lv.ss, lv.ts
                wo_lv = _to_local(lv.ns, ssl, tsl, lv.wo)

                # ---- t=0: light tracing to the pinhole (splat) ----------
                if enable_t0:
                    cam_pos = jnp.asarray(cam.cam_pos_world)
                    praster, in_view, cos_cam, distc = cam.project(lv.p)
                    to_cam = cam_pos[None, :] - lv.p
                    dc = jnp.sqrt(jnp.maximum(jnp.sum(to_cam * to_cam, axis=-1), 1e-20))
                    wi_cam_w = to_cam / dc[..., None]
                    wi_cam = _to_local(lv.ns, ssl, tsl, wi_cam_w)
                    f_l = B.bsdf_eval(lv.params, wo_lv, wi_cam)
                    wi_factor = 1.0 / jnp.maximum(
                        cam.film_area * cos_cam**3 * dc * dc, 1e-20
                    )
                    ok = (
                        lv.valid & ~lv.delta & in_view
                        & (jnp.max(f_l, axis=-1) > 0)
                    )
                    shadow_o = lv.p + lv.ns * SHADOW_EPS * jnp.sign(
                        jnp.sum(wi_cam_w * lv.ns, axis=-1, keepdims=True)
                    )
                    occ = self._occluded(shadow_o, wi_cam_w, dc - 2 * SHADOW_EPS, time)
                    # MIS: light-side walk with the camera densities
                    rl1 = _dir_pdf_to_area(cam.pdf_we_dir(-wi_cam_w), cam_pos[None, :], lv.p, lv.ns)
                    b_rev = B.bsdf_pdf(lv.params, wi_cam, wo_lv)
                    rl2 = _dir_pdf_to_area(b_rev, lv.p, lv_prev_p, lv_prev_ns)
                    w = 1.0 / (1.0 + self._light_side_sum(s, 0, light, rl1, rl2))
                    splat_L = (
                        lv.beta * f_l
                        * (jnp.abs(wi_cam[..., 2]) * wi_factor * w)[..., None]
                    )
                    splats.append((praster, splat_L, ok & ~occ))

                # ---- s>=2, t>=1 connections ------------------------------
                for tci in range(len(cam_verts)):
                    t = tci + 1
                    cv = cam_verts[tci]
                    conn = cv.valid & lv.valid & ~cv.delta & ~lv.delta
                    seg = lv.p - cv.p
                    dist2 = jnp.sum(seg * seg, axis=-1)
                    w_dir = seg / jnp.sqrt(jnp.maximum(dist2, 1e-20))[..., None]
                    # camera-side bsdf
                    ssc, tsc = cv.ss, cv.ts
                    wo_c = _to_local(cv.ns, ssc, tsc, cv.wo)
                    wi_c = _to_local(cv.ns, ssc, tsc, w_dir)
                    f_c = B.bsdf_eval(cv.params, wo_c, wi_c)
                    # light-side bsdf
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
                    occ = self._occluded(shadow_o, w_dir, dist - 2 * SHADOW_EPS, time)
                    # MIS: connection-edge densities (remapped at the four
                    # vertices adjacent to the connection)
                    pdf_c_dir = B.bsdf_pdf(cv.params, wo_c, wi_c)
                    pdf_l_dir = B.bsdf_pdf(lv.params, wo_lv, wi_lv)
                    rc1 = _dir_pdf_to_area(pdf_l_dir, lv.p, cv.p, cv.ns)
                    rl1 = _dir_pdf_to_area(pdf_c_dir, cv.p, lv.p, lv.ns)
                    pdf_c_rev = B.bsdf_pdf(cv.params, wi_c, wo_c)
                    pdf_l_rev = B.bsdf_pdf(lv.params, wi_lv, wo_lv)
                    if t >= 2:
                        pc = cam_verts[tci - 1]
                        rc2 = _dir_pdf_to_area(pdf_c_rev, cv.p, pc.p, pc.ns)
                    else:
                        rc2 = jnp.zeros((n,), dtype=dt)
                    rl2 = _dir_pdf_to_area(pdf_l_rev, lv.p, lv_prev_p, lv_prev_ns)
                    w = 1.0 / (
                        1.0
                        + self._cam_side_sum(
                            s, t, cam_verts[:t], rc1, rc2, None, enable_t0
                        )
                        + self._light_side_sum(s, t, light, rl1, rl2)
                    )
                    contrib = cv.beta * f_c * g[..., None] * f_l * lv.beta
                    L = L + jnp.where(
                        (conn & ~occ)[..., None], contrib * w[..., None], 0.0
                    )
        return L, splats

    # -- helpers -------------------------------------------------------------

    def _sample_one_light_ex(self, p, u_sel, u2, theta=None):
        """_sample_one_light plus the per-lane light info the MIS walks
        need: sampled point/its emission density toward p, whether the
        light is hittable by camera rays, and whether light subpaths can
        start from it."""
        from pbrt_tpu.lights import DiffuseAreaLight, PointLight

        wi, li, pdf, dist, delta = self._sample_one_light(p, u_sel, u2, theta)
        n = p.shape[0]
        dt = p.dtype
        n_lights = len(self.c.lights)
        pick = jnp.minimum((u_sel * n_lights).astype(jnp.int32), n_lights - 1)
        p_l = p + wi * jnp.minimum(dist, 1e7)[..., None]
        emit_pdf_dir = jnp.zeros((n,), dtype=dt)
        traceable = jnp.zeros((n,), dtype=bool)
        hittable = jnp.zeros((n,), dtype=bool)
        pdf_sel = pdf * n_lights  # undo the selection fold for per-light pdf
        for i, lt in enumerate(self.c.lights):
            mask = pick == i
            if isinstance(lt, DiffuseAreaLight):
                # recover |cos| at the light from the uniform-area pdf
                cos_l = dist * dist / jnp.maximum(
                    pdf_sel * lt.total_area, 1e-12
                )
                emit_pdf_dir = jnp.where(
                    mask, jnp.clip(cos_l, 0.0, 1.0) * INV_PI, emit_pdf_dir
                )
                traceable = traceable | mask
                hittable = hittable | mask
            elif isinstance(lt, PointLight):
                emit_pdf_dir = jnp.where(mask, INV_4PI, emit_pdf_dir)
                traceable = traceable | mask
            elif lt.is_infinite:
                hittable = hittable | mask  # escape strategy exists
        return wi, li, pdf, dist, delta, {
            "p_l": p_l,
            "emit_pdf_dir": emit_pdf_dir,
            "traceable": traceable,
            "hittable": hittable,
        }

    def _has_traceable_lights(self):
        from pbrt_tpu.lights import DiffuseAreaLight, PointLight

        return any(
            isinstance(lt, (DiffuseAreaLight, PointLight)) for lt in self.c.lights
        )

    def _sample_light_origin(self, sampler, n, sidx, theta):
        """Sample a light-subpath origin: returns (o, d, beta, pdf_pos_area,
        pdf_dir, normal, origin_delta, origin_hittable)."""
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
        # dims 0-4 under an offset pixel key by default; MLT's TableSampler
        # ignores pixel keys, so it assigns a disjoint dimension range here
        db = getattr(self, "light_origin_dim_base", 0) or 0
        u_sel = sampler.get(pkey, sidx, db + 0)
        pick = jnp.minimum((u_sel * nl).astype(jnp.int32), nl - 1)
        u_pos = sampler.get2(pkey, sidx, db + 1)
        u_dir = sampler.get2(pkey, sidx, db + 3)
        o = jnp.zeros((n, 3), jnp.float32)
        d = uniform_sample_sphere(u_dir)
        beta = jnp.zeros((n, 3), jnp.float32)
        pdf_pos = jnp.ones((n,), jnp.float32)
        pdf_dir = jnp.ones((n,), jnp.float32)
        nrm = jnp.zeros((n, 3), jnp.float32)
        origin_delta = jnp.zeros((n,), dtype=bool)
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
                origin_delta = origin_delta | mask
            else:
                x, _, tri_idx = lt.area_dist.sample_continuous(u_pos[..., 0])
                frac = jnp.clip(x * lt.area_dist.n - tri_idx, 0.0, 0.999999)
                b = uniform_sample_triangle(jnp.stack([frac, u_pos[..., 1]], axis=-1))
                from pbrt_tpu.ops.tables import select_rows

                rows = select_rows(lt._tri_cols, tri_idx)
                p0, p1, p2, n_l = (
                    rows[:, 0:3], rows[:, 3:6], rows[:, 6:9], rows[:, 9:12]
                )
                oi = p0 + b[..., 0:1] * (p1 - p0) + b[..., 1:2] * (p2 - p0)
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
        return o, d, beta, pdf_pos, pdf_dir, nrm, origin_delta, ~origin_delta
