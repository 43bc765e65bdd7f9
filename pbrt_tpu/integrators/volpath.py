"""Volumetric path integrator (pbrt-v3 §15.3 semantics, wavefront form).

Extends the surface path loop with per-lane medium tracking: every lane
carries a medium id (-1 = vacuum).  Each bounce first samples a medium
interaction against the surface hit distance; scattered lanes do a
phase-function event (NEE with transmittance + Henyey-Greenstein
direction), surviving lanes shade the surface as usual.  Crossing a
surface whose shape declared a MediumInterface switches the lane's medium
(entering -> inside, exiting -> outside).

Null-material boundaries (pbrt's shaped volumes — e.g. smoke in a box with
``Material ""``): when the scene contains null-material interface surfaces,
each bounce marches up to ``passthrough_steps`` boundary crossings (medium
sampling per segment, medium switch at each crossing, no depth consumed),
and shadow rays accumulate per-segment transmittance through up to
``shadow_segments`` boundaries (pbrt-v3 VisibilityTester::Tr,
src/core/light.cpp) instead of treating any hit as opaque.  Lanes that
exhaust the pass-through budget are conservatively terminated/occluded.

Grid media use real delta tracking (distance sampling) and ratio tracking
(shadow transmittance) — see pbrt_tpu/media/__init__.py; the tracking
uniforms come from a stateless (pixel, sample, slot) stream so renders stay
deterministic across shardings.

Dimension layout adds 2 dims per bounce after the surface dims:
  base+7: medium distance u     base+8,9(next-bounce lobe slot reuse): phase u2
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pbrt_tpu.core.sampling import power_heuristic
from pbrt_tpu.integrators.path import INF_T, SHADOW_EPS, PathIntegrator, _to_local, _to_world
from pbrt_tpu.materials import eval_material_params
from pbrt_tpu.materials import bsdf as B
from pbrt_tpu.media import hg_phase, hg_sample, make_track_rng
from pbrt_tpu.scene.builder import compute_interaction
from pbrt_tpu.core.geometry import shading_frame, coordinate_system, vface_forward

N_DIMS_PER_BOUNCE = 10


class VolPathIntegrator(PathIntegrator):
    def __init__(self, compiled, max_depth=5, rr_threshold=1.0,
                 passthrough_steps=3, shadow_segments=4):
        super().__init__(compiled, max_depth, rr_threshold)
        self.media = compiled.media
        # static: does the scene contain null-material surfaces that rays
        # must pass through (shaped volumes)?  If not, the march collapses
        # to a single segment == the plain volumetric bounce.
        self._mat_types = np.asarray(
            [e.type_id for e in compiled.materials], dtype=np.int32
        )
        has_null = bool((self._mat_types == B.NONE).any())
        # null-material boundaries need the segmented march even in vacuum
        # (a null shape must not occlude shadow rays; pbrt-v3 Tr())
        self._has_passthrough = has_null
        self.passthrough_steps = int(passthrough_steps) if self._has_passthrough else 1
        self.shadow_segments = int(shadow_segments) if self._has_passthrough else 1

    def _opaque_mask(self, hit_mask, mat_id):
        """Hits whose surface has a real BSDF (blocks rays / ends the march)."""
        if len(self._mat_types) == 0:
            return hit_mask
        types = jnp.asarray(self._mat_types)
        t = types[jnp.clip(mat_id, 0, len(self._mat_types) - 1)]
        return hit_mask & (mat_id >= 0) & (t != B.NONE)

    def _shadow_tr(self, med, shadow_o, wi_w, l_dist, pixel_xy, sample_index,
                   bounce, time=None):
        """March a shadow ray through null-material boundaries: per-segment
        medium transmittance, medium switch at each interface, opaque hits
        occlude (pbrt-v3 VisibilityTester::Tr).  Returns (tr [N,3], occluded
        [N])."""
        c = self.c
        n = wi_w.shape[0]
        dt = wi_w.dtype
        tr = jnp.ones((n, 3), dtype=dt)
        occ = jnp.zeros((n,), dtype=bool)
        cur_o = shadow_o
        cur_med = med
        remaining = jnp.maximum(
            jnp.minimum(l_dist, 1e6) - 2 * SHADOW_EPS, 0.0
        )
        segs = self.shadow_segments
        if segs == 1:
            # no null-material boundaries in the scene: cheap any-hit
            # occlusion + one full-length transmittance (the pre-march
            # fast path; the closest-hit march below is only needed when
            # shadow rays can legally cross shaped-volume interfaces)
            occ = self._occluded(cur_o, wi_w, remaining, time)
            if self.media:
                rng_seg = make_track_rng(pixel_xy, sample_index, 1024 + bounce)
                tr = self._medium_transmittance(
                    cur_med, cur_o, wi_w, remaining, rng_seg
                )
            return tr, occ
        for seg in range(segs):
            rng_seg = make_track_rng(
                pixel_xy, sample_index, 1024 + bounce * segs + seg
            )
            h = self._intersect(cur_o, wi_w, remaining, time)
            seg_len = jnp.where(h["hit"], h["t"], remaining)
            if self.media:
                tr = tr * self._medium_transmittance(
                    cur_med, cur_o, wi_w, seg_len, rng_seg
                )
            if seg == segs - 1:
                occ = occ | h["hit"]
                break
            si = compute_interaction(c.tables, h, cur_o, wi_w, None, time)
            opaque = self._opaque_mask(h["hit"], si["mat"])
            occ = occ | opaque
            passing = h["hit"] & ~opaque
            entering = jnp.sum(wi_w * si["ng_raw"], axis=-1) < 0.0
            new_med = jnp.where(entering, si["med_in"], si["med_out"])
            cur_med = jnp.where(passing, new_med, cur_med)
            adv = seg_len + SHADOW_EPS
            cur_o = jnp.where(
                passing[..., None], cur_o + wi_w * adv[..., None], cur_o
            )
            # done lanes (no hit, or occluded): freeze further segments
            remaining = jnp.where(
                passing, jnp.maximum(remaining - adv, 0.0), 0.0
            )
        return tr, occ

    # medium helpers: static unrolled select over media list ---------------

    def _medium_transmittance(self, med_id, o, d, dist, rng):
        tr = jnp.ones(dist.shape + (3,), dtype=dist.dtype)
        for i, m in enumerate(self.media):
            tri = m.tr(o, d, dist, rng)
            tr = jnp.where((med_id == i)[..., None], tri, tr)
        return tr

    def _medium_sample(self, med_id, o, d, u, t_hit, rng):
        t = t_hit
        scattered = jnp.zeros(t_hit.shape, dtype=bool)
        beta = jnp.ones(t_hit.shape + (3,), dtype=t_hit.dtype)
        g = jnp.zeros(t_hit.shape, dtype=t_hit.dtype)
        for i, m in enumerate(self.media):
            ti, si, bi = m.sample(o, d, u, t_hit, rng)
            mask = med_id == i
            t = jnp.where(mask, ti, t)
            scattered = jnp.where(mask, si, scattered)
            beta = jnp.where(mask[..., None], bi, beta)
            g = jnp.where(mask, m.g, g)
        return t, scattered, beta, g

    def li(self, sampler, pixel_xy, sample_index, o, d, theta=None):
        c = self.c
        n = o.shape[0]
        dt = o.dtype
        L = jnp.zeros((n, 3), dtype=dt)
        beta = jnp.ones((n, 3), dtype=dt)
        alive = jnp.ones((n,), dtype=bool)
        specular_bounce = jnp.ones((n,), dtype=bool)
        prev_bsdf_pdf = jnp.ones((n,), dtype=dt)
        prev_p = o
        med = jnp.full((n,), c.camera_medium, dtype=jnp.int32)
        # per-lane shutter time (motion blur): same dimension-4 sample the
        # camera consumed, pure in (pixel, sample) — animated scenes blend
        # keyframed geometry at this time in every intersect below
        time = (
            sampler.get(pixel_xy, sample_index, 4) if self._animated else None
        )

        for bounce in range(self.max_depth):
            base = 5 + N_DIMS_PER_BOUNCE * bounce

            # ---- segment march: intersect + medium sampling, passing ----
            # through null-material boundaries (medium switch, no depth
            # consumed) up to ``passthrough_steps`` times.  For scenes
            # without null materials this is a single segment.
            marching = alive
            o_seg = o
            med_seg = med
            scattered = jnp.zeros((n,), dtype=bool)
            p_med = o
            hit = None
            si = None
            med_fin = med
            o_fin = o
            for step in range(self.passthrough_steps):
                # camera wavefront (bounce 0, first segment) is pixel-major
                # coherent: skip the Morton sort like the surface path does
                h = self._intersect(
                    o_seg, d, jnp.full((n,), INF_T, dtype=dt), time,
                    sort=not (bounce == 0 and step == 0),
                )
                t_hit = jnp.where(h["hit"], h["t"], INF_T)
                if self.media:
                    rng_track = make_track_rng(
                        pixel_xy, sample_index,
                        2048 + bounce * self.passthrough_steps + step,
                    )
                    if step == 0:
                        u_med = sampler.get(pixel_xy, sample_index, base + 7)
                    else:
                        u_med = rng_track(jnp.uint32(100003))
                    t_med_s, scat_s, med_beta, _g = self._medium_sample(
                        med_seg, o_seg, d, u_med, t_hit, rng_track
                    )
                    in_medium = med_seg >= 0
                    scat_s = scat_s & in_medium & marching
                    beta = jnp.where(
                        (marching & in_medium)[..., None], beta * med_beta, beta
                    )
                else:
                    scat_s = jnp.zeros((n,), dtype=bool)
                    t_med_s = t_hit
                si_s = compute_interaction(c.tables, h, o_seg, d, None, time)
                opaque = self._opaque_mask(h["hit"], si_s["mat"])
                # a lane settles when it scatters, hits a real surface, or
                # escapes; pass-through budget exhaustion settles on the
                # null hit (conservatively killed by the NONE material).
                last = step == self.passthrough_steps - 1
                settle = marching & (scat_s | opaque | ~h["hit"] | last)
                if hit is None:
                    hit, si, o_fin, med_fin = h, si_s, o_seg, med_seg
                else:
                    sel = lambda a, b: jnp.where(
                        settle.reshape(settle.shape + (1,) * (a.ndim - 1)), a, b
                    )
                    hit = {k: sel(h[k], hit[k]) for k in hit}
                    si = {k: sel(si_s[k], si[k]) for k in si}
                    o_fin = sel(o_seg, o_fin)
                    med_fin = sel(med_seg, med_fin)
                scattered = scattered | scat_s
                p_med = jnp.where(
                    scat_s[..., None], o_seg + d * t_med_s[..., None], p_med
                )
                if last:
                    break
                passing = marching & h["hit"] & ~opaque & ~scat_s
                if c.area_lights:
                    # area lights on null-material surfaces (pbrt adds
                    # isect.Le(-ray.d) before the null-BSDF skip): passing
                    # lanes never settle on this hit, so account its
                    # emission here with the same MIS weight the settled
                    # path would use
                    le_pass = self._emitted(si_s, -d, theta)
                    al_pdf_pass = self._area_light_pdf(prev_p, si_s, d)
                    w_le_pass = jnp.where(
                        specular_bounce,
                        1.0,
                        power_heuristic(1, prev_bsdf_pdf, 1, al_pdf_pass),
                    )
                    L = L + jnp.where(
                        (passing & (si_s["light"] >= 0))[..., None],
                        beta * le_pass * w_le_pass[..., None],
                        0.0,
                    )
                entering = jnp.sum(d * si_s["ng_raw"], axis=-1) < 0.0
                new_med = jnp.where(entering, si_s["med_in"], si_s["med_out"])
                med_seg = jnp.where(passing, new_med, med_seg)
                o_seg = jnp.where(
                    passing[..., None],
                    o_seg + d * (t_hit + SHADOW_EPS)[..., None],
                    o_seg,
                )
                marching = passing
            med = med_fin
            o = o_fin

            # ---- escaped rays ------------------------------------------
            esc = alive & ~hit["hit"] & ~scattered
            env_le = self._env_radiance(d, theta)
            light_pdf = self._env_pdf(prev_p, d)
            w_env = jnp.where(
                specular_bounce, 1.0, power_heuristic(1, prev_bsdf_pdf, 1, light_pdf)
            )
            L = L + jnp.where(esc[..., None], beta * env_le * w_env[..., None], 0.0)

            wo = si["wo"]

            # ---- emission at surface hits (not medium-scattered lanes) --
            if c.area_lights:
                le_hit = self._emitted(si, wo, theta)
                al_pdf = self._area_light_pdf(prev_p, si, d)
                w_le = jnp.where(
                    specular_bounce, 1.0, power_heuristic(1, prev_bsdf_pdf, 1, al_pdf)
                )
                surf = alive & hit["hit"] & ~scattered
                L = L + jnp.where(surf[..., None], beta * le_hit * w_le[..., None], 0.0)

            alive = alive & (hit["hit"] | scattered)
            if bounce == self.max_depth - 1:
                break

            # ---- positions for this vertex (p_med set during the march) --
            p_vertex = jnp.where(scattered[..., None], p_med, si["p"])

            # ---- NEE (both surface and medium vertices) ------------------
            ns, ss, ts = shading_frame(si, wo)
            wo_l = _to_local(ns, ss, ts, wo)
            params = eval_material_params(c.materials, si["mat"], si, theta)
            params["outside"] = jnp.sum(si["ns"] * wo, axis=-1) > 0.0
            surf_ok = alive & ~scattered & (si["mat"] >= 0) & (params["type"] != B.NONE)

            if c.lights:
                u_sel = sampler.get(pixel_xy, sample_index, base + 0)
                u_l = sampler.get2(pixel_xy, sample_index, base + 1)
                wi_w, li, l_pdf, l_dist, l_delta = self._sample_one_light(
                    p_vertex, u_sel, u_l, theta
                )
                wi_l = _to_local(ns, ss, ts, wi_w)
                # surface throughput
                f_surf = B.bsdf_eval(params, wo_l, wi_l) * jnp.abs(wi_l[..., 2])[..., None]
                b_pdf_surf = B.bsdf_pdf(params, wo_l, wi_l)
                # medium throughput: phase value (importance = value for MIS)
                cos_wi = jnp.sum(d * wi_w, axis=-1)
                ph = hg_phase(cos_wi, jnp.where(scattered, 0.0, 0.0) + self._g_of(med))
                f_med = jnp.broadcast_to(ph[..., None], (n, 3))
                f = jnp.where(scattered[..., None], f_med, f_surf)
                b_pdf = jnp.where(scattered, ph, b_pdf_surf)
                can = alive & (l_pdf > 0.0) & (jnp.max(f, axis=-1) > 0.0) & (
                    surf_ok | scattered
                )
                shadow_o = jnp.where(
                    scattered[..., None],
                    p_med,
                    si["p"]
                    + si["ng"] * SHADOW_EPS
                    * jnp.sign(jnp.sum(wi_w * si["ng"], axis=-1, keepdims=True)),
                )
                tr, occ = self._shadow_tr(
                    med, shadow_o, wi_w, l_dist, pixel_xy, sample_index,
                    bounce, time,
                )
                vis = can & ~occ
                w_l = jnp.where(l_delta, 1.0, power_heuristic(1, l_pdf, 1, b_pdf))
                contrib = beta * f * li * tr * (w_l / jnp.maximum(l_pdf, 1e-12))[..., None]
                L = L + jnp.where(vis[..., None], contrib, 0.0)

            # ---- continuation sampling ----------------------------------
            u_lobe = sampler.get(pixel_xy, sample_index, base + 3)
            u_b = sampler.get2(pixel_xy, sample_index, base + 4)
            # surface continuation
            wi_ls, f_s, pdf_s, spec = B.bsdf_sample(params, wo_l, u_lobe, u_b)
            wi_surf = _to_world(ns, ss, ts, wi_ls)
            w_surf_ok = surf_ok & (pdf_s > 0.0) & (jnp.max(f_s, axis=-1) > 0.0)
            beta_surf = f_s * (jnp.abs(wi_ls[..., 2]) / jnp.maximum(pdf_s, 1e-12))[..., None]
            # medium continuation (HG sample; value/pdf cancel)
            wi_med, _ = hg_sample(-d, u_b, self._g_of(med))
            wi_w = jnp.where(scattered[..., None], wi_med, wi_surf)
            ok = jnp.where(scattered, alive, w_surf_ok)
            beta = jnp.where(
                (ok & ~scattered)[..., None], beta * beta_surf, beta
            )
            alive = ok

            # ---- medium switching at surface crossings ------------------
            crossing = ~scattered & alive
            entering = jnp.sum(wi_w * si["ng_raw"], axis=-1) < 0.0
            new_med = jnp.where(entering, si.get("med_in", med), si.get("med_out", med))
            if "med_in" in si:
                med = jnp.where(crossing, new_med, med)

            prev_p = p_vertex
            prev_bsdf_pdf = jnp.where(scattered, 1.0, pdf_s)
            specular_bounce = jnp.where(scattered, False, spec)
            o = jnp.where(
                scattered[..., None],
                p_med,
                si["p"]
                + si["ng"] * SHADOW_EPS
                * jnp.sign(jnp.sum(wi_w * si["ng"], axis=-1, keepdims=True)),
            )
            d = wi_w

            if bounce > 3:
                max_beta = jnp.max(beta, axis=-1)
                q = jnp.maximum(0.05, 1.0 - max_beta)
                u_rr = sampler.get(pixel_xy, sample_index, base + 6)
                survive = u_rr >= q
                beta = jnp.where(
                    (alive & survive)[..., None],
                    beta / jnp.maximum(1.0 - q, 1e-6)[..., None],
                    beta,
                )
                alive = alive & survive

        return L

    def _g_of(self, med_id):
        g = jnp.zeros(med_id.shape, dtype=jnp.float32)
        for i, m in enumerate(self.media):
            g = jnp.where(med_id == i, m.g, g)
        return g
