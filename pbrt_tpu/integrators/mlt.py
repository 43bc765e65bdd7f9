"""Metropolis light transport in primary sample space (PSSMLT).

pbrt-v3's MLT (§16.4) runs Markov chains over Kelemen-style primary sample
vectors.  This maps remarkably well onto the wavefront design: every lane
is an independent chain, a "sampler" that reads from an explicit [N, D]
table feeds the unmodified path integrator, and mutations/accepts are
dense vector ops.  Contributions are splatted through the film's splat
channel (film.rs add_splat — completed here) and normalized by the
bootstrap estimate b of the average luminance.

Like pbrt's MLT (integrators/mlt.cpp MLTSampler + bdpt strategies), the
target function is built on the FULL BDPT strategy set — camera/light
subpaths with disjoint primary-sample dimension streams, all (s,t)
connections with ratio-walk MIS, and the light-tracing (t=1) film splats,
whose raster positions ride along with each proposal exactly like pbrt's
pRaster.  Divergence (documented): pbrt decomposes the target by path
depth and runs chains per (depth, strategy) picked at bootstrap; here
every lane-chain targets the combined all-depth BDPT estimator (Kelemen's
original formulation) — the wavefront evaluates every strategy per sample
anyway, so depth decomposition would only discard work.  The Markov
machinery (two-scale mutations, large steps, f-proportional bootstrap
seeding, expected-value splatting, b-normalization) follows
pbrt §16.4.3-16.4.5.  ``strategy="path"`` keeps a unidirectional
target: the surface path loop, or — on media scenes — the FULL
volumetric estimator (volpath), so medium attenuation/scattering is part
of f(u) (r4 fix; tests/test_mlt.py pins MLT == volpath on fog).
"""

from __future__ import annotations

import logging

import numpy as np

import jax
import jax.numpy as jnp

from pbrt_tpu import float_t
from pbrt_tpu.core.rng import hash_combine, pcg3d, u32_to_float
from pbrt_tpu.integrators.path import PathIntegrator

log = logging.getLogger("pbrt_tpu")


class TableSampler:
    """Sampler facade reading dimension d from an explicit [N, D] table."""

    samples_per_pixel = 1

    def __init__(self, table):
        self.table = table

    def get(self, pixel_xy, sample_index, dim: int):
        d = self.table.shape[1]
        if dim < d:
            return self.table[:, dim]
        # overflow dims: decorrelated hashes of (lane, dim)
        lane = jnp.arange(self.table.shape[0], dtype=jnp.uint32)
        a, _, _ = pcg3d(lane, jnp.uint32(dim), jnp.uint32(0x51))
        return u32_to_float(a)

    def get2(self, pixel_xy, sample_index, dim: int):
        return jnp.stack(
            [self.get(pixel_xy, sample_index, dim),
             self.get(pixel_xy, sample_index, dim + 1)],
            axis=-1,
        )


class MLTIntegrator(PathIntegrator):
    custom_render = True

    def __init__(self, compiled, max_depth=5, n_bootstrap=4096,
                 mutations_per_pixel=32, large_step_prob=0.3,
                 sigma=0.01, n_chains_cap=1 << 16, strategy="bdpt"):
        super().__init__(compiled, max_depth)
        self.n_bootstrap = int(n_bootstrap)
        self.mutations_per_pixel = int(mutations_per_pixel)
        self.p_large = float(large_step_prob)
        self.sigma = float(sigma)
        self.n_chains_cap = int(n_chains_cap)
        self.strategy = strategy
        self._uni = None  # non-None = explicit unidirectional target
        if strategy == "bdpt":
            from pbrt_tpu.integrators.bdpt import BDPTIntegrator

            self._bdpt = BDPTIntegrator(compiled, max_depth)
            # camera (5 + 7*t_max) and light (7*s_max) streams are already
            # disjoint; give the light-origin dims their own range too
            # (the TableSampler cannot decorrelate via pixel keys)
            base = 5 + 7 * (self._bdpt.t_max + self._bdpt.s_max)
            self._bdpt.light_origin_dim_base = base
            self.n_dims = base + 5
        elif getattr(compiled, "media", None):
            # media scenes: the unidirectional target must be the FULL
            # volumetric estimator (volpath), not the surface path loop —
            # medium attenuation/scattering is part of f(u).  Tracking
            # uniforms hash (pixel, sample, slot), and pixel = floor of the
            # film position u drives, so f stays a fixed function of the
            # primary sample vector as Metropolis requires.
            from pbrt_tpu.integrators.volpath import (
                N_DIMS_PER_BOUNCE,
                VolPathIntegrator,
            )

            self._bdpt = None
            self._uni = VolPathIntegrator(compiled, max_depth)
            self.n_dims = 5 + N_DIMS_PER_BOUNCE * self.max_depth
        else:
            self._bdpt = None
            self.n_dims = 5 + 7 * self.max_depth

    # -- sample-vector -> radiance ------------------------------------------

    @staticmethod
    def _lum(L):
        return jnp.maximum(
            0.212671 * L[..., 0] + 0.715160 * L[..., 1] + 0.072169 * L[..., 2],
            0.0,
        )

    def _evaluate(self, u, film):
        """u: [N, D] primary samples -> (p_film, L, f, splats).

        ``splats`` is a list of (praster [N,2], L [N,3]) from light-tracing
        strategies (BDPT t=1); their luminance is part of the target f and
        they are recorded at their own raster positions (pbrt's pRaster).
        """
        n = u.shape[0]
        b = film.cropped_pixel_bounds
        fx = b.p_min[0] + u[:, 0] * b.width
        fy = b.p_min[1] + u[:, 1] * b.height
        p_film = jnp.stack([fx, fy], axis=-1)
        pixel_xy = jnp.floor(p_film).astype(jnp.int32)
        sidx = jnp.zeros((n,), jnp.uint32)
        sampler = TableSampler(u)
        o, d, w = self.c.camera.generate_rays(
            p_film, sampler.get2(pixel_xy, sidx, 2)
        )
        if self._bdpt is not None:
            L, raw_splats = self._bdpt.li_splat(sampler, pixel_xy, sidx, o, d)
        elif self._uni is not None:  # volumetric unidirectional target
            L, raw_splats = self._uni.li(sampler, pixel_xy, sidx, o, d), []
        else:
            L, raw_splats = self.li(sampler, pixel_xy, sidx, o, d), []
        L = jnp.where(jnp.isfinite(L), L, 0.0) * w[..., None]
        f = self._lum(L)
        splats = []
        for ps, Ls, ms in raw_splats:
            Ls = jnp.where(
                (ms[..., None]) & jnp.isfinite(Ls), Ls, 0.0
            )
            splats.append((ps, Ls))
            f = f + self._lum(Ls)
        return p_film, L, f, splats

    @staticmethod
    def _uniform(n, d, key):
        lane = jnp.arange(n, dtype=jnp.uint32)[:, None]
        dim = jnp.arange(d, dtype=jnp.uint32)[None, :]
        a, _, _ = pcg3d(lane + jnp.uint32(key) * jnp.uint32(0x9E37),
                        dim, jnp.uint32(key))
        return u32_to_float(a)

    def _mutate(self, u, key):
        """Kelemen two-scale exponential perturbation (pbrt §16.4.3)."""
        n, d = u.shape
        lane = jnp.arange(n, dtype=jnp.uint32)[:, None]
        dim = jnp.arange(d, dtype=jnp.uint32)[None, :]
        a, b2, _ = pcg3d(lane ^ jnp.uint32(key), dim + jnp.uint32(17),
                         jnp.uint32(key) + jnp.uint32(3))
        u1 = u32_to_float(a)
        u2 = u32_to_float(b2)
        s1, s2 = 1.0 / 1024.0, 1.0 / 64.0
        dv = s2 * jnp.exp(-jnp.log(s2 / s1) * u1)
        new = jnp.where(u2 < 0.5, u + dv, u - dv)
        new = new - jnp.floor(new)  # wrap to [0,1)
        return new

    # -- main ---------------------------------------------------------------

    def render(self, renderer, spp=None, progress=True):
        import time

        film = renderer.film
        b = film.cropped_pixel_bounds
        n_pix = b.area()
        n_chains = min(self.n_chains_cap, max(1024, n_pix))
        muts = self.mutations_per_pixel if spp is None else max(4, int(spp))
        n_iters = max(8, n_pix * muts // n_chains)
        d = self.n_dims

        # bootstrap: estimate b = E[f] over uniform primary samples and
        # collect candidates for f-proportional chain initialization
        boot_rounds = max(2, self.n_bootstrap // n_chains)
        eval_j = jax.jit(lambda u: self._evaluate(u, film))
        boot_us = []
        boot_fs = []
        for r in range(boot_rounds):
            ub = self._uniform(n_chains, d, 1000 + r)
            fb = eval_j(ub)[2]
            boot_us.append(ub)
            boot_fs.append(fb)
        boot_u = jnp.concatenate(boot_us, axis=0)
        boot_f = jnp.concatenate(boot_fs, axis=0)
        b_norm = float(jnp.mean(boot_f))
        if b_norm <= 0:
            log.warning("MLT bootstrap found no light-carrying paths")
            return film.initial_state()

        # start chains in the stationary distribution: categorical draw
        # proportional to bootstrap f (pbrt §16.4.4 chain seeding)
        cdf = jnp.cumsum(boot_f)
        cdf = cdf / cdf[-1]
        lane = jnp.arange(n_chains, dtype=jnp.uint32)
        pick_bits, _, _ = pcg3d(lane, jnp.uint32(0xC0FFEE), jnp.uint32(7))
        picks = jnp.searchsorted(cdf, u32_to_float(pick_bits))
        picks = jnp.clip(picks, 0, boot_f.shape[0] - 1)
        u = boot_u[picks]
        f = boot_f[picks]

        # chain state carries the CURRENT evaluation (p, L, f, splats) so
        # each iteration evaluates only the proposal — pbrt keeps the
        # current path's contribution the same way (§16.4.5)
        p_cur, L_cur, f, sp_cur = eval_j(u)

        @jax.jit
        def step(u, f, p_cur, L_cur, sp_cur, state_splat, acc_sum, key):
            large_u = self._uniform(n_chains, d, key * 2 + 11)
            lane = jnp.arange(n_chains, dtype=jnp.uint32)
            sel, acc_bits, _ = pcg3d(lane, jnp.uint32(key), jnp.uint32(0xAB))
            is_large = u32_to_float(sel) < self.p_large
            u_prop = jnp.where(is_large[:, None], large_u, self._mutate(u, key))
            p_new, L_new, f_new, sp_new = self._evaluate(u_prop, film)
            a = jnp.minimum(1.0, f_new / jnp.maximum(f, 1e-12))
            a = jnp.where(f <= 0, 1.0, a)
            # expected-value splats (pbrt 16.4.5): old with (1-a), new with
            # a; light-tracing contributions land at their own pRaster
            w_new = a / jnp.maximum(f_new, 1e-12)
            w_old = (1.0 - a) / jnp.maximum(f, 1e-12)
            for pw, Lw, ww, fw in (
                (p_new, L_new, w_new, f_new),
                (p_cur, L_cur, w_old, f),
            ):
                state_splat = film.add_splats(
                    state_splat, pw, Lw * ww[..., None], mask=fw > 0
                )
            for (ps, Ls), ww, fw in (
                [(sp, w_new, f_new) for sp in sp_new]
                + [(sp, w_old, f) for sp in sp_cur]
            ):
                state_splat = film.add_splats(
                    state_splat, ps, Ls * ww[..., None], mask=fw > 0
                )
            accept = u32_to_float(acc_bits) < a
            acc3 = accept[:, None]
            u = jnp.where(acc3, u_prop, u)
            f = jnp.where(accept, f_new, f)
            p_cur = jnp.where(acc3, p_new, p_cur)
            L_cur = jnp.where(acc3, L_new, L_cur)
            sp_cur = [
                (jnp.where(acc3, pn, po), jnp.where(acc3, Ln, Lo))
                for (pn, Ln), (po, Lo) in zip(sp_new, sp_cur)
            ]
            acc_sum = acc_sum + jnp.sum(accept)
            return u, f, p_cur, L_cur, sp_cur, state_splat, acc_sum

        state = film.initial_state()
        acc_sum = jnp.zeros((), jnp.int32)
        t0 = time.time()
        for it in range(n_iters):
            u, f, p_cur, L_cur, sp_cur, state, acc_sum = step(
                u, f, p_cur, L_cur, sp_cur, state, acc_sum, it + 1
            )
            if progress and (it == 0 or it == n_iters - 1):
                jax.block_until_ready(f)
                log.info("MLT iteration %d/%d (%.1fs)", it + 1, n_iters,
                         time.time() - t0)
        jax.block_until_ready(state["splat_xyz"])
        # diagnostics for tests / logs (pbrt's MLT statistics)
        self.last_b = b_norm
        self.last_acceptance = float(acc_sum) / float(n_chains * n_iters)
        log.info("MLT acceptance rate %.3f, b = %.5f",
                 self.last_acceptance, b_norm)

        # normalization: each pixel's estimate = splat * b / samplesPerPixel
        # where total splats = n_chains * n_iters over n_pix pixels
        splat_scale = b_norm * n_pix / (n_chains * n_iters)
        # bake the scale into the state so write_image(splat_scale=1) works
        state = {
            "xyz": state["xyz"],
            "weight": state["weight"],
            "splat_xyz": state["splat_xyz"] * splat_scale,
        }
        return state
