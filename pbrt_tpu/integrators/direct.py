"""Direct lighting and Whitted integrators (pbrt-v3 §14.3, §1.3.4).

Both are thin configurations of the path machinery (the reference names
them via its integrator defaults, /root/reference/src/core/api.rs:244,
but builds neither):

* ``DirectLightingIntegrator`` — pbrt's EstimateDirect at each first
  non-specular vertex: the NEE half samples the lights with MIS, and the
  BSDF-sampled half is realized by letting non-specular continuations run
  exactly one more segment in emission-only mode (``gather_only`` lanes in
  the path loop collect area/env Le with the matching power-heuristic
  weight, then terminate).  Specular chains recurse to ``max_depth`` like
  pbrt's SpecularReflect/SpecularTransmit.  No diffuse indirect is ever
  added at any depth.
* ``WhittedIntegrator`` — light sampling only (no MIS pair: ``nee_mis``
  off, non-specular BSDF samples suppressed), specular recursion to
  ``max_depth``.

Both diverge from pbrt-v3 in using the UniformSampleOne light strategy
(pbrt's Whitted loops over all lights); documented in PARITY.md.
"""

from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.integrators.path import PathIntegrator


class DirectLightingIntegrator(PathIntegrator):
    """NEE + BSDF-sampled direct light at every non-specular vertex of a
    specular chain; no indirect transport (pbrt-v3 directlighting.cpp
    semantics via the ``direct_only`` path-loop mode)."""

    direct_only = True

    def __init__(self, compiled, max_depth=5):
        # max_depth bounds the specular chain; +1 head-room so the final
        # non-specular vertex still gets its emission-only MIS segment
        # (pbrt's EstimateDirect evaluates BOTH MIS halves at every
        # vertex regardless of depth — without the +1 the last vertex
        # contributed only the NEE half, slightly dark at the cap)
        super().__init__(
            compiled, max_depth=max(2, max_depth + 1), rr_threshold=1.0
        )


class WhittedIntegrator(PathIntegrator):
    """Whitted-style: direct lighting (light sampling only, weight 1) +
    perfect specular recursion.  Non-specular continuations terminate via
    the ``_bsdf_sample`` hook (pdf=0), so matte/plastic/metal lanes stop
    after their NEE; mirrors/glass recurse."""

    nee_mis = False

    def __init__(self, compiled, max_depth=5):
        super().__init__(compiled, max_depth=max(2, max_depth), rr_threshold=1.0)

    def _bsdf_sample(self, params, wo_l, u_lobe, u_b):
        wi, f, pdf, spec = super()._bsdf_sample(params, wo_l, u_lobe, u_b)
        return wi, f, jnp.where(spec, pdf, 0.0), spec
