"""Integrators: jitted wavefront light-transport loops."""

from __future__ import annotations

import logging

log = logging.getLogger("pbrt_tpu")


def make_integrator(compiled):
    """Integrator factory per pbrt-v3 MakeIntegrator names."""
    from pbrt_tpu.integrators.path import PathIntegrator
    from pbrt_tpu.integrators.direct import DirectLightingIntegrator, WhittedIntegrator

    name = compiled.integrator_name
    params = compiled.integrator_params
    max_depth = params.find_one_int("maxdepth", 5)
    if name == "path":
        rr_threshold = params.find_one_float("rrthreshold", 1.0)
        return PathIntegrator(compiled, max_depth, rr_threshold)
    if name == "directlighting":
        return DirectLightingIntegrator(compiled, max_depth)
    if name == "whitted":
        return WhittedIntegrator(compiled, max_depth)
    if name == "volpath":
        from pbrt_tpu.integrators.volpath import VolPathIntegrator

        rr_threshold = params.find_one_float("rrthreshold", 1.0)
        return VolPathIntegrator(compiled, max_depth, rr_threshold)
    if name == "ao":
        from pbrt_tpu.integrators.ao import AOIntegrator

        return AOIntegrator(
            compiled,
            cos_sample=params.find_one_bool("cossample", True),
            n_samples=params.find_one_int("nsamples", 1),
        )
    if name in ("bdpt", "mlt", "sppm"):
        log.warning(
            "Integrator '%s' not yet implemented on TPU; using path (gap).", name
        )
        if compiled.media:
            from pbrt_tpu.integrators.volpath import VolPathIntegrator

            return VolPathIntegrator(compiled, max_depth, 1.0)
        return PathIntegrator(compiled, max_depth, 1.0)
    log.warning("Integrator '%s' unknown; using path.", name)
    return PathIntegrator(compiled, max_depth, 1.0)
