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
        if getattr(compiled, "media", None):
            # the scene carries participating media (including synthesized
            # subsurface interiors); pbrt's path integrator handles BSSRDFs
            # in-line, ours routes all volumetric transport through volpath
            from pbrt_tpu.integrators.volpath import VolPathIntegrator

            return VolPathIntegrator(compiled, max_depth, rr_threshold)
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
    if name == "sppm":
        from pbrt_tpu.integrators.sppm import SPPMIntegrator

        return SPPMIntegrator(
            compiled,
            max_depth=max_depth,
            n_iterations=params.find_one_int("numiterations", 16),
            photons_per_iteration=params.find_one_int("photonsperiteration", -1),
            initial_radius=params.find_one_float("radius", -1.0),
        )
    if name == "bdpt":
        from pbrt_tpu.integrators.bdpt import BDPTIntegrator

        return BDPTIntegrator(compiled, max_depth=max_depth)
    if name == "mlt":
        from pbrt_tpu.integrators.mlt import MLTIntegrator

        return MLTIntegrator(
            compiled,
            max_depth=max_depth,
            n_bootstrap=params.find_one_int("bootstrapsamples", 4096),
            mutations_per_pixel=params.find_one_int("mutationsperpixel", 32),
            large_step_prob=params.find_one_float("largestepprobability", 0.3),
            sigma=params.find_one_float("sigma", 0.01),
            # BDPT defers volumetric transport to volpath; media scenes keep
            # the unidirectional target
            strategy="path" if getattr(compiled, "media", None) else "bdpt",
        )
    log.warning("Integrator '%s' unknown; using path.", name)
    return PathIntegrator(compiled, max_depth, 1.0)
