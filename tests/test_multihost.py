"""Multi-host runtime helpers (single-process behavior on the CPU mesh)."""

import numpy as np

import jax

from pbrt_tpu.parallel.multihost import (
    global_mesh,
    initialize_multihost,
    process_local_slice,
)


def test_initialize_single_process_is_noop():
    assert initialize_multihost() is False
    assert jax.process_count() == 1


def test_global_mesh_spans_all_devices():
    n = len(jax.devices())
    m = global_mesh(sp=2)
    assert m.shape["dp"] * m.shape["sp"] == n
    m3 = global_mesh(sp=1, tp=2)
    assert m3.shape["dp"] * m3.shape["sp"] * m3.shape["tp"] == n
    assert tuple(m3.shape.keys()) == ("dp", "sp", "tp")


def test_process_local_slice_covers_everything():
    s = process_local_slice(4096)
    assert (s.start, s.stop) == (0, 4096)


def test_sharded_render_on_global_mesh():
    """A ShardedRenderer over the helper-built mesh matches itself across
    mesh shapes (the multi-host mesh is the same object single-host)."""
    from pbrt_tpu import Options
    from pbrt_tpu.core.api import PbrtAPI
    from pbrt_tpu.parallel.mesh import ShardedRenderer
    from pbrt_tpu.render import Renderer

    scene = """
LookAt 0 0 -3  0 0 0  0 1 0
Camera "perspective" "float fov" 45
Sampler "halton" "integer pixelsamples" 4
Integrator "path" "integer maxdepth" 2
Film "image" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
Material "matte" "rgb Kd" [0.5 0.5 0.5]
Shape "sphere" "float radius" 1
WorldEnd
"""

    def run(**mesh_kw):
        api = PbrtAPI(Options(ray_batch=1024), render_on_world_end=False)
        api.init()
        api.parse_string(scene)
        r = Renderer(api.scene, api.opt)
        sr = ShardedRenderer(r, global_mesh(**mesh_kw))
        return np.asarray(r.film.to_rgb(sr.render()))

    a = run(sp=1)
    b = run(sp=2)
    np.testing.assert_allclose(a, b, atol=2e-6)
