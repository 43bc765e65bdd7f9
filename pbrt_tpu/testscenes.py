"""Built-in benchmark/test scenes (BASELINE.md configs).

Scene 2 of BASELINE.json: analytic Cornell box — diffuse quads + two
spheres (one mirror), area light in the ceiling, path integrator.
"""

from __future__ import annotations

from pbrt_tpu import Options
from pbrt_tpu.core.api import PbrtAPI

CORNELL_BOX = """
LookAt 278 273 -800  278 273 0  0 1 0
Camera "perspective" "float fov" 39.3
Sampler "halton" "integer pixelsamples" {spp}
Integrator "path" "integer maxdepth" {maxdepth}
Film "image" "integer xresolution" [{xres}] "integer yresolution" [{yres}]
     "string filename" "{filename}"
WorldBegin
# ceiling area light
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [17 12 4]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [213 548.7 227  343 548.7 227  343 548.7 332  213 548.7 332]
AttributeEnd
# floor
Material "matte" "rgb Kd" [0.73 0.73 0.73]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [552.8 0 0  0 0 0  0 0 559.2  549.6 0 559.2]
# ceiling
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [556 548.8 0  556 548.8 559.2  0 548.8 559.2  0 548.8 0]
# back wall
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [549.6 0 559.2  0 0 559.2  0 548.8 559.2  556 548.8 559.2]
# right wall (green)
Material "matte" "rgb Kd" [0.12 0.45 0.15]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [0 0 559.2  0 0 0  0 548.8 0  0 548.8 559.2]
# left wall (red)
Material "matte" "rgb Kd" [0.65 0.05 0.05]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [552.8 0 0  549.6 0 559.2  556 548.8 559.2  556 548.8 0]
# mirror sphere
AttributeBegin
  Material "mirror" "rgb Kr" [0.95 0.95 0.95]
  Translate 185 100 170
  Shape "sphere" "float radius" 100
AttributeEnd
# matte sphere
AttributeBegin
  Material "matte" "rgb Kd" [0.8 0.7 0.6]
  Translate 370 90 350
  Shape "sphere" "float radius" 90
AttributeEnd
WorldEnd
"""


def cornell_description(xres=256, yres=256, spp=4, maxdepth=5,
                        filename="cornell.png", options=None):
    """Parse the Cornell scene -> (SceneDescription, Options)."""
    text = CORNELL_BOX.format(
        xres=xres, yres=yres, spp=spp, maxdepth=maxdepth, filename=filename
    )
    api = PbrtAPI(options or Options(), render_on_world_end=False)
    api.init()
    api.parse_string(text)
    return api.scene, api.opt


def cornell_renderer(xres=256, yres=256, spp=4, maxdepth=5, ray_batch=1 << 16,
                     seed=0):
    from pbrt_tpu.render import Renderer

    desc, opts = cornell_description(
        xres, yres, spp, maxdepth, options=Options(ray_batch=ray_batch)
    )
    return Renderer(desc, opts, seed=seed)


def _torus_mesh_params(nu=224, nv=112, major=1.0, minor=0.4, displace=0.08):
    """Procedural displaced torus: ~2*nu*nv triangles (host numpy)."""
    import numpy as np

    from pbrt_tpu.core.paramset import ParamSet

    u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    v = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    # deterministic displacement field
    r = minor * (
        1.0
        + displace * np.sin(7 * uu) * np.cos(5 * vv)
        + 0.5 * displace * np.sin(13 * vv + 2 * uu)
    )
    x = (major + r * np.cos(vv)) * np.cos(uu)
    y = (major + r * np.cos(vv)) * np.sin(uu)
    z = r * np.sin(vv)
    pts = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    uvs = np.stack([uu / (2 * np.pi), vv / (2 * np.pi)], axis=-1).reshape(-1, 2)

    # vectorized quad -> 2-triangle indices (i-major, j-minor — identical
    # ordering to the obvious double loop; vectorized for the 1M-tri
    # config-5 mesh where a Python loop would dominate build time)
    gi, gj = np.meshgrid(np.arange(nu), np.arange(nv), indexing="ij")

    def vid(i, j):
        return (i % nu) * nv + (j % nv)

    a = vid(gi, gj)
    b = vid(gi + 1, gj)
    c = vid(gi + 1, gj + 1)
    dd = vid(gi, gj + 1)
    idx = np.stack([a, b, c, a, c, dd], axis=-1).reshape(-1).tolist()
    ps = ParamSet()
    ps.add_int("indices", idx)
    ps.add_point3f("P", pts.astype(np.float32))
    ps.add_point2f("uv", uvs.astype(np.float32))
    return ps, len(idx) // 3


def mesh_scene_renderer(xres=256, yres=256, spp=4, maxdepth=5, ray_batch=1 << 16,
                        nu=224, nv=112, seed=0):
    """BASELINE config 3: ~50k-triangle mesh, BVH, textured matte,
    point + area lights, MIS on."""
    import numpy as np

    from pbrt_tpu.core.api import PbrtAPI
    from pbrt_tpu.render import Renderer

    api = PbrtAPI(Options(ray_batch=ray_batch), render_on_world_end=False)
    api.init()
    api.parse_string(
        f"""
        LookAt 2.8 2.2 2.8  0 0 0  0 0 1
        Camera "perspective" "float fov" 45
        Sampler "halton" "integer pixelsamples" {spp}
        Integrator "path" "integer maxdepth" {maxdepth}
        Film "image" "integer xresolution" [{xres}] "integer yresolution" [{yres}]
        Accelerator "bvh"
        WorldBegin
        LightSource "point" "rgb I" [30 28 25] "point from" [3 -3 4]
        AttributeBegin
          AreaLightSource "diffuse" "rgb L" [6 6 7]
          Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
            "point P" [-1 -1 3.5  1 -1 3.5  1 1 3.5  -1 1 3.5]
        AttributeEnd
        Texture "checks" "spectrum" "checkerboard"
            "float uscale" [16] "float vscale" [8]
            "rgb tex1" [.2 .3 .5] "rgb tex2" [.8 .75 .6]
        Material "matte" "texture Kd" "checks"
        """
    )
    ps, n_tris = _torus_mesh_params(nu, nv)
    api.shape("trianglemesh", ps)
    # floor
    api.parse_string(
        """
        Material "matte" "rgb Kd" [0.4 0.4 0.42]
        Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
          "point P" [-8 -8 -0.7  8 -8 -0.7  8 8 -0.7  -8 8 -0.7]
        """
    )
    api.scene.film_params.add_int("xresolution", [xres])
    api.scene.film_params.add_int("yresolution", [yres])
    return Renderer(api.scene, api.opt, seed=seed), n_tris


def torus_triangle_data(nu=1000, nv=500, **kw):
    """Raw TriangleData for the displaced torus (nu*nv*2 triangles).

    ``nu=1000, nv=500`` is the BASELINE config-5 scale: exactly 1M
    triangles, used by the geometry-sharded tests/dryrun and the bench.
    """
    from pbrt_tpu.core.transform import Transform
    from pbrt_tpu.shapes import make_shape

    ps, _ = _torus_mesh_params(nu, nv, **kw)
    return make_shape("trianglemesh", ps, Transform.identity(), False)
