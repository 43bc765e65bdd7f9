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
