"""Render the gallery images for RESULTS.md (CPU ok, TPU if available)."""

import os
import sys
import time

if os.environ.get("GALLERY_CPU", "1") != "0":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("GALLERY_CPU", "1") != "0":
    jax.config.update("jax_platforms", "cpu")

import logging

logging.basicConfig(level=logging.WARNING)

import numpy as np

from pbrt_tpu import Options
from pbrt_tpu.core.api import PbrtAPI
from pbrt_tpu.render import render_scene

OUT = "/root/repo/gallery"
os.makedirs(OUT, exist_ok=True)


def run(name, scene_text=None, scene_file=None, ray_batch=1 << 15):
    t0 = time.time()
    api = PbrtAPI(Options(ray_batch=ray_batch, image_file=f"{OUT}/{name}.png"))
    api.init()
    if scene_file:
        import pbrt_tpu.core.parser as P

        P.parse_file(scene_file, api)
    else:
        api.parse_string(scene_text)
    api.cleanup()
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)


def main():
    which = sys.argv[1:] if len(sys.argv) > 1 else ["check", "cornell", "torus", "glass", "fog", "sppm"]

    if "check" in which:
        text = open("/root/reference/scenes/check-sphere.pbrt").read()
        text = text.replace("[400]", "[200]").replace('"integer yresolution" [400]', '"integer yresolution" [200]')
        text = text.replace("128", "48")
        run("check-sphere", text)

    if "cornell" in which:
        from pbrt_tpu.testscenes import CORNELL_BOX

        run(
            "cornell",
            CORNELL_BOX.format(xres=200, yres=200, spp=64, maxdepth=5, filename="x.png"),
        )

    if "torus" in which:
        from pbrt_tpu.testscenes import mesh_scene_renderer

        t0 = time.time()
        r, n_tris = mesh_scene_renderer(xres=200, yres=200, spp=24, maxdepth=4, ray_batch=1 << 15)
        state = r.render(progress=False)
        r.film.write_image(state, filename=f"{OUT}/torus50k.png")
        print(f"torus50k ({n_tris} tris): {time.time()-t0:.1f}s", flush=True)

    if "glass" in which:
        run("glass", open("/tmp/vtest/glass.pbrt").read().replace("[96]", "[200]").replace('"glass_out.png"', '"x.png"').replace("16", "48"))

    if "fog" in which:
        run("fog", open("/tmp/vtest/fog.pbrt").read().replace("[96]", "[200]").replace("[72]", "[150]").replace('"fog_out.png"', '"x.png"').replace('"integer pixelsamples" 8', '"integer pixelsamples" 32'))

    if "sppm" in which:
        sys.path.insert(0, "/root/repo/tests")
        from test_sppm import BOX

        run(
            "sppm-box",
            BOX.replace("[24]", "[200]").replace(
                '"{integ}" {extra}',
                '"sppm" "integer numiterations" 64 "integer photonsperiteration" 65536',
            ),
        )


if __name__ == "__main__":
    main()
