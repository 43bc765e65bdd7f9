"""Wavefront-compaction A/B (VERDICT r2 item 4 / r3 item 7).

Dead lanes carry t_max=0 plus a dead bit in the sort key, so terminated
lanes pack into trailing packets that exit traversal at the root test —
compaction without a gather/scatter pass.  Measured here on the scene
class it targets: a CLOSED tessellated box interior at maxdepth 8, where
Russian roulette steadily kills lanes from bounce 4 on, so late-bounce
wavefronts are heavily mixed alive/dead without the dead bit.

Run A: dead bit on (production).  Run B: PBRT_TPU_NO_DEADBIT=1 (dead
lanes scattered through the spatial sort).  Same images (the bit only
changes packet grouping).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

BOX_SCENE = """
LookAt 0 2 0  2 2 2  0 1 0
Camera "perspective" "float fov" 70
Sampler "halton" "integer pixelsamples" 4
Integrator "path" "integer maxdepth" 8
Film "image" "integer xresolution" [256] "integer yresolution" [256]
Accelerator "bvh"
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [6 6 6]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [ -0.8 3.99 -0.8   0.8 3.99 -0.8   0.8 3.99 0.8   -0.8 3.99 0.8 ]
AttributeEnd
Material "matte" "rgb Kd" [0.75 0.72 0.68]
# closed box interior, faces tessellated into a real mesh (heightfield
# subdivision) so the BVH/Pallas path engages
{faces}
WorldEnd
"""


def subdivided_face(corners, n=48):
    """Tessellate a quad face into 2*(n-1)^2 triangles as a trianglemesh."""
    c0, c1, c2, c3 = [np.asarray(c, np.float64) for c in corners]
    pts = []
    for i in range(n):
        for j in range(n):
            u, v = i / (n - 1), j / (n - 1)
            p = (1 - u) * ((1 - v) * c0 + v * c1) + u * ((1 - v) * c3 + v * c2)
            pts.append(p)
    idx = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            b = a + 1
            c = a + n + 1
            d = a + n
            idx += [a, b, c, a, c, d]
    pstr = " ".join(f"{x:.4f}" for p in pts for x in p)
    istr = " ".join(map(str, idx))
    return (f'Shape "trianglemesh" "integer indices" [{istr}]\n'
            f'  "point P" [{pstr}]\n')


def build_scene():
    s = 4.0
    faces = ""
    quads = [
        [(-s, 0, -s), (s, 0, -s), (s, 0, s), (-s, 0, s)],        # floor
        [(-s, s, -s), (s, s, -s), (s, s, s), (-s, s, s)],        # ceiling
        [(-s, 0, -s), (s, 0, -s), (s, s, -s), (-s, s, -s)],      # -z
        [(-s, 0, s), (s, 0, s), (s, s, s), (-s, s, s)],          # +z
        [(-s, 0, -s), (-s, 0, s), (-s, s, s), (-s, s, -s)],      # -x
        [(s, 0, -s), (s, 0, s), (s, s, s), (s, s, -s)],          # +x
    ]
    for q in quads:
        faces += subdivided_face(q)
    return BOX_SCENE.format(faces=faces)


def run(tag):
    from pbrt_tpu import Options
    from pbrt_tpu.core.api import PbrtAPI
    from pbrt_tpu.render import Renderer

    api = PbrtAPI(Options(ray_batch=1 << 18), render_on_world_end=False)
    api.init()
    api.parse_string(build_scene())
    r = Renderer(api.scene, api.opt)
    state = r.render(progress=False)
    dts = []
    for _ in range(3):
        t0 = time.time()
        state = r.render(state=r.film.initial_state(), progress=False)
        jax.block_until_ready(state["weight"])
        dts.append(time.time() - t0)
    img = np.asarray(r.film.to_rgb(state))
    dt = sorted(dts)[1]
    print(f"{tag}: {dt*1000:.1f} ms/frame (spread "
          f"{min(dts)*1000:.0f}-{max(dts)*1000:.0f}) "
          f"img_mean={img.mean():.4f}", flush=True)
    return img


def main():
    print("device:", jax.devices()[0], flush=True)
    img_a = run("A dead-bit-on")
    os.environ["PBRT_TPU_NO_DEADBIT"] = "1"
    img_b = run("B dead-bit-off")
    print("images equal:", bool(np.allclose(img_a, img_b, atol=1e-5)),
          flush=True)


if __name__ == "__main__":
    main()
