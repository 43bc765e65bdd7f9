"""Texel-level texture gradients (BASELINE config 4: differentiable
texture parameters)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pbrt_tpu import Options
from pbrt_tpu.core.api import PbrtAPI
from pbrt_tpu.render import Renderer


@pytest.fixture(scope="module")
def renderer(tmp_path_factory):
    tex_dir = tmp_path_factory.mktemp("tex")
    # a 8x8 colorful texture written as PFM (no gamma)
    rng = np.random.default_rng(3)
    img = rng.uniform(0.1, 0.9, (8, 8, 3)).astype(np.float32)
    from pbrt_tpu.core.geometry import Bounds2i
    from pbrt_tpu.core.imageio import write_image

    tex_path = str(tex_dir / "tex.pfm")
    write_image(tex_path, img, Bounds2i((0, 0), (8, 8)), (8, 8))

    scene = f"""
    LookAt 0 0 5  0 0 0  0 1 0
    Camera "orthographic" "float screenwindow" [-1 1 -1 1]
    Sampler "halton" "integer pixelsamples" 4
    Integrator "path" "integer maxdepth" 2
    Film "image" "integer xresolution" [12] "integer yresolution" [12]
    WorldBegin
    LightSource "distant" "point from" [0 0 10] "rgb L" [3 3 3]
    Texture "wood" "spectrum" "imagemap" "string filename" "{tex_path}"
    Material "matte" "texture Kd" "wood"
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
        "point P" [ -1 -1 0   1 -1 0   1 1 0   -1 1 0 ]
        "float st" [0 0  1 0  1 1  0 1]
    WorldEnd
    """
    api = PbrtAPI(Options(ray_batch=12 * 12 * 4), render_on_world_end=False)
    api.init()
    api.parse_string(scene)
    return Renderer(api.scene, api.opt, seed=0)


def test_texture_gradients_flow(renderer):
    from pbrt_tpu.diff.grad import make_radiance_fn

    theta = renderer.compiled.initial_theta()
    assert len(theta["tex_images"]) == 1
    radiance = make_radiance_fn(renderer)
    pixels = jnp.asarray(
        renderer.film.cropped_pixel_bounds.offsets().astype(np.int32)
    )
    sidx = jnp.zeros((pixels.shape[0],), jnp.uint32)

    def loss(theta):
        L = radiance(theta, pixels, sidx)
        return jnp.mean(L**2)

    g = jax.jit(jax.grad(loss))(theta)
    (gtex,) = g["tex_images"].values()
    assert float(jnp.abs(gtex).sum()) > 0.0
    # gradient concentrates on the finest level (first 64 rows of pyramid)
    assert float(jnp.abs(gtex[:64]).sum()) > 0.0


def test_texture_recovery_by_descent(renderer):
    from pbrt_tpu.diff.grad import make_radiance_fn

    theta_true = renderer.compiled.initial_theta()
    radiance = make_radiance_fn(renderer)
    pixels = jnp.asarray(
        renderer.film.cropped_pixel_bounds.offsets().astype(np.int32)
    )
    sidx = jnp.zeros((pixels.shape[0],), jnp.uint32)
    target = jax.jit(lambda th: radiance(th, pixels, sidx))(theta_true)

    (tid,) = theta_true["tex_images"].keys()
    theta = jax.tree_util.tree_map(lambda x: x, theta_true)
    theta["tex_images"] = {
        tid: jnp.full_like(theta_true["tex_images"][tid], 0.5)
    }

    def loss(theta):
        L = radiance(theta, pixels, sidx)
        return jnp.mean((L - target) ** 2)

    step = jax.jit(jax.value_and_grad(loss))
    l0, _ = step(theta)
    lr = 30.0
    for _ in range(40):
        lv, g = step(theta)
        theta = dict(theta)
        theta["tex_images"] = {
            tid: jnp.clip(
                theta["tex_images"][tid] - lr * g["tex_images"][tid], 0.0, 1.0
            )
        }
    l1, _ = step(theta)
    assert float(l1) < 0.05 * float(l0)
