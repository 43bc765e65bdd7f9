"""Differentiable-rendering tests: autodiff gradients vs finite differences
(BASELINE.md config-4 capability: texture/material/light gradients)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pbrt_tpu import Options
from pbrt_tpu.core.api import PbrtAPI
from pbrt_tpu.diff.grad import make_loss_fn, make_radiance_fn
from pbrt_tpu.render import Renderer

SCENE = """
LookAt 0 0 -3  0 0 0  0 1 0
Camera "perspective" "float fov" 40
Sampler "halton" "integer pixelsamples" 4
Integrator "path" "integer maxdepth" 3
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
LightSource "infinite" "rgb L" [.5 .5 .5]
Material "matte" "rgb Kd" [0.4 0.5 0.6]
Shape "sphere" "float radius" 1
WorldEnd
"""


def build():
    api = PbrtAPI(Options(ray_batch=64), render_on_world_end=False)
    api.init()
    api.parse_string(SCENE)
    return Renderer(api.scene, api.opt, seed=0)


@pytest.fixture(scope="module")
def renderer():
    return build()


def test_grad_matches_finite_difference_kd(renderer):
    theta = renderer.compiled.initial_theta()
    pixels = renderer.film.cropped_pixel_bounds.offsets().astype(np.int32)
    pixels = jnp.asarray(pixels)
    target = np.zeros((8, 8, 3), dtype=np.float32)
    loss = make_loss_fn(renderer, target, spp=2)
    g = jax.jit(jax.grad(loss))(theta, pixels)
    # finite differences on kd red channel of material 0
    eps = 1e-2
    lf = jax.jit(loss)

    def with_kd(delta):
        t2 = dict(theta)
        t2["kd"] = theta["kd"].at[0, 0].add(delta)
        return float(lf(t2, pixels))

    fd = (with_kd(eps) - with_kd(-eps)) / (2 * eps)
    ad = float(g["kd"][0, 0])
    assert fd != 0.0
    np.testing.assert_allclose(ad, fd, rtol=0.05)


def test_grad_matches_finite_difference_env(renderer):
    theta = renderer.compiled.initial_theta()
    pixels = jnp.asarray(
        renderer.film.cropped_pixel_bounds.offsets().astype(np.int32)
    )
    target = np.zeros((8, 8, 3), dtype=np.float32)
    loss = make_loss_fn(renderer, target, spp=2)
    g = jax.jit(jax.grad(loss))(theta, pixels)
    eps = 1e-2
    lf = jax.jit(loss)

    def with_env(delta):
        t2 = dict(theta)
        t2["env_l"] = theta["env_l"].at[0, 1].add(delta)
        return float(lf(t2, pixels))

    fd = (with_env(eps) - with_env(-eps)) / (2 * eps)
    ad = float(g["env_l"][0, 1])
    assert fd != 0.0
    np.testing.assert_allclose(ad, fd, rtol=0.05)


MIX_SCENE = SCENE.replace(
    'Material "matte" "rgb Kd" [0.4 0.5 0.6]',
    '''MakeNamedMaterial "ma" "string type" "matte" "rgb Kd" [0.4 0.5 0.6]
MakeNamedMaterial "mb" "string type" "matte" "rgb Kd" [0.1 0.8 0.3]
Material "mix" "string namedmaterial1" "ma" "string namedmaterial2" "mb"
  "rgb amount" [0.3 0.3 0.3]''',
)


def test_grad_through_mix_material():
    """Mix scenes get split {"a","b"} theta rows; gradients flow to BOTH
    child lobes and match finite differences (tracked-gap closure)."""
    api = PbrtAPI(Options(ray_batch=64), render_on_world_end=False)
    api.init()
    api.parse_string(MIX_SCENE)
    r = Renderer(api.scene, api.opt, seed=0)
    theta = r.compiled.initial_theta()
    assert "a" in theta and "b" in theta, "mix scene must produce split theta"
    pixels = jnp.asarray(
        r.film.cropped_pixel_bounds.offsets().astype(np.int32)
    )
    target = np.zeros((8, 8, 3), dtype=np.float32)
    loss = make_loss_fn(r, target, spp=2)
    g = jax.jit(jax.grad(loss))(theta, pixels)
    eps = 1e-2
    lf = jax.jit(loss)

    for half in ("a", "b"):
        def with_kd(delta):
            t2 = dict(theta)
            t2[half] = dict(theta[half])
            t2[half]["kd"] = theta[half]["kd"].at[0, 0].add(delta)
            return float(lf(t2, pixels))

        fd = (with_kd(eps) - with_kd(-eps)) / (2 * eps)
        ad = float(g[half]["kd"][0, 0])
        assert fd != 0.0, f"mix child {half} must contribute to the image"
        np.testing.assert_allclose(ad, fd, rtol=0.05)


def test_gradient_descent_recovers_albedo(renderer):
    """Optimize kd to match a target rendered with known kd."""
    theta_true = renderer.compiled.initial_theta()
    radiance = make_radiance_fn(renderer)
    pixels = jnp.asarray(
        renderer.film.cropped_pixel_bounds.offsets().astype(np.int32)
    )

    def render_mean(theta):
        acc = jnp.zeros((pixels.shape[0], 3))
        for s in range(2):
            sidx = jnp.full((pixels.shape[0],), s, dtype=jnp.uint32)
            acc += radiance(theta, pixels, sidx)
        return acc / 2

    target_flat = np.asarray(jax.jit(render_mean)(theta_true))
    target = target_flat.reshape(8, 8, 3)

    theta = dict(theta_true)
    theta["kd"] = theta["kd"].at[0].set(jnp.array([0.9, 0.1, 0.2]))
    loss = make_loss_fn(renderer, target, spp=2)
    step = jax.jit(jax.value_and_grad(loss))
    lr = 2.0
    for _ in range(60):
        lv, g = step(theta, pixels)
        theta = dict(theta)
        theta["kd"] = jnp.clip(theta["kd"] - lr * g["kd"], 0.0, 1.0)
    final = np.asarray(theta["kd"][0])
    np.testing.assert_allclose(final, [0.4, 0.5, 0.6], atol=0.03)


NESTED_MIX_SCENE = SCENE.replace(
    'Material "matte" "rgb Kd" [0.4 0.5 0.6]',
    '''MakeNamedMaterial "ma" "string type" "matte" "rgb Kd" [0.4 0.5 0.6]
MakeNamedMaterial "mb" "string type" "matte" "rgb Kd" [0.1 0.8 0.3]
MakeNamedMaterial "mc" "string type" "matte" "rgb Kd" [0.7 0.2 0.1]
MakeNamedMaterial "inner" "string type" "mix" "string namedmaterial1" "mb"
  "string namedmaterial2" "mc" "rgb amount" [0.6 0.6 0.6]
Material "mix" "string namedmaterial1" "ma" "string namedmaterial2" "inner"
  "rgb amount" [0.3 0.3 0.3]''',
)


def test_grad_through_nested_mix():
    """Nested mix: theta nests as {"a", "b": {"a", "b"}} and gradients
    flow to all three leaves, matching finite differences."""
    api = PbrtAPI(Options(ray_batch=64), render_on_world_end=False)
    api.init()
    api.parse_string(NESTED_MIX_SCENE)
    r = Renderer(api.scene, api.opt, seed=0)
    theta = r.compiled.initial_theta()
    assert "a" in theta["b"] and "b" in theta["b"], "nested split theta"
    pixels = jnp.asarray(
        r.film.cropped_pixel_bounds.offsets().astype(np.int32)
    )
    target = np.zeros((8, 8, 3), dtype=np.float32)
    loss = make_loss_fn(r, target, spp=2)
    g = jax.jit(jax.grad(loss))(theta, pixels)
    eps = 1e-2
    lf = jax.jit(loss)

    def perturb(path, delta):
        import copy

        t2 = copy.deepcopy({k: v for k, v in theta.items()})
        node = t2
        for k in path[:-1]:
            node[k] = dict(node[k])
            node = node[k]
        node[path[-1]] = node[path[-1]].at[0, 0].add(delta)
        return float(lf(t2, pixels))

    for path in (("a", "kd"), ("b", "a", "kd"), ("b", "b", "kd")):
        fd = (perturb(path, eps) - perturb(path, -eps)) / (2 * eps)
        gn = g
        for k in path:
            gn = gn[k]
        ad = float(gn[0, 0])
        assert fd != 0.0, f"leaf {path} must contribute"
        np.testing.assert_allclose(ad, fd, rtol=0.05)


def test_flat_theta_on_mix_scene_raises():
    """Passing a flat (pre-split) theta to a mix scene must fail loudly."""
    from pbrt_tpu.materials import eval_material_params
    import pytest

    api = PbrtAPI(Options(ray_batch=64), render_on_world_end=False)
    api.init()
    api.parse_string(MIX_SCENE)
    r = Renderer(api.scene, api.opt, seed=0)
    si = {"p": jnp.zeros((4, 3)), "uv": jnp.zeros((4, 2))}
    flat = {"kd": jnp.zeros((len(r.compiled.materials), 3))}
    with pytest.raises(ValueError, match="split"):
        eval_material_params(
            r.compiled.materials, jnp.zeros(4, jnp.int32), si, flat
        )
