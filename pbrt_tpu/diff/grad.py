"""Reverse-mode pixel gradients w.r.t. material/light parameters.

The estimator is detached-sampling reverse-mode: sampling decisions
(directions, lobe/light choices, Russian roulette) are treated as fixed by
the forward pass's random numbers — because every sampler value is a pure
function of (pixel, sample, dim), JAX's reverse pass **replays the exact
same paths** while differentiating the smooth factors (BSDF values, light
radiances, MIS weights).  This is path-replay backprop in the autodiff
limit: ``jax.checkpoint`` on each bounce makes the backward pass re-trace
(replay) rather than store the full wavefront state per bounce.

Gradient targets (see ``CompiledScene.initial_theta``): constant material
slots (kd/ks/kr/kt/roughness/sigma) and emission colors of
infinite/area lights.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pbrt_tpu import float_t


def make_radiance_fn(renderer, remat: bool = True):
    """Returns f(theta, pixel_xy, sample_index) -> L [N,3].

    ``remat=True`` (default) turns on per-bounce ``jax.checkpoint`` in the
    integrator: the backward pass replays each bounce from its inputs
    (path-replay backprop) instead of materializing per-bounce wavefront
    state — constant-in-depth activation memory.
    """
    import copy

    sampler = renderer.sampler
    camera = renderer.camera
    integrator = copy.copy(renderer.integrator)
    integrator.remat = remat

    def radiance(theta, pixel_xy, sample_index):
        u_film = sampler.get2(pixel_xy, sample_index, 0)
        p_film = pixel_xy.astype(float_t) + u_film
        u_lens = sampler.get2(pixel_xy, sample_index, 2)
        o, d, w = camera.generate_rays(p_film, u_lens)
        L = integrator.li(sampler, pixel_xy, sample_index, o, d, theta=theta)
        return jnp.where(jnp.isfinite(L), L, 0.0) * w[..., None]

    return radiance


def make_loss_fn(renderer, target_image, spp: int = 4):
    """MSE inverse-rendering loss over a pixel batch.

    target_image: [H, W, 3] (cropped-film coordinates).
    Returns loss(theta, pixel_xy) averaging ``spp`` samples per pixel.
    """
    radiance = make_radiance_fn(renderer)
    target = jnp.asarray(np.asarray(target_image, dtype=float_t))
    bx, by = renderer.film.cropped_pixel_bounds.p_min

    def loss(theta, pixel_xy):
        n = pixel_xy.shape[0]
        acc = jnp.zeros((n, 3), dtype=float_t)
        for s in range(spp):
            sidx = jnp.full((n,), s, dtype=jnp.uint32)
            acc = acc + radiance(theta, pixel_xy, sidx)
        rendered = acc / spp
        t = target[pixel_xy[..., 1] - by, pixel_xy[..., 0] - bx]
        return jnp.mean((rendered - t) ** 2)

    return loss


def render_image_diff(renderer, theta, spp: int = 4, batch: int = 4096):
    """Differentiable full-frame render -> [H,W,3] (mean of spp samples at
    pixel centers region; box-filter radius <= 0.5 equivalent)."""
    radiance = make_radiance_fn(renderer)
    film = renderer.film
    b = film.cropped_pixel_bounds
    pixels = b.offsets().astype(np.int32)
    n_pix = len(pixels)
    h, wdt = b.height, b.width

    img = jnp.zeros((h * wdt, 3), dtype=float_t)
    n_chunks = -(-n_pix // batch)
    pad = n_chunks * batch - n_pix
    if pad:
        pixels = np.concatenate([pixels, np.repeat(pixels[-1:], pad, axis=0)])
    for ci in range(n_chunks):
        chunk = jnp.asarray(pixels[ci * batch : (ci + 1) * batch])
        acc = jnp.zeros((batch, 3), dtype=float_t)
        for s in range(spp):
            sidx = jnp.full((batch,), s, dtype=jnp.uint32)
            acc = acc + radiance(theta, chunk, sidx)
        lin = (chunk[..., 1] - b.p_min[1]) * wdt + (chunk[..., 0] - b.p_min[0])
        img = img.at[lin].set(acc / spp)
    return img.reshape(h, wdt, 3)
