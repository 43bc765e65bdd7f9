"""Image texture backed by a MIPMap (pbrt-v3 §10.4).

The image is loaded and converted at scene-build time on host (degamma for
8-bit formats, scale applied), then lives in HBM as a flat pyramid; lookups
are gathers inside the jitted wavefront.
"""

from __future__ import annotations

import logging

import numpy as np

from pbrt_tpu import float_t, inverse_gamma_correct
from pbrt_tpu.core.imageio import read_image
from pbrt_tpu.core.mipmap import MIPMap, WRAP_NAMES, WRAP_REPEAT

log = logging.getLogger("pbrt_tpu")


_TEX_ID_COUNTER = [0]


class ImageTexture:
    def __init__(self, mapping, filename: str, do_trilinear=True, max_aniso=8.0,
                 wrap="repeat", scale=1.0, gamma=None, spectral=True):
        self.mapping = mapping
        self.spectral = spectral
        self.tex_id = _TEX_ID_COUNTER[0]
        _TEX_ID_COUNTER[0] += 1
        try:
            img, (w, h) = read_image(filename)
        except (OSError, ValueError) as e:
            log.error("Couldn't read image '%s' (%s); using constant 0.5", filename, e)
            img = np.full((1, 1, 3), 0.5, dtype=float_t)
        if gamma is None:
            gamma = filename.lower().endswith((".png", ".tga"))
        img = np.asarray(img, dtype=np.float64)
        if gamma:
            img = inverse_gamma_correct(img.astype(float_t)).astype(np.float64)
        img = img * float(scale)
        if not spectral:
            # float texture: luminance-ish average
            img = img.mean(axis=-1, keepdims=True)
        else:
            # active spectral pass: promote linear texel RGB to bin samples
            from pbrt_tpu.core.spectrum import get_spectral_bins, promote_rgb

            if get_spectral_bins() is not None:
                img = promote_rgb(img).astype(np.float64)
        # pbrt flips v: image row 0 is top; texture t=0 is bottom
        img = img[::-1]
        self.mipmap = MIPMap(
            img.astype(float_t),
            wrap=WRAP_NAMES.get(wrap, WRAP_REPEAT),
            do_trilinear=do_trilinear,
            max_anisotropy=max_aniso,
        )

    def eval(self, si):
        s, t = self.mapping.map(si)
        s = s - jnp_floor_if_repeat(s, self.mipmap.wrap)
        t2 = t - jnp_floor_if_repeat(t, self.mipmap.wrap)
        # differentiable texel override (theta["tex_images"][tex_id])
        flat = si.get("_tex", {}).get(self.tex_id)
        width = si.get("tex_width")
        duvdx = si.get("duvdx")
        if width is None:
            return self.mipmap.lookup(s, t2, None, flat=flat)
        if not self.mipmap.do_trilinear and duvdx is not None:
            import jax.numpy as jnp

            wvec = jnp.asarray(getattr(self.mapping, "width_vec", (1.0, 1.0)))
            return self.mipmap.lookup_aniso(
                s, t2, duvdx * wvec, si["duvdy"] * wvec, flat=flat
            )
        wscale = getattr(self.mapping, "width_scale", 1.0)
        return self.mipmap.lookup(s, t2, width * wscale, flat=flat)


def jnp_floor_if_repeat(x, wrap):
    import jax.numpy as jnp

    if wrap == WRAP_REPEAT:
        return jnp.floor(x)
    return jnp.zeros_like(x)
