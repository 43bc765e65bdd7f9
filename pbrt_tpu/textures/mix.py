"""Mix and bilerp textures (pbrt-v3 §10.3.4-10.3.5)."""

from __future__ import annotations

import jax.numpy as jnp


class MixTexture:
    """lerp(amount, tex1, tex2)."""

    def __init__(self, tex1, tex2, amount):
        self.tex1 = tex1
        self.tex2 = tex2
        self.amount = amount

    def eval(self, si):
        t1 = self.tex1.eval(si)
        t2 = self.tex2.eval(si)
        amt = self.amount.eval(si)
        if t1.ndim > amt.ndim:
            amt = amt[..., None]
        return (1.0 - amt) * t1 + amt * t2


class BilerpTexture:
    """Bilinear blend of four corner values over (u, v)."""

    def __init__(self, mapping, v00, v01, v10, v11):
        self.mapping = mapping
        self.v00 = jnp.asarray(v00)
        self.v01 = jnp.asarray(v01)
        self.v10 = jnp.asarray(v10)
        self.v11 = jnp.asarray(v11)

    def eval(self, si):
        s, t = self.mapping.map(si)
        if self.v00.ndim > 0:
            s = s[..., None]
            t = t[..., None]
        return (
            (1 - s) * (1 - t) * self.v00
            + (1 - s) * t * self.v01
            + s * (1 - t) * self.v10
            + s * t * self.v11
        )
