"""UV debug texture (pbrt-v3 §10.5.4): rgb = (s mod 1, t mod 1, 0)."""

from __future__ import annotations

import jax.numpy as jnp


class UVTexture:
    def __init__(self, mapping):
        self.mapping = mapping

    def eval(self, si):
        s, t = self.mapping.map(si)
        return jnp.stack([s - jnp.floor(s), t - jnp.floor(t), jnp.zeros_like(s)], axis=-1)
