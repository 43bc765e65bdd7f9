"""Constant texture (reference textures/constant.rs, completed batched)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pbrt_tpu import float_t


class ConstantTexture:
    """Returns its value for every lane; value may be scalar or RGB."""

    def __init__(self, value):
        self.value = np.asarray(value, dtype=float_t)

    @property
    def spectral(self) -> bool:
        return self.value.ndim > 0 and self.value.shape[-1] == 3

    def eval(self, si):
        n = si["uv"].shape[0] if "uv" in si else si["p"].shape[0]
        v = jnp.asarray(self.value)
        if self.spectral:
            return jnp.broadcast_to(v.reshape(-1)[:3], (n, 3))
        return jnp.broadcast_to(v.reshape(()), (n,))

    def grad_params(self):
        """Differentiable parameters for inverse rendering."""
        return {"value": self.value}


def create_constant_float(tex2world, tp, spectral=False):
    # textures/constant.rs:61-68: tp.find_float("value", 1.)
    if spectral:
        return ConstantTexture(tp.find_spectrum("value", np.ones(3, dtype=float_t)))
    return ConstantTexture(tp.find_float("value", 1.0))


def create_constant_spectrum(tex2world, tp, spectral=True):
    return ConstantTexture(tp.find_spectrum("value", np.ones(3, dtype=float_t)))
