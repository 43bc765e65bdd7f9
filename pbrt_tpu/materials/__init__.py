"""Material table: pbrt material records -> per-lane BSDF parameters.

pbrt-v3's 15 material plugins reduce on TPU to a compact lobe-parameter
space (see materials/bsdf.py): every material fills slots
(kd/ks/kr/kt/roughness/eta/metal_eta/metal_k/sigma) via textures, and a
type id selects the lobe combination.  Scene build produces a list of
:class:`MaterialEntry`; at shading time :func:`eval_material_params`
evaluates each entry's textures across the wavefront and mask-selects into
SoA parameter arrays.  Materials with only constant textures cost a single
gather.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp

from pbrt_tpu import float_t
from pbrt_tpu.core.paramset import TextureParams
from pbrt_tpu.materials import bsdf as B

log = logging.getLogger("pbrt_tpu")

# copper (pbrt-v3 metal default) converted to RGB
COPPER_ETA = np.array([0.200438, 0.924033, 1.10221], dtype=np.float64)
COPPER_K = np.array([3.91295, 2.44763, 2.14219], dtype=np.float64)


@dataclass
class MaterialEntry:
    type_id: int
    textures: Dict[str, object] = field(default_factory=dict)  # slot -> Texture
    remap_roughness: bool = True
    metal_eta: np.ndarray = None
    metal_k: np.ndarray = None
    eta_const: float = 1.5


_SPECTRUM_SLOTS = ("kd", "ks", "kr", "kt")
_FLOAT_SLOTS = ("roughness", "sigma", "eta_tex", "opacity")


def build_material(record) -> MaterialEntry:
    """MaterialRecord (core/api.py) -> MaterialEntry."""
    tp = TextureParams(
        record.params,
        record.params,
        record.float_textures,
        record.spectrum_textures,
    )
    name = record.name
    gray = lambda v: np.full(3, v, dtype=float_t)

    def spec_tex(pname, default):
        return tp.get_spectrum_texture(pname, gray(default))

    def float_tex(pname, default):
        return tp.get_float_texture(pname, default)

    if name in ("", "none"):
        return MaterialEntry(B.NONE)
    if name == "matte":
        return MaterialEntry(
            B.MATTE,
            {"kd": spec_tex("Kd", 0.5), "sigma": float_tex("sigma", 0.0)},
        )
    if name == "mirror":
        return MaterialEntry(B.MIRROR, {"kr": spec_tex("Kr", 0.9)})
    if name == "glass":
        e = MaterialEntry(
            B.GLASS,
            {
                "kr": spec_tex("Kr", 1.0),
                "kt": spec_tex("Kt", 1.0),
                "roughness": float_tex("uroughness", 0.0),
            },
        )
        e.eta_const = tp.find_float("eta", tp.find_float("index", 1.5))
        return e
    if name == "plastic":
        e = MaterialEntry(
            B.PLASTIC,
            {
                "kd": spec_tex("Kd", 0.25),
                "ks": spec_tex("Ks", 0.25),
                "roughness": float_tex("roughness", 0.1),
            },
            remap_roughness=tp.find_bool("remaproughness", True),
        )
        return e
    if name == "metal":
        e = MaterialEntry(
            B.METAL,
            {"roughness": float_tex("roughness", 0.01)},
            remap_roughness=tp.find_bool("remaproughness", True),
        )
        e.metal_eta = np.asarray(tp.find_spectrum("eta", COPPER_ETA.astype(float_t)), dtype=np.float64)
        e.metal_k = np.asarray(tp.find_spectrum("k", COPPER_K.astype(float_t)), dtype=np.float64)
        return e
    if name == "substrate":
        return MaterialEntry(
            B.SUBSTRATE,
            {
                "kd": spec_tex("Kd", 0.5),
                "ks": spec_tex("Ks", 0.5),
                "roughness": float_tex("uroughness", 0.1),
            },
            remap_roughness=tp.find_bool("remaproughness", True),
        )
    if name == "uber":
        e = MaterialEntry(
            B.UBER,
            {
                "kd": spec_tex("Kd", 0.25),
                "ks": spec_tex("Ks", 0.25),
                "kr": spec_tex("Kr", 0.0),
                "kt": spec_tex("Kt", 0.0),
                "roughness": float_tex("roughness", 0.1),
                "opacity": spec_tex("opacity", 1.0),
            },
            remap_roughness=tp.find_bool("remaproughness", True),
        )
        e.eta_const = tp.find_float("eta", tp.find_float("index", 1.5))
        return e
    if name == "translucent":
        return MaterialEntry(
            B.TRANSLUCENT,
            {
                "kd": spec_tex("Kd", 0.25),
                "kt": spec_tex("transmit", 0.5),
                "roughness": float_tex("roughness", 0.1),
            },
        )
    if name in ("disney",):
        log.warning("Material 'disney' approximated by substrate lobes on TPU")
        return MaterialEntry(
            B.SUBSTRATE,
            {
                "kd": spec_tex("color", 0.5),
                "ks": spec_tex("color", 0.5),
                "roughness": float_tex("roughness", 0.5),
            },
        )
    if name in ("fourier", "hair", "kdsubsurface", "subsurface", "mix"):
        log.warning("Material '%s' approximated by matte on TPU (round-1 gap)", name)
        return MaterialEntry(B.MATTE, {"kd": spec_tex("Kd", 0.5)})
    log.warning("Material '%s' unknown; using matte.", name)
    return MaterialEntry(B.MATTE, {"kd": spec_tex("Kd", 0.5)})


def material_theta(entries):
    """Extract the differentiable constant-parameter pytree from entries.

    Slots backed by ConstantTexture become rows of [M,3]/[M] arrays; rows for
    procedural/image textures hold the defaults and are ignored at eval.
    Used for inverse rendering: pass (possibly optimized) ``theta`` back into
    :func:`eval_material_params` and gradients flow to these leaves.
    """
    from pbrt_tpu.textures.constant import ConstantTexture

    m = len(entries)
    out = {
        "kd": np.zeros((m, 3), dtype=float_t),
        "ks": np.zeros((m, 3), dtype=float_t),
        "kr": np.zeros((m, 3), dtype=float_t),
        "kt": np.zeros((m, 3), dtype=float_t),
        "roughness": np.full((m,), 0.1, dtype=float_t),
        "sigma": np.zeros((m,), dtype=float_t),
    }
    for k, e in enumerate(entries):
        for slot in ("kd", "ks", "kr", "kt"):
            tex = e.textures.get(slot)
            if isinstance(tex, ConstantTexture):
                v = np.asarray(tex.value, dtype=float_t).reshape(-1)
                out[slot][k] = v if v.size == 3 else np.full(3, float(v[0]))
        for slot in ("roughness", "sigma"):
            tex = e.textures.get(slot)
            if isinstance(tex, ConstantTexture):
                out[slot][k] = float(np.asarray(tex.value).reshape(-1)[0])
    return {k: jnp.asarray(v) for k, v in out.items()}


def eval_material_params(entries, mat_id, si, theta=None):
    """Evaluate all material entries over the wavefront -> SoA params dict.

    mat_id: [N] int32 indices into ``entries`` (-1 = background/none).
    theta: optional differentiable override pytree from
    :func:`material_theta`; constant-texture slots then read from theta
    (gathered by mat_id) so gradients flow, while procedural/image textures
    still evaluate normally.
    """
    n = mat_id.shape[0]
    dt = si["p"].dtype if "p" in si else jnp.float32
    zeros3 = jnp.zeros((n, 3), dtype=dt)
    zeros1 = jnp.zeros((n,), dtype=dt)
    params = {
        "type": jnp.full((n,), B.NONE, dtype=jnp.int32),
        "kd": zeros3,
        "ks": zeros3,
        "kr": zeros3,
        "kt": zeros3,
        "roughness": zeros1 + 1e-3,
        "eta": zeros1 + 1.5,
        "metal_eta": jnp.broadcast_to(jnp.asarray(COPPER_ETA, dtype=dt), (n, 3)),
        "metal_k": jnp.broadcast_to(jnp.asarray(COPPER_K, dtype=dt), (n, 3)),
        "sigma": zeros1,
    }

    def put3(slot, mask, val):
        params[slot] = jnp.where(mask[..., None], val, params[slot])

    def put1(slot, mask, val):
        params[slot] = jnp.where(mask, val, params[slot])

    from pbrt_tpu.textures.constant import ConstantTexture

    # static set of present material types: bsdf lobe code for absent types
    # is pruned from the compiled program entirely
    params["_active"] = frozenset(e.type_id for e in entries)

    if theta is not None and "tex_images" in theta:
        si = {**si, "_tex": theta["tex_images"]}

    safe_id = jnp.clip(mat_id, 0, max(len(entries) - 1, 0))
    for k, e in enumerate(entries):
        mask = mat_id == k
        put1("type", mask, e.type_id)
        for slot in ("kd", "ks", "kr", "kt"):
            tex = e.textures.get(slot)
            if tex is None:
                continue
            if theta is not None and isinstance(tex, ConstantTexture):
                v = jnp.broadcast_to(theta[slot][safe_id], (n, 3))
            else:
                v = tex.eval(si)
                if v.ndim == 1:
                    v = v[..., None] * jnp.ones((1, 3), dtype=dt)
            put3(slot, mask, v)
        rtex = e.textures.get("roughness")
        if rtex is not None:
            if theta is not None and isinstance(rtex, ConstantTexture):
                r = theta["roughness"][safe_id]
            else:
                r = rtex.eval(si)
                if r.ndim > 1:
                    r = r.mean(axis=-1)
            raw = r
            if e.remap_roughness:
                r = B.roughness_to_alpha(r)
            # zero roughness means perfectly smooth (specular glass), and
            # must survive the remap (pbrt builds a specular BxDF there)
            r = jnp.where(raw <= 1e-5, 1e-4, jnp.maximum(r, 1e-3))
            put1("roughness", mask, r)
        stex = e.textures.get("sigma")
        if stex is not None:
            if theta is not None and isinstance(stex, ConstantTexture):
                s = theta["sigma"][safe_id]
            else:
                s = stex.eval(si)
                if s.ndim > 1:
                    s = s.mean(axis=-1)
            put1("sigma", mask, s)
        put1("eta", mask, e.eta_const)
        if e.metal_eta is not None:
            put3("metal_eta", mask, jnp.asarray(e.metal_eta.astype(np.float32)))
            put3("metal_k", mask, jnp.asarray(e.metal_k.astype(np.float32)))
    return params
