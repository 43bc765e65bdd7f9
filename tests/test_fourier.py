"""Fourier BSDF tests (pbrt-v3 ``fourier`` material, reflection.cpp).

No measured .bsdf assets exist in the reference tree, so the anchors are
synthetic: a Lambertian encoded into the Fourier table format must evaluate
back to rho/pi, survive a file round-trip byte-for-byte in behavior, and
conserve energy under the two-sided cosine sampler.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from pbrt_tpu.materials import bsdf as B
from pbrt_tpu.materials.fourier import (
    FourierTable,
    fourier_f,
    fourier_pdf,
    fourier_sample_wi,
)

PI = np.pi
RHO = (0.7, 0.4, 0.2)


def _dirs(n, seed, up=True):
    rng = np.random.default_rng(seed)
    u = rng.random((n, 2))
    z = u[:, 0] if up else 1.0 - 2.0 * u[:, 0]
    z = np.clip(z, 0.05, 0.95) if up else z
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    phi = 2 * PI * u[:, 1]
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1).astype(np.float32)


def test_lambertian_table_evaluates_to_rho_over_pi():
    tbl = FourierTable.lambertian(RHO, n_mu=64).device_arrays()
    n = 256
    wo = jnp.asarray(_dirs(n, 1))
    wi = jnp.asarray(_dirs(n, 2))  # reflection side (both +z)
    f = np.asarray(fourier_f(tbl, wo, wi))
    want = np.asarray(RHO) / PI
    assert np.allclose(f, want[None, :], rtol=0.08), (f[:3], want)
    # transmission directions evaluate to ~0
    wi_t = jnp.asarray(_dirs(n, 3)) * jnp.asarray([1.0, 1.0, -1.0])
    f_t = np.asarray(fourier_f(tbl, wo, wi_t))
    assert f_t.max() < 0.02


def test_table_file_round_trip(tmp_path):
    t0 = FourierTable.lambertian(RHO, n_mu=32)
    path = os.path.join(tmp_path, "lambert.bsdf")
    t0.write(path)
    t1 = FourierTable.read(path)
    assert t1.n_mu == t0.n_mu and t1.n_channels == 3
    assert np.allclose(t1.mu, t0.mu, atol=1e-6)
    d0, d1 = t0.device_arrays(), t1.device_arrays()
    assert np.allclose(np.asarray(d0["a"]), np.asarray(d1["a"]), atol=1e-7)
    wo = jnp.asarray(_dirs(64, 4))
    wi = jnp.asarray(_dirs(64, 5))
    assert np.allclose(
        np.asarray(fourier_f(d0, wo, wi)), np.asarray(fourier_f(d1, wo, wi)), atol=1e-6
    )


def test_fourier_sampling_energy():
    """E[f |cos| / pdf] over the two-sided cosine sampler = hemispherical
    albedo = rho for the Lambertian table."""
    tbl = FourierTable.lambertian(RHO, n_mu=64).device_arrays()
    n = 100_000
    rng = np.random.default_rng(6)
    wo = jnp.broadcast_to(jnp.asarray([0.3, -0.2, 0.93], dtype=jnp.float32), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    u_lobe = jnp.asarray(rng.random(n, dtype=np.float32))
    u2 = jnp.asarray(rng.random((n, 2), dtype=np.float32))
    wi = fourier_sample_wi(wo, u_lobe, u2)
    f = fourier_f(tbl, wo, wi)
    pdf = fourier_pdf(wo, wi)
    w = f * (jnp.abs(wi[:, 2]) / jnp.maximum(pdf, 1e-9))[:, None]
    est = np.asarray(w.mean(axis=0))
    assert np.allclose(est, RHO, rtol=0.1), est


def test_fourier_material_end_to_end(tmp_path):
    """Material "fourier" with a Lambertian table renders identically to
    matte with the same albedo."""
    from pbrt_tpu import Options
    from pbrt_tpu.core.api import PbrtAPI
    from pbrt_tpu.render import render_scene

    path = os.path.join(tmp_path, "lambert.bsdf")
    FourierTable.lambertian((0.6, 0.6, 0.6), n_mu=64).write(path)
    tmpl = """
LookAt 0 0 -3  0 0 0  0 1 0
Camera "perspective" "float fov" 40
Sampler "halton" "integer pixelsamples" 32
Integrator "path" "integer maxdepth" 2
Film "image" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
%s
Shape "sphere" "float radius" 1
WorldEnd
"""

    def render(mat):
        api = PbrtAPI(Options(ray_batch=8192), render_on_world_end=False)
        api.init()
        api.parse_string(tmpl % mat)
        return render_scene(api.scene, api.opt, seed=0, write=False)["image"]

    img_f = render('Material "fourier" "string bsdffile" "%s"' % path)
    img_m = render('Material "matte" "rgb Kd" [0.6 0.6 0.6]')
    c = (slice(5, 11), slice(5, 11))
    assert np.allclose(img_f[c].mean(axis=(0, 1)), img_m[c].mean(axis=(0, 1)), atol=0.03)


def test_fourier_missing_file_falls_back_to_matte():
    from pbrt_tpu.core.api import MaterialRecord
    from pbrt_tpu.core.paramset import ParamSet
    from pbrt_tpu.materials import build_material

    ps = ParamSet()
    ps.add_string("bsdffile", ["/nonexistent/nope.bsdf"])
    rec = MaterialRecord(
        name="fourier", params=ps, float_textures={}, spectrum_textures={}
    )
    e = build_material(rec)
    assert e.type_id == B.MATTE
