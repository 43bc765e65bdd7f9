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
    fourier_pdf_tbl,
    fourier_sample_wi_tbl,
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
    """E[f |cos| / pdf] over the tabulated importance sampler =
    hemispherical albedo = rho for the Lambertian table."""
    tbl = FourierTable.lambertian(RHO, n_mu=64).device_arrays()
    n = 100_000
    rng = np.random.default_rng(6)
    wo = jnp.broadcast_to(jnp.asarray([0.3, -0.2, 0.93], dtype=jnp.float32), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    u_lobe = jnp.asarray(rng.random(n, dtype=np.float32))
    u2 = jnp.asarray(rng.random((n, 2), dtype=np.float32))
    wi = fourier_sample_wi_tbl(tbl, wo, u_lobe, u2)
    f = fourier_f(tbl, wo, wi)
    pdf = fourier_pdf_tbl(tbl, wo, wi)
    w = f * (jnp.abs(wi[:, 2]) / jnp.maximum(pdf, 1e-9))[:, None]
    est = np.asarray(w.mean(axis=0))
    assert np.allclose(est, RHO, rtol=0.05), est
    # importance sampling: all mass lands on the reflection side
    assert (np.asarray(wi[:, 2]) > 0).mean() > 0.999


def _pdf_grid(tbl, wo1, n_mu=256, n_phi=256):
    """Quadrature grid of the sampler pdf over (mu_i, phi) for one wo."""
    mus = np.linspace(-1 + 1e-4, 1 - 1e-4, n_mu).astype(np.float32)
    phis = np.linspace(-PI + 1e-4, PI - 1e-4, n_phi).astype(np.float32)
    mm, pp = np.meshgrid(mus, phis, indexing="ij")
    phi_o = np.arctan2(wo1[1], wo1[0])
    v = phi_o + pp
    s = np.sqrt(np.maximum(1 - mm * mm, 0.0))
    wi = -np.stack([s * np.cos(v), s * np.sin(v), mm], axis=-1).reshape(-1, 3)
    wo = np.broadcast_to(wo1, wi.shape).astype(np.float32)
    pdf = np.asarray(fourier_pdf_tbl(tbl, jnp.asarray(wo), jnp.asarray(wi)))
    return mus, phis, pdf.reshape(n_mu, n_phi)


def test_fourier_pdf_normalized_and_matches_histogram():
    """The pdf integrates to ~1 over (mu_i, phi) and the sampled zenith
    histogram matches the quadrature of the same pdf — sampler and pdf
    describe the same distribution (exact MIS compatibility)."""
    tbl = FourierTable.lambertian(RHO, n_mu=64).device_arrays()
    wo1 = np.array([0.45, 0.15, 0.88], dtype=np.float32)
    wo1 /= np.linalg.norm(wo1)
    mus, phis, pdf = _pdf_grid(tbl, wo1)
    total = np.trapezoid(np.trapezoid(pdf, phis, axis=1), mus)
    np.testing.assert_allclose(total, 1.0, rtol=0.02)

    n = 400_000
    rng = np.random.default_rng(9)
    wo = jnp.broadcast_to(jnp.asarray(wo1), (n, 3))
    wi = fourier_sample_wi_tbl(
        tbl, wo,
        jnp.asarray(rng.random(n, dtype=np.float32)),
        jnp.asarray(rng.random((n, 2), dtype=np.float32)),
    )
    mu_samp = -np.asarray(wi[:, 2])
    marg = np.trapezoid(pdf, phis, axis=1)  # zenith marginal on mus grid
    edges = np.linspace(-1, 1, 11)
    hist, _ = np.histogram(mu_samp, bins=edges)
    frac = hist / n
    for b in range(10):
        seg = np.linspace(edges[b], edges[b + 1], 400)
        want = np.trapezoid(np.interp(seg, mus, marg), seg)
        assert abs(frac[b] - want) < 0.01, (b, frac[b], want)


def test_fourier_phi_importance_sampling():
    """A glossy synthetic table (a_k = [1, .6, .3, .1]) must produce a phi
    histogram proportional to its own azimuthal series."""
    coeffs = np.array([1.0, 0.6, 0.3, 0.1])
    n_mu = 32
    mu = np.linspace(-1, 1, n_mu)
    oal = np.zeros((n_mu * n_mu, 2), dtype=np.int64)
    runs, off = [], 0
    for i in range(n_mu):
        for j in range(n_mu):
            if mu[i] * mu[j] < 0:
                a = np.outer(np.ones(3), coeffs * abs(mu[i])).astype(np.float32)
                oal[i * n_mu + j] = (off, 4)
                runs.append(a.reshape(-1))
                off += 12
    a = np.concatenate(runs)
    tbl = FourierTable(1.0, mu, oal, a, m_max=4, n_channels=3).device_arrays()

    n = 400_000
    rng = np.random.default_rng(11)
    wo1 = np.array([0.6, 0.0, 0.8], dtype=np.float32)
    wo = jnp.broadcast_to(jnp.asarray(wo1), (n, 3))
    wi = fourier_sample_wi_tbl(
        tbl, wo,
        jnp.asarray(rng.random(n, dtype=np.float32)),
        jnp.asarray(rng.random((n, 2), dtype=np.float32)),
    )
    from pbrt_tpu.materials.fourier import _mu_phi

    _, _, phi = _mu_phi(wo, wi)
    phi = np.asarray(phi)  # in [0, pi] (arccos folds the sign)
    dens = lambda p: sum(c * np.cos(k * p) for k, c in enumerate(coeffs))
    edges = np.linspace(0, PI, 9)
    hist, _ = np.histogram(phi, bins=edges)
    frac = hist / n
    grid = np.linspace(0, PI, 2001)
    norm = np.trapezoid(dens(grid), grid)
    for b in range(8):
        seg = np.linspace(edges[b], edges[b + 1], 200)
        want = np.trapezoid(dens(seg), seg) / norm
        assert abs(frac[b] - want) < 0.012, (b, frac[b], want)


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
