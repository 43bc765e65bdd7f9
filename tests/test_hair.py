"""Hair BSDF tests, modeled on pbrt-v3 src/tests/hair.cpp.

The reference implements no materials (SURVEY.md §0); these anchors are the
analytic properties pbrt-v3's own test suite checks for its hair model:
white furnace (energy conservation at sigma_a = 0), sampled-weight
consistency, pdf normalization over the sphere, plus a geometric check that
our tube-derived azimuthal offset ``h`` has the sign pbrt's Phi convention
expects (specular R lobe peaks at the mirror direction).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pbrt_tpu.materials import bsdf as B
from pbrt_tpu.materials.hair import (
    demux_float,
    hair_f,
    hair_pdf,
    hair_sample_wi,
    sigma_a_from_concentration,
)

PI = np.pi


def _params(n, sigma_a=(0.0, 0.0, 0.0), beta_m=0.3, beta_n=0.3, alpha=0.0):
    return {
        "type": jnp.full((n,), B.HAIR, dtype=jnp.int32),
        "sigma_a": jnp.broadcast_to(jnp.asarray(sigma_a, dtype=jnp.float32), (n, 3)),
        "beta_m": jnp.full((n,), beta_m, dtype=jnp.float32),
        "beta_n": jnp.full((n,), beta_n, dtype=jnp.float32),
        "hair_alpha": jnp.full((n,), alpha, dtype=jnp.float32),
        "eta": jnp.full((n,), 1.55, dtype=jnp.float32),
        "kd": jnp.zeros((n, 3), dtype=jnp.float32),
        "sigma": jnp.zeros((n,), dtype=jnp.float32),
        "roughness": jnp.full((n,), 0.1, dtype=jnp.float32),
    }


def _sphere_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.random((n, 2))
    z = 1.0 - 2.0 * u[:, 0]
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    phi = 2 * PI * u[:, 1]
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1).astype(np.float32)


def _rand_wo(rng):
    """A random outgoing direction with wo.z > 0 (face-forwarded frame)."""
    w = rng.normal(size=3)
    w /= np.linalg.norm(w)
    w[2] = abs(w[2]) + 1e-3
    return (w / np.linalg.norm(w)).astype(np.float32)


@pytest.mark.parametrize("beta", [(0.1, 0.1), (0.25, 0.3), (0.6, 0.7), (1.0, 1.0)])
def test_white_furnace(beta):
    """sigma_a = 0: the fiber absorbs nothing, so the full-sphere integral of
    f |cos| must be 1 for every wo (pbrt-v3 WhiteFurnace test)."""
    beta_m, beta_n = beta
    n = 200_000
    wi = jnp.asarray(_sphere_dirs(n, seed=1))
    rng = np.random.default_rng(2)
    wo = jnp.broadcast_to(jnp.asarray(_rand_wo(rng)), (n, 3))
    p = _params(n, beta_m=beta_m, beta_n=beta_n)
    f = hair_f(p, wo, wi)
    # uniform sphere pdf = 1/(4 pi)
    est = (f[:, 0] * jnp.abs(wi[:, 2])).mean() * 4.0 * PI
    assert float(est) == pytest.approx(1.0, abs=0.05)


@pytest.mark.parametrize("beta", [(0.15, 0.2), (0.5, 0.4), (1.0, 1.0)])
def test_white_furnace_sampled(beta):
    """Importance-sampled furnace: E[f |cos| / pdf] = 1 at sigma_a = 0
    (pbrt-v3 WhiteFurnaceSampled)."""
    beta_m, beta_n = beta
    n = 100_000
    rng = np.random.default_rng(3)
    wo = jnp.broadcast_to(jnp.asarray(_rand_wo(rng)), (n, 3))
    p = _params(n, beta_m=beta_m, beta_n=beta_n)
    u_lobe = jnp.asarray(rng.random(n, dtype=np.float32))
    u2 = jnp.asarray(rng.random((n, 2), dtype=np.float32))
    wi = hair_sample_wi(p, wo, u_lobe, u2)
    f = hair_f(p, wo, wi)
    pdf = hair_pdf(p, wo, wi)
    w = jnp.where(pdf > 1e-9, f[:, 0] * jnp.abs(wi[:, 2]) / jnp.maximum(pdf, 1e-9), 0.0)
    assert float(w.mean()) == pytest.approx(1.0, abs=0.05)


@pytest.mark.parametrize("beta", [(0.2, 0.3), (0.8, 0.6)])
def test_pdf_normalized(beta):
    """hair_pdf integrates to ~1 over the sphere (pbrt-v3 SamplingConsistency
    prerequisite)."""
    beta_m, beta_n = beta
    n = 200_000
    wi = jnp.asarray(_sphere_dirs(n, seed=5))
    rng = np.random.default_rng(6)
    wo = jnp.broadcast_to(jnp.asarray(_rand_wo(rng)), (n, 3))
    p = _params(n, beta_m=beta_m, beta_n=beta_n)
    pdf = hair_pdf(p, wo, wi)
    est = pdf.mean() * 4.0 * PI
    assert float(est) == pytest.approx(1.0, abs=0.05)


def test_sampling_matches_pdf():
    """Compare a sampled histogram of wi.x (= sin theta_i) against the pdf:
    the sampler must draw from the distribution hair_pdf claims."""
    n = 200_000
    rng = np.random.default_rng(7)
    wo = jnp.broadcast_to(jnp.asarray(_rand_wo(rng)), (n, 3))
    p = _params(n, sigma_a=(0.25, 0.25, 0.25), beta_m=0.4, beta_n=0.4)
    u_lobe = jnp.asarray(rng.random(n, dtype=np.float32))
    u2 = jnp.asarray(rng.random((n, 2), dtype=np.float32))
    wi_s = np.asarray(hair_sample_wi(p, wo, u_lobe, u2))
    # histogram estimate of marginal in sin(theta_i)
    hist_s, edges = np.histogram(wi_s[:, 0], bins=24, range=(-1, 1), density=True)
    # pdf-weighted estimate of the same marginal from uniform directions
    wi_u = _sphere_dirs(n, seed=8)
    pdf_u = np.asarray(hair_pdf(p, wo, jnp.asarray(wi_u)))
    hist_p, _ = np.histogram(
        wi_u[:, 0], bins=24, range=(-1, 1), weights=pdf_u * 4.0 * PI, density=True
    )
    mask = (hist_p > 0.05) & (hist_s > 0.05)
    assert mask.sum() >= 8
    assert np.allclose(hist_s[mask], hist_p[mask], rtol=0.25)


def test_r_lobe_peaks_at_mirror_direction():
    """Near-specular fiber: the R lobe must peak at the mirror reflection
    about the tube normal — this pins the sign of the derived h."""
    n = 1
    # wo 30 degrees off the normal within the normal plane (no longitudinal tilt)
    gamma = np.deg2rad(30.0)
    wo = jnp.asarray([[0.0, np.sin(gamma), np.cos(gamma)]], dtype=jnp.float32)
    # mirror about z in the (y,z) plane
    wi_mirror = jnp.asarray([[0.0, -np.sin(gamma), np.cos(gamma)]], dtype=jnp.float32)
    # high absorption kills TT/TRT; narrow beta makes R near-specular
    p = _params(n, sigma_a=(1e3, 1e3, 1e3), beta_m=0.08, beta_n=0.08)
    f_mirror = float(hair_f(p, wo, wi_mirror)[0, 0])
    # f at several off-mirror azimuths must be much smaller
    for dphi in (0.5, 1.0, 2.0, -0.5, -1.0):
        ang = -gamma + dphi  # azimuth of wi about x, measured from +z
        wi = jnp.asarray([[0.0, -np.sin(gamma + 0), 0.0]])  # placeholder
        wi = jnp.asarray(
            [[0.0, np.sin(ang + 0 * gamma), np.cos(ang)]], dtype=jnp.float32
        )
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        f_off = float(hair_f(p, wo, wi)[0, 0])
        assert f_mirror > 2.0 * f_off, (dphi, f_mirror, f_off)


def test_reciprocity_of_full_transport():
    """Chiang-style check: f(wo,wi)*|cos wi| vs f(wi,wo)*|cos wo| agree to a
    few percent for non-grazing pairs (the model is only approximately
    reciprocal, like pbrt's)."""
    n = 64
    rng = np.random.default_rng(11)
    wo = np.stack([_rand_wo(rng) for _ in range(n)])
    wi = np.stack([_rand_wo(rng) for _ in range(n)])
    p = _params(n, sigma_a=(0.1, 0.1, 0.1), beta_m=0.5, beta_n=0.5)
    a = np.asarray(hair_f(p, jnp.asarray(wo), jnp.asarray(wi))[:, 0]) * np.abs(wi[:, 2])
    b = np.asarray(hair_f(p, jnp.asarray(wi), jnp.asarray(wo))[:, 0]) * np.abs(wo[:, 2])
    ok = (a > 1e-3) & (b > 1e-3)
    ratio = a[ok] / b[ok]
    # median ratio near 1 (h differs per side, so only statistical symmetry)
    assert np.median(ratio) == pytest.approx(1.0, abs=0.25)


def test_demux_float_partitions_bits():
    u = jnp.asarray(np.random.default_rng(12).random(1000, dtype=np.float32))
    a, b = demux_float(u)
    a = np.asarray(a)
    b = np.asarray(b)
    assert (a >= 0).all() and (a < 1).all() and (b >= 0).all() and (b < 1).all()
    # roughly uniform marginals
    assert abs(a.mean() - 0.5) < 0.03 and abs(b.mean() - 0.5) < 0.03
    # and decorrelated
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.1


def test_sigma_a_helpers():
    s = sigma_a_from_concentration(1.3, 0.0)
    assert s.shape == (3,) and (s > 0).all()
    # darker hair = more eumelanin
    s2 = sigma_a_from_concentration(8.0, 0.0)
    assert (s2 > s).all()


def test_hair_through_bsdf_dispatch():
    """HAIR lanes route through bsdf_eval/bsdf_pdf/bsdf_sample next to other
    material types without perturbing them."""
    n = 128
    rng = np.random.default_rng(13)
    p = _params(n, sigma_a=(0.2, 0.3, 0.4))
    # half the lanes are matte
    mtype = np.full(n, B.HAIR, dtype=np.int32)
    mtype[::2] = B.MATTE
    p["type"] = jnp.asarray(mtype)
    p["kd"] = jnp.full((n, 3), 0.5, dtype=jnp.float32)
    p["_active"] = frozenset({B.MATTE, B.HAIR})
    wo = jnp.asarray(np.stack([_rand_wo(rng) for _ in range(n)]))
    u_lobe = jnp.asarray(rng.random(n, dtype=np.float32))
    u2 = jnp.asarray(rng.random((n, 2), dtype=np.float32))
    wi, f, pdf, spec = B.bsdf_sample(p, wo, u_lobe, u2)
    assert not bool(jnp.isnan(f).any()) and not bool(jnp.isnan(pdf).any())
    assert not bool(spec[1::2].any())  # hair is never specular-flagged
    # matte lanes stayed cosine-hemisphere: wi.z > 0 relative to wo side
    matte = np.asarray(wi)[::2]
    wo_np = np.asarray(wo)[::2]
    assert (np.sign(matte[:, 2]) == np.sign(wo_np[:, 2])).all()
    f2 = B.bsdf_eval(p, wo, wi)
    pdf2 = B.bsdf_pdf(p, wo, wi)
    assert np.allclose(np.asarray(f), np.asarray(f2), atol=1e-5)
    assert np.allclose(np.asarray(pdf), np.asarray(pdf2), atol=1e-5)
