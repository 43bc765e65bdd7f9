"""Fourier-basis measured/layered BSDF (pbrt-v3 ``fourier`` material).

pbrt-v3 implements this in src/core/reflection.{h,cpp} (FourierBSDF,
FourierBSDFTable) reading layerlab ``.bsdf`` tables; the reference names no
materials at all (SURVEY.md §0).  The model: f(mu_i, mu_o, phi) =
(1/|mu_i|) sum_k a_k(mu_i, mu_o) cos(k phi), with the coefficient vectors
a_k stored per (zenith-knot i, zenith-knot j) pair and interpolated with a
4x4 Catmull-Rom spline stencil.

TPU-native redesign of the data layout: pbrt stores ragged coefficient runs
(offset+length per knot pair) and walks them scalar-wise.  Here the ragged
table is padded ONCE at load time into a dense ``[nMu, nMu, nChannels, M]``
array (M = min(mMax, order cap)), so evaluation over a wavefront is a pair
of searchsorted's, a 4x4 weighted dense gather, and one [N, M] @ cos(k phi)
contraction — no pointer chasing, MXU-friendly.  The order cap (default
256) truncates only the sharpest near-specular tables; the energy dropped
is logged at load.

Sampling: pbrt importance-samples the tabulated marginal CDFs; round-1 here
samples a two-sided cosine lobe (exactly MIS-compatible via fourier_pdf).

File layout follows pbrt-v3 FourierBSDFTable::Read: 8-byte magic
"SCATFUN\\x01", int32 fields (flags, nMu, nCoeffs, mMax, nChannels, nBases,
3 unused), float eta, 4 unused int32, then mu[nMu], cdf[nMu*nMu],
offset_and_length[2*nMu*nMu] (int32), a[nCoeffs] (float32), little-endian.
A writer is provided so synthetic tables (e.g. Lambertian) round-trip for
tests.
"""

from __future__ import annotations

import logging
import struct

import numpy as np

import jax.numpy as jnp

from pbrt_tpu import INV_PI, PI, float_t

log = logging.getLogger("pbrt_tpu")

MAGIC = b"SCATFUN\x01"
DEFAULT_ORDER_CAP = 256


class FourierTable:
    """Host-side table: raw knot/coefficient storage + dense padded arrays."""

    def __init__(self, eta, mu, offset_and_length, a, m_max, n_channels,
                 order_cap=DEFAULT_ORDER_CAP):
        self.eta = float(eta)
        self.mu = np.asarray(mu, dtype=np.float64)
        self.n_mu = len(self.mu)
        self.m_max = int(m_max)
        self.n_channels = int(n_channels)
        m_used = min(self.m_max, order_cap)
        n = self.n_mu
        dense = np.zeros((n, n, self.n_channels, m_used), dtype=np.float32)
        dropped = 0.0
        total = 0.0
        oal = np.asarray(offset_and_length, dtype=np.int64).reshape(n * n, 2)
        for idx in range(n * n):
            off, m = oal[idx]
            if m == 0:
                continue
            run = np.asarray(a[off : off + m * self.n_channels], dtype=np.float64)
            run = run.reshape(self.n_channels, m)
            keep = min(m, m_used)
            dense[idx // n, idx % n, :, :keep] = run[:, :keep]
            total += np.abs(run).sum()
            dropped += np.abs(run[:, keep:]).sum()
        if total > 0 and dropped > 0:
            log.info(
                "fourier table: order capped at %d (%.3g%% coefficient mass dropped)",
                m_used, 100.0 * dropped / total,
            )
        self.a_dense = dense  # [nMu, nMu, C, M]
        self.m_used = m_used

    # -- I/O -----------------------------------------------------------------

    @classmethod
    def read(cls, filename: str, order_cap=DEFAULT_ORDER_CAP):
        with open(filename, "rb") as f:
            if f.read(8) != MAGIC:
                raise ValueError(f"{filename}: not a SCATFUN v1 .bsdf file")
            flags, n_mu, n_coeffs, m_max, n_channels, n_bases = struct.unpack(
                "<6i", f.read(24)
            )
            f.read(12)  # 3 unused int32
            (eta,) = struct.unpack("<f", f.read(4))
            f.read(16)  # 4 unused int32
            if flags != 1:
                raise ValueError(f"{filename}: unsupported flags {flags}")
            if n_bases != 1:
                raise ValueError(f"{filename}: nBases {n_bases} != 1 unsupported")
            if n_channels not in (1, 3):
                raise ValueError(f"{filename}: nChannels {n_channels}")
            mu = np.frombuffer(f.read(4 * n_mu), dtype="<f4")
            _cdf = np.frombuffer(f.read(4 * n_mu * n_mu), dtype="<f4")
            oal = np.frombuffer(f.read(8 * n_mu * n_mu), dtype="<i4")
            a = np.frombuffer(f.read(4 * n_coeffs), dtype="<f4")
        return cls(eta, mu, oal, a, m_max, n_channels, order_cap)

    def write(self, filename: str):
        """Serialize in the same layout (for synthetic tables and tests)."""
        n = self.n_mu
        runs = []
        oal = np.zeros((n * n, 2), dtype="<i4")
        off = 0
        for idx in range(n * n):
            coef = self.a_dense[idx // n, idx % n]  # [C, M]
            m = int(np.max(np.nonzero(np.abs(coef).sum(axis=0) > 0)[0]) + 1) if np.abs(coef).sum() > 0 else 0
            oal[idx] = (off, m)
            if m:
                runs.append(coef[:, :m].astype("<f4").reshape(-1))
                off += m * self.n_channels
        a = np.concatenate(runs) if runs else np.zeros(0, dtype="<f4")
        with open(filename, "wb") as f:
            f.write(MAGIC)
            f.write(struct.pack("<6i", 1, n, len(a), self.m_used, self.n_channels, 1))
            f.write(struct.pack("<3i", 0, 0, 0))
            f.write(struct.pack("<f", self.eta))
            f.write(struct.pack("<4i", 0, 0, 0, 0))
            f.write(self.mu.astype("<f4").tobytes())
            f.write(np.zeros(n * n, dtype="<f4").tobytes())  # cdf (unused here)
            f.write(oal.tobytes())
            f.write(a.astype("<f4").tobytes())

    @classmethod
    def lambertian(cls, rho=(0.5, 0.5, 0.5), n_mu=16):
        """Synthetic table for f = rho/pi, reflection only (test anchor).

        The stored a0(mu_i, mu_o) includes the |mu_i| factor that eval
        divides back out (pbrt's convention), and is zero unless mu_i and
        mu_o lie on opposite sides of the surface (mu_i measured along -wi).
        """
        rho = np.asarray(rho, dtype=np.float64)
        # pbrt channel order for nChannels=3 tables: (luminance Y, R, B);
        # G is reconstructed at eval time from the luminance identity
        y = 0.212671 * rho[0] + 0.715160 * rho[1] + 0.072169 * rho[2]
        chans = np.array([y, rho[0], rho[2]])
        mu = np.concatenate([-np.cos(np.linspace(0, PI / 2, n_mu // 2)),
                             np.cos(np.linspace(PI / 2, 0, n_mu // 2))])
        mu = np.unique(np.clip(mu, -1, 1))
        n = len(mu)
        oal = np.zeros((n * n, 2), dtype=np.int64)
        coeffs = []
        off = 0
        for i in range(n):
            for j in range(n):
                # reflection: wi on the opposite side of wo (mu_i = cos(-wi))
                if mu[i] * mu[j] < 0:
                    a0 = chans * INV_PI * abs(mu[i])
                    oal[i * n + j] = (off, 1)
                    coeffs.append(np.asarray(a0, dtype=np.float32).reshape(3, 1))
                    off += 3
        a = np.concatenate([c.reshape(-1) for c in coeffs]) if coeffs else np.zeros(0)
        return cls(1.0, mu, oal, a, m_max=1, n_channels=3)

    # -- device bundle --------------------------------------------------------

    def device_arrays(self):
        dense = self.a_dense
        if self.n_channels == 1:
            dense = np.repeat(dense, 3, axis=2)
        return {
            "mu": jnp.asarray(self.mu.astype(float_t)),
            "a": jnp.asarray(dense),  # [nMu, nMu, 3, M]
            "is_y_rb": self.n_channels == 3,
        }


# -- Catmull-Rom interpolation over the zenith knots -------------------------


def _cr_weights(knots, x):
    """4-point Catmull-Rom stencil (pbrt-v3 interpolation.cpp
    CatmullRomWeights), batched over x [N].

    Returns (offset [N] = i-1, possibly -1, and w [N,4]); weights for
    out-of-range stencil entries are exactly zero, so gathers may clamp
    the index.
    """
    n = knots.shape[0]
    x = jnp.clip(x, knots[0], knots[n - 1])
    i = jnp.clip(jnp.searchsorted(knots, x, side="right") - 1, 0, n - 2)
    x0 = knots[i]
    x1 = knots[i + 1]
    t = (x - x0) / jnp.maximum(x1 - x0, 1e-12)
    t2 = t * t
    t3 = t2 * t
    w1 = 2.0 * t3 - 3.0 * t2 + 1.0
    w2 = -2.0 * t3 + 3.0 * t2
    d0 = t3 - 2.0 * t2 + t
    d1 = t3 - t2
    has_m1 = i > 0
    has_p2 = i + 2 < n
    km1 = knots[jnp.maximum(i - 1, 0)]
    kp2 = knots[jnp.minimum(i + 2, n - 1)]
    w0a = d0 * (x1 - x0) / jnp.maximum(x1 - km1, 1e-12)
    w3a = d1 * (x1 - x0) / jnp.maximum(kp2 - x0, 1e-12)
    w0 = jnp.where(has_m1, -w0a, 0.0)
    w3 = jnp.where(has_p2, w3a, 0.0)
    w1 = w1 - jnp.where(has_m1, 0.0, d0) - jnp.where(has_p2, w3a, d1)
    w2 = w2 + jnp.where(has_m1, w0a, d0) + jnp.where(has_p2, 0.0, d1)
    return i - 1, jnp.stack([w0, w1, w2, w3], axis=-1)


def _gather_coeffs(tbl, mu_i, mu_o):
    """Weighted 4x4 gather of coefficient vectors -> ak [N,3,M]."""
    n = tbl["mu"].shape[0]
    bi, wi = _cr_weights(tbl["mu"], mu_i)
    bj, wj = _cr_weights(tbl["mu"], mu_o)
    a = tbl["a"]  # [nMu, nMu, 3, M]
    out = 0.0
    for r in range(4):
        for c in range(4):
            ii = jnp.clip(bi + r, 0, n - 1)
            jj = jnp.clip(bj + c, 0, n - 1)
            w = (wi[:, r] * wj[:, c])[:, None, None]
            out = out + w * a[ii, jj]
    return out


def fourier_f(tbl, wo, wi):
    """f(wo, wi) [N,3] from a device table bundle."""
    # pbrt convention: mu_i = cos(-wi), mu_o = cos(wo)
    mu_i = -wi[..., 2]
    mu_o = wo[..., 2]
    ak = _gather_coeffs(tbl, mu_i, mu_o)  # [N,3,M]
    # cos(delta phi) between -wi and wo azimuths: cos(phiO - phiI)
    si2 = jnp.maximum(1.0 - mu_i * mu_i, 0.0)
    so2 = jnp.maximum(1.0 - mu_o * mu_o, 0.0)
    denom = jnp.sqrt(jnp.maximum(si2 * so2, 1e-14))
    cos_dphi = ((-wi[..., 0]) * wo[..., 0] + (-wi[..., 1]) * wo[..., 1]) / denom
    cos_dphi = jnp.where(denom < 1e-7, 1.0, jnp.clip(cos_dphi, -1.0, 1.0))
    phi = jnp.arccos(cos_dphi)
    m = ak.shape[-1]
    ks = jnp.arange(m, dtype=wo.dtype)
    cosk = jnp.cos(ks[None, :] * phi[:, None])  # [N,M]
    vals = jnp.einsum("ncm,nm->nc", ak, cosk)
    y = jnp.maximum(vals[:, 0], 0.0)
    scale = 1.0 / jnp.maximum(jnp.abs(mu_i), 1e-6)
    if tbl["is_y_rb"]:
        r = jnp.maximum(vals[:, 1], 0.0)
        b = jnp.maximum(vals[:, 2], 0.0)
        g = jnp.maximum(1.39829 * y - 0.100913 * b - 0.297375 * r, 0.0)
        rgb = jnp.stack([r, g, b], axis=-1)
    else:
        rgb = y[:, None] * jnp.ones((1, 3), dtype=wo.dtype)
    return rgb * scale[:, None]


def fourier_pdf(wo, wi):
    """Two-sided cosine pdf matching fourier sampling (50/50 hemispheres)."""
    return 0.5 * jnp.abs(wi[..., 2]) * INV_PI


def fourier_sample_wi(wo, u_lobe, u2):
    """Cosine lobe on wo's side w.p. 1/2, else the opposite side."""
    from pbrt_tpu.core.sampling import cosine_sample_hemisphere

    wi = cosine_sample_hemisphere(u2)
    sign_o = jnp.sign(jnp.where(wo[..., 2] == 0.0, 1.0, wo[..., 2]))
    side = jnp.where(u_lobe < 0.5, sign_o, -sign_o)
    return wi * jnp.stack(
        [jnp.ones_like(side), jnp.ones_like(side), side], axis=-1
    )
