"""Sampler sequence quality tests (guards the radical-inverse overflow bug)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pbrt_tpu.core.lowdiscrepancy import PRIMES, radical_inverse
from pbrt_tpu.core.paramset import ParamSet
from pbrt_tpu.samplers import make_sampler


def test_radical_inverse_exact_small_bases():
    got = np.asarray(radical_inverse(1, jnp.arange(8, dtype=jnp.uint32)))
    want = [0, 1 / 3, 2 / 3, 1 / 9, 4 / 9, 7 / 9, 2 / 9, 5 / 9]
    np.testing.assert_allclose(got, want, atol=1e-6)
    got2 = np.asarray(radical_inverse(0, jnp.arange(8, dtype=jnp.uint32)))
    want2 = [0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875]
    np.testing.assert_allclose(got2, want2, atol=1e-7)


@pytest.mark.parametrize("dim", [0, 1, 2, 5, 12, 50, 100])
def test_radical_inverse_uniform_coverage(dim):
    """First 4096 points stratify [0,1) well (bases small vs N; huge bases
    legitimately cover only N/base of a cycle — the sampler's rotation
    handles those)."""
    n = 4096
    u = np.asarray(radical_inverse(dim, jnp.arange(n, dtype=jnp.uint32)))
    assert u.min() >= 0.0 and u.max() < 1.0
    counts = np.bincount((u * 16).astype(int), minlength=16)
    # each of 16 strata should hold roughly n/16 points
    assert counts.min() > n / 16 * 0.5, (dim, counts)
    assert counts.max() < n / 16 * 1.7, (dim, counts)


def _sampler(name, spp=16):
    ps = ParamSet()
    ps.add_int("pixelsamples", [spp])
    return make_sampler(name, ps)


@pytest.mark.parametrize("name", ["halton", "random", "sobol", "02sequence", "stratified"])
def test_sampler_uniform_per_dim(name):
    s = _sampler(name, 64)
    pix = jnp.asarray(np.tile([[7, 11]], (64, 1)).astype(np.int32))
    sidx = jnp.arange(64, dtype=jnp.uint32)
    for dim in (0, 1, 5, 12):
        u = np.asarray(s.get(pix, sidx, dim))
        assert u.min() >= 0.0 and u.max() < 1.0
        counts = np.bincount((u * 4).astype(int), minlength=4)
        assert counts.min() >= 4, (name, dim, counts)  # 64/4=16 expected


def test_sampler_decorrelated_across_pixels():
    s = _sampler("halton", 16)
    pix_a = jnp.asarray(np.tile([[0, 0]], (16, 1)).astype(np.int32))
    pix_b = jnp.asarray(np.tile([[1, 0]], (16, 1)).astype(np.int32))
    sidx = jnp.arange(16, dtype=jnp.uint32)
    ua = np.asarray(s.get(pix_a, sidx, 3))
    ub = np.asarray(s.get(pix_b, sidx, 3))
    assert not np.allclose(ua, ub)


def test_sampler_deterministic():
    s1 = _sampler("sobol", 8)
    s2 = _sampler("sobol", 8)
    pix = jnp.asarray(np.array([[3, 5]] * 8, dtype=np.int32))
    sidx = jnp.arange(8, dtype=jnp.uint32)
    np.testing.assert_array_equal(
        np.asarray(s1.get(pix, sidx, 9)), np.asarray(s2.get(pix, sidx, 9))
    )
