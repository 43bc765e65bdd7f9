"""PCG32 golden-value parity with the reference (rng.rs:126-176).

These vectors were copied into the reference from pbrt-v3 C++; they anchor
our host and device implementations to the same sequence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pbrt_tpu.core import rng as prng

GOLDEN_U32 = [
    355248013,
    41705475,
    3406281715,
    4186697710,
    483882979,
    2766312848,
    1713261421,
    154902030,
    3085534493,
    3877580365,
]

GOLDEN_THRESHOLD_4095 = [2668, 1995, 3385, 2470, 1399, 1118, 3511, 465, 1133, 295]

GOLDEN_FLOAT = [
    0.0827126,
    0.00971031,
    0.793087,
    0.974792,
    0.112663,
    0.644082,
    0.3989,
    0.0360659,
    0.718407,
    0.90282,
]


def test_default_sequence_matches_reference():
    r = prng.Rng()
    got = [r.uniform_u32() for _ in range(10)]
    assert got == GOLDEN_U32


def test_threshold_matches_reference():
    r = prng.Rng()
    got = [r.uniform_u32_threshold(4095) for _ in range(10)]
    assert got == GOLDEN_THRESHOLD_4095


def test_new_seeded_matches_reference():
    r = prng.Rng(0)
    assert r.uniform_u32() == 1774745655


def test_uniform_float_matches_reference():
    r = prng.Rng()
    got = [r.uniform_float() for _ in range(10)]
    np.testing.assert_allclose(got, GOLDEN_FLOAT, atol=1e-6)


def test_distance_zero():
    assert prng.Rng() - prng.Rng() == 0


@jax.jit
def _ten_default_steps():
    def body(carry, _):
        sh, sl = carry
        sh, sl, o = prng.pcg32_step(
            sh, sl, jnp.uint32(0xDA3E39CB), jnp.uint32(0x94B95BDB)
        )
        return (sh, sl), o

    init = (jnp.uint32(0x853C49E6), jnp.uint32(0x748FEA9B))
    _, outs = jax.lax.scan(body, init, None, length=10)
    return outs


def test_device_pcg32_matches_host_default_stream():
    """Device uint32-pair PCG32 reproduces the host/default golden outputs."""
    assert [int(o) for o in _ten_default_steps()] == GOLDEN_U32


@jax.jit
def _first_output_for_seqs(seq_hi, seq_lo):
    sh, sl, ih, il = prng.pcg32_init(seq_hi, seq_lo)
    _, _, out = prng.pcg32_step(sh, sl, ih, il)
    return out


def test_device_pcg32_init_matches_host_set_sequence():
    seqs = [0, 1, 7, 123456, 2**40 + 17]
    hi = jnp.array([(s >> 32) & 0xFFFFFFFF for s in seqs], dtype=jnp.uint32)
    lo = jnp.array([s & 0xFFFFFFFF for s in seqs], dtype=jnp.uint32)
    out = np.asarray(_first_output_for_seqs(hi, lo))
    host = [prng.Rng(s).uniform_u32() for s in seqs]
    assert out.tolist() == host


def test_device_pcg32_vectorized():
    seqs = jnp.arange(64, dtype=jnp.uint32)
    out = np.asarray(_first_output_for_seqs(jnp.zeros_like(seqs), seqs))
    host = [prng.Rng(int(s)).uniform_u32() for s in range(64)]
    assert out.tolist() == host


def test_u32_to_float_range():
    bits = jnp.array([0, 1, 2**31, 2**32 - 1], dtype=jnp.uint32)
    f = prng.u32_to_float(bits)
    assert float(f[0]) == 0.0
    assert float(f[-1]) < 1.0
    assert (np.asarray(f) >= 0.0).all()


def test_hashes_are_deterministic_and_spread():
    a = prng.hash_u32(jnp.arange(1024, dtype=jnp.uint32))
    b = prng.hash_u32(jnp.arange(1024, dtype=jnp.uint32))
    assert (np.asarray(a) == np.asarray(b)).all()
    # no trivial collisions over a small domain
    assert len(np.unique(np.asarray(a))) == 1024
