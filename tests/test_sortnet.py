"""Hierarchical bitonic co-sort (ops/sortnet.py) vs lax.sort/argsort.

The network is the production permutation primitive for sorted
wavefronts on TPU; on CPU ``co_sort`` falls back to ``lax.sort``, so
these tests force the network through Pallas interpret mode.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.ops.sortnet import co_sort


def _check(n, key_range, seed):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, key_range, n, dtype=np.uint32)
    a = rng.normal(size=n).astype(np.float32)
    lane = np.arange(n, dtype=np.int32)
    out = co_sort(
        (jnp.asarray(keys), jnp.asarray(a), jnp.asarray(lane)),
        interpret=True,
    )
    k_s, a_s, l_s = map(np.asarray, out)
    # ascending keys, multiset preserved
    assert (np.diff(k_s.astype(np.int64)) >= 0).all()
    assert (np.sort(keys) == k_s).all()
    # every payload element still paired with its own key (the network is
    # deterministic but NOT stable; ties may permute, pairing may not)
    assert (keys[l_s] == k_s).all()
    assert (a[l_s] == a_s).all()
    # permutation property
    assert len(np.unique(l_s)) == n


def test_pow2_high_entropy_keys():
    _check(1 << 15, 1 << 32, 0)


def test_non_pow2_with_duplicates():
    _check(50000, 1000, 1)


def test_top_bit_keys_order_unsigned():
    """Keys with the sign bit set (the dead-lane bit in the traversal
    keys) must sort as UNSIGNED ints."""
    rng = np.random.default_rng(2)
    n = 1 << 15
    keys = rng.integers(0, 1 << 32, n, dtype=np.uint32) | np.uint32(
        0x80000000
    ) * rng.integers(0, 2, n).astype(np.uint32)
    out = co_sort((jnp.asarray(keys),), interpret=True)
    k_s = np.asarray(out[0])
    assert (np.sort(keys) == k_s).all()


def test_cpu_fallback_matches_lax_sort():
    rng = np.random.default_rng(3)
    n = 4096  # below _MIN_N -> lax.sort path
    keys = rng.integers(0, 1 << 20, n, dtype=np.uint32)
    a = np.arange(n, dtype=np.int32)
    out = co_sort((jnp.asarray(keys), jnp.asarray(a)))
    k_s, a_s = map(np.asarray, out)
    order = np.argsort(keys, kind="stable")
    assert (k_s == keys[order]).all()


def test_wide_operand_split_consistent_permutation():
    """>22 total operands: XLA's TPU sort falls off its vectorized path
    (measured r5: 24 operands = >1000x slower).  co_sort splits such
    calls into (key, lane)-prefixed groups; the two-key prefix is unique
    per lane, so every group must apply the IDENTICAL permutation — i.e.
    the stable-sort permutation — even with heavy key duplication."""
    rng = np.random.default_rng(4)
    n = 50000
    keys = rng.integers(0, 64, n, dtype=np.uint32)  # heavy duplication
    cols = [rng.normal(size=n).astype(np.float32) for _ in range(31)]
    out = co_sort(
        (jnp.asarray(keys),) + tuple(jnp.asarray(c) for c in cols)
    )
    order = np.argsort(keys, kind="stable")
    assert (np.asarray(out[0]) == keys[order]).all()
    for c, got in zip(cols, out[1:]):
        assert (np.asarray(got) == c[order]).all()
