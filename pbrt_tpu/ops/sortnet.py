"""Hierarchical bitonic multi-operand co-sort (Pallas + XLA butterflies).

Why: the sorted-carry wavefront pays ~11 ms per `lax.sort` co-sort at
262k lanes x ~22 operands — ~12 sorts per config-3 frame is ~40% of the
frame (r5 depth sweep).  XLA's sort runs every one of the ~171 bitonic
stages at full HBM traffic (measured 11 ms ~= 171 x 46 MB / 800 GB/s);
but all stages with exchange distance < BLK can run back-to-back on a
VMEM-resident block.  This module fuses them:

  * ONE Pallas call locally bitonic-sorts every BLK-lane block (the
    k <= BLK prefix of the network: 66 stages for BLK = 2048) — data
    stays in VMEM, traffic is one read + one write;
  * for each merge level k > BLK: the j >= BLK butterfly passes run as
    plain XLA (28 full-traffic passes total vs XLA-sort's 171), then one
    Pallas call fuses the j < BLK tail (11 stages) per block.

Exchanges use the XOR-butterfly formulation (partner = i ^ j): inside a
[16,128] block a distance-j butterfly is two `pltpu.roll`s + an iota-bit
select (the roll's circular wrap is never selected — adding j to an
index whose j-bit is clear cannot carry past the axis), and in XLA it is
a reshape [-1, 2, j] half-swap.  Keys are uint32; lanes compare them as
int32 after a sign-bit flip (an order-preserving bijection).

Not stable (bitonic networks reorder equal keys); deterministic.  The
wavefront consumers never relied on stability — equal-key lanes are
interchangeable rays — and every equality test sorts both sides with
the same network.  Drop-in: :func:`co_sort` mirrors the
``jax.lax.sort(operands, num_keys=1)`` calling convention and falls
back to ``lax.sort`` for small N; opt-in via PBRT_TPU_BITONIC=1
(the network is correct on-chip but has not yet beaten lax.sort
end-to-end — see RESULTS r5).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lanes per locally-sorted block.  Measured end-to-end (config 3, r5):
# BLK=2048 -> 407 ms/frame, BLK=1024 -> 445 ms, lax.sort -> 297 ms — the
# roll+select cost per fused stage x ~23 operands exceeds what the
# VMEM-residency saves on this chip, so the network stays opt-in
BLK = 2048
_SUB = BLK // 128  # sublane rows per block
_MIN_N = 1 << 15  # below this lax.sort wins (fewer stages, no padding)

# XLA TPU sort operand cap: 22 total operands ran at 0.52 ms / 262k
# lanes on v5e; 24 operands fell off the vectorized path and did not
# finish ONE execution in 12 minutes (measured r5).  co_sort splits
# wider calls into (key, lane)-prefixed groups under this cap.
_XLA_SORT_MAX_OPS = 22

_SIGN = np.int32(-0x80000000)


def _key_cmp_form(k):
    """uint32 key -> int32 with the same order (flip the sign bit)."""
    return jax.lax.bitcast_convert_type(k, jnp.int32) ^ _SIGN


def _butterfly_block(x, j):
    """x[i] -> x[i ^ j] within a [16,128] block (j a power of two < BLK)."""
    if j < 128:
        lo = pltpu.roll(x, 128 - j, axis=1)  # x[c + j] (roll wants shift >= 0)
        hi = pltpu.roll(x, j, axis=1)  # x[c - j]
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where((lane & j) == 0, lo, hi)
    js = j // 128
    lo = pltpu.roll(x, _SUB - js, axis=0)
    hi = pltpu.roll(x, js, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where((row & js) == 0, lo, hi)


def _stage_block(key, cols, j, want_min):
    """One compare-exchange stage on VMEM-resident [16,128] operands.
    ``want_min`` bool [16,128]: lane keeps min(self, partner).  The take
    mask is logical-op form — Mosaic cannot lower a select between i1
    vectors ("unsupported target bitwidth for truncation")."""
    kp = _butterfly_block(key, j)
    take = (want_min & (kp < key)) | (~want_min & (kp > key))
    key = jnp.where(take, kp, key)
    cols = [jnp.where(take, _butterfly_block(x, j), x) for x in cols]
    return key, cols


def _local_kernel(*refs, n_cols: int, k_list, blk_log2: int):
    """Fused local stages.  k_list: merge sizes to run; for k <= BLK the
    direction comes from the lane index, for k > BLK from the block id
    (constant per block).  Runs j = min(k, BLK)/2 .. 1 for each k."""
    ins = refs[: n_cols + 1]
    outs = refs[n_cols + 1:]
    key = _key_cmp_form(ins[0][...])
    cols = [r[...] for r in ins[1:]]
    sub = jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
    i_local = sub * 128 + lane
    blk = pl.program_id(0)
    for k in k_list:
        if k < BLK:
            dir_asc = (i_local & k) == 0
            j0 = k >> 1
        else:
            # the k-bit of the GLOBAL index lives in the block id for
            # k >= BLK (for k == BLK it is exactly block-id bit 0)
            gbit = (blk & (k >> blk_log2)) == 0  # scalar per block
            dir_asc = jnp.full(key.shape, True) & gbit
            j0 = (k >> 1) if k <= BLK else (BLK >> 1)
        j = j0
        while j >= 1:
            lower = (i_local & j) == 0
            want_min = ~(dir_asc ^ lower)  # == without an i1 cmp/select
            key, cols = _stage_block(key, cols, j, want_min)
            j >>= 1
    outs[0][...] = jax.lax.bitcast_convert_type(key ^ _SIGN, jnp.uint32)
    for r, x in zip(outs[1:], cols):
        r[...] = x


def _run_local(key, cols, k_list, interpret=False):
    n = key.shape[0]
    g = n // BLK
    n_cols = len(cols)
    spec = pl.BlockSpec((_SUB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shaped = [key.reshape(g * _SUB, 128)] + [
        x.reshape(g * _SUB, 128) for x in cols
    ]
    out_shape = [jax.ShapeDtypeStruct(s.shape, s.dtype) for s in shaped]
    kernel = functools.partial(
        _local_kernel, n_cols=n_cols, k_list=tuple(k_list),
        blk_log2=BLK.bit_length() - 1,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[spec] * (n_cols + 1),
        out_specs=tuple([spec] * (n_cols + 1)),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*shaped)
    return outs[0].reshape(n), [o.reshape(n) for o in outs[1:]]


def _global_pass(key, cols, k, j):
    """One XLA butterfly pass at distance j (>= BLK) for merge size k."""
    n = key.shape[0]

    def bfly(x):
        return x.reshape(-1, 2, j)[:, ::-1, :].reshape(n)

    i = jax.lax.iota(jnp.int32, n)
    want_min = ((i & k) == 0) == ((i & j) == 0)
    ks = _key_cmp_form(key)
    kp = bfly(ks)
    take = jnp.where(want_min, kp < ks, kp > ks)
    key = jax.lax.bitcast_convert_type(
        jnp.where(take, kp, ks) ^ _SIGN, jnp.uint32
    )
    cols = [jnp.where(take, bfly(x), x) for x in cols]
    return key, cols


def co_sort(operands, num_keys=1, interpret=False):
    """``jax.lax.sort`` drop-in for ONE uint32 key + payload columns.

    operands[0]: uint32 keys [N]; operands[1:]: payload [N] (f32/i32/u32).
    Returns the co-sorted tuple, ascending by key.  Falls back to
    ``lax.sort`` for small N, multi-key calls, or PBRT_TPU_BITONIC=0.
    """
    key = operands[0]
    n = key.shape[0]
    # XLA's TPU sort falls off its vectorized path somewhere between 22
    # and 24 total operands (measured r5 on v5e: 22 ops = 0.52 ms at
    # 262k lanes; 24 ops did not finish a single execution in 12 MINUTES
    # — a silent >1000x cliff, originally hit by the merged shadow+carry
    # experiment).  Above the cap, split the payload into groups and run
    # one sort per group with (key, lane) as a two-key prefix: the pair
    # is unique per lane, so every group applies the IDENTICAL
    # permutation regardless of sort stability.
    if num_keys == 1 and len(operands) > _XLA_SORT_MAX_OPS:
        lane32 = jnp.arange(n, dtype=jnp.int32)
        group = _XLA_SORT_MAX_OPS - 2  # (key, lane) ride every call
        cols = list(operands[1:])
        key_s = lane_s = None
        outs = []
        for s in range(0, len(cols), group):
            part = jax.lax.sort(
                (key, lane32) + tuple(cols[s:s + group]), num_keys=2
            )
            key_s, lane_s = part[0], part[1]
            outs.extend(part[2:])
        return (key_s,) + tuple(outs)
    use = (
        num_keys == 1
        and key.dtype == jnp.uint32
        and n >= _MIN_N
        and os.environ.get("PBRT_TPU_BITONIC", "0") not in ("", "0")
        and (interpret or jax.default_backend() not in ("cpu",))
    )
    if not use:
        return jax.lax.sort(operands, num_keys=num_keys)
    cols = list(operands[1:])
    n_pad = 1 << max(int(np.ceil(np.log2(n))), BLK.bit_length() - 1)
    pad = n_pad - n
    if pad:
        key = jnp.concatenate([key, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)])
        cols = [
            jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]) for x in cols
        ]

    # phase 1: full local sort of every block (k = 2 .. BLK)
    k_list = []
    k = 2
    while k <= min(BLK, n_pad):
        k_list.append(k)
        k *= 2
    key, cols = _run_local(key, cols, k_list, interpret)

    # phase 2: merge levels k = 2*BLK .. n_pad
    k = BLK * 2
    while k <= n_pad:
        j = k >> 1
        while j >= BLK:
            key, cols = _global_pass(key, cols, k, j)
            j >>= 1
        # fused j < BLK tail
        key, cols = _run_local(key, cols, [k], interpret)
        k *= 2

    if pad:
        key = key[:n]
        cols = [x[:n] for x in cols]
    return tuple([key] + cols)
