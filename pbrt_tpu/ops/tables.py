"""TPU-friendly small-table reads (shared by builder, lights, sampling).

XLA lowers gathers from small tables to serialized dynamic-slices on
TPU, which measured ~20ms per bounce on a 262k-lane wavefront vs <2ms
for a one-hot matmul; the matmul in turn pads K to 128 and runs 6-pass
f32 emulation, so for tiny tables (a Cornell box: 14 rows) a fused
where-chain wins again (~2.5x, measured on v5e).  Thresholds below pick
the regime per table size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

WHERE_CHAIN_MAX_ROWS = 48
ONE_HOT_MAX_ROWS = 1024


def select_rows(cols, idx):
    """Row-select ``cols[idx]`` ([T, C], [N] -> [N, C]), TPU-friendly.

    Tiny tables: fused where-chain (exact, no MXU padding waste).
    Small tables: one-hot x matmul (HIGHEST precision — f32-accurate).
    Large tables: real gather (the BVH regime, where prim ids are
    already sorted/coherent).
    """
    t = cols.shape[0]
    if t <= WHERE_CHAIN_MAX_ROWS:
        out = jnp.broadcast_to(cols[0][None, :], (idx.shape[0], cols.shape[1]))
        for k in range(1, t):
            out = jnp.where((idx == k)[:, None], cols[k][None, :], out)
        return out
    if t <= ONE_HOT_MAX_ROWS and cols.dtype == jnp.float32:
        oh = (
            idx[:, None] == jnp.arange(t, dtype=idx.dtype)[None, :]
        ).astype(cols.dtype)
        return jax.lax.dot(oh, cols, precision=jax.lax.Precision.HIGHEST)
    return cols[idx]


def select_values(vals, idx):
    """1-D variant: ``vals[idx]`` ([T], [N] -> [N]) via where-chain /
    one-hot, same thresholds as :func:`select_rows`."""
    t = vals.shape[0]
    if t <= WHERE_CHAIN_MAX_ROWS:
        out = jnp.broadcast_to(vals[0], idx.shape)
        for k in range(1, t):
            out = jnp.where(idx == k, vals[k], out)
        return out
    if t <= ONE_HOT_MAX_ROWS and vals.dtype == jnp.float32:
        oh = (
            idx[:, None] == jnp.arange(t, dtype=idx.dtype)[None, :]
        ).astype(vals.dtype)
        return jax.lax.dot(oh, vals[:, None],
                           precision=jax.lax.Precision.HIGHEST)[:, 0]
    return vals[idx]
