"""Checkpoint / resume for long renders (SURVEY.md §5: absent in the
reference; required for preemptible multi-host runs).

A checkpoint is the film accumulation state plus the sweep cursor
(next lane chunk index).  Because samplers are pure functions of
(pixel, sample, dim), resuming mid-frame is exact: re-rendering continues
with the same sample values the interrupted run would have produced.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np


def save_checkpoint(path, film_state, cursor: int, meta: dict | None = None) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp.npz")
    np.savez_compressed(
        tmp,
        xyz=np.asarray(film_state["xyz"]),
        weight=np.asarray(film_state["weight"]),
        splat_xyz=np.asarray(film_state["splat_xyz"]),
        cursor=np.int64(cursor),
        meta=json.dumps(meta or {}),
    )
    os.replace(tmp, path)


def load_checkpoint(path):
    """Returns (film_state, cursor, meta) or None if absent/corrupt."""
    import jax.numpy as jnp

    path = Path(path)
    if not path.exists():
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            state = {
                "xyz": jnp.asarray(z["xyz"]),
                "weight": jnp.asarray(z["weight"]),
                "splat_xyz": jnp.asarray(z["splat_xyz"]),
            }
            cursor = int(z["cursor"])
            meta = json.loads(str(z["meta"]))
        return state, cursor, meta
    except (OSError, ValueError, KeyError):
        return None
