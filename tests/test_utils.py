"""Aux subsystems (SURVEY.md §5): checkpoint/resume and stats."""

import numpy as np

import jax.numpy as jnp

from pbrt_tpu.utils import checkpoint as ckpt
from pbrt_tpu.utils import stats


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "xyz": jnp.ones((4, 4, 3)) * 2.5,
        "weight": jnp.ones((4, 4)),
        "splat_xyz": jnp.zeros((4, 4, 3)),
    }
    path = tmp_path / "film.ckpt.npz"
    ckpt.save_checkpoint(path, state, cursor=7, meta={"spp": 16})
    loaded = ckpt.load_checkpoint(path)
    assert loaded is not None
    state2, cursor, meta = loaded
    assert cursor == 7
    assert meta == {"spp": 16}
    np.testing.assert_array_equal(np.asarray(state2["xyz"]), np.asarray(state["xyz"]))


def test_checkpoint_missing_and_corrupt(tmp_path):
    assert ckpt.load_checkpoint(tmp_path / "nope.npz") is None
    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not a zip")
    assert ckpt.load_checkpoint(bad) is None


def test_stats_counters_and_timers():
    stats.reset()
    stats.count("rays/primary", 100)
    stats.count("rays/primary", 50)
    with stats.timed("phase/intersect"):
        pass
    snap = stats.snapshot()
    assert snap["counters"]["rays/primary"] == 150
    assert "phase/intersect" in snap["timers"]
    text = stats.report()
    assert "rays/primary" in text
    stats.reset()
    assert stats.snapshot()["counters"] == {}
