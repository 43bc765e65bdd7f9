"""Float-as-double mode (reference cargo feature, lib.rs:24-44): the math
core must work at f64 width via PBRT_TPU_DOUBLE=1."""

import os
import subprocess
import sys

import pytest


def test_double_mode_math_core():
    code = """
import numpy as np
import pbrt_tpu
assert pbrt_tpu.float_t == np.float64, pbrt_tpu.float_t
from pbrt_tpu.core.rng import Rng
r = Rng()
assert r.uniform_u32() == 355248013  # golden value, width-independent
from pbrt_tpu.core import spectrum as spec
xyz = spec.rgb_to_xyz(np.array([1.0, 0.0, 0.0]))
assert xyz.dtype == np.float64
np.testing.assert_allclose(xyz, [0.412453, 0.212671, 0.019334], atol=1e-9)
from pbrt_tpu import quadratic
assert quadratic(1.0, -6.0, -16.0) == (-2.0, 8.0)
from pbrt_tpu.core.film import Film
from pbrt_tpu.core.filters import BoxFilter
f = Film((1920, 1080), ((0.25, 0.25), (0.75, 0.75)), BoxFilter((8.0, 8.0)))
b = f.get_sample_bounds()
assert b.p_min == (472, 262) and b.p_max == (1448, 818)
print("DOUBLE-OK")
"""
    env = dict(os.environ)
    env["PBRT_TPU_DOUBLE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/root/repo",
    )
    assert "DOUBLE-OK" in out.stdout, out.stdout + out.stderr
