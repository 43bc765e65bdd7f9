"""ParamSet construction helpers for tests.

Equivalent of the reference's code-generated ``paramset::testutils``
(scripts/generate_testutils.py -> src/core/paramset/testutils.rs): one
``make_<type>`` / ``make_<type>_param_set`` pair per value kind, public so
downstream comparison tools can reuse them.
"""

from __future__ import annotations

from pbrt_tpu.core.paramset import ParamSet


def _make(adder_name, name, values):
    ps = ParamSet()
    getattr(ps, adder_name)(name, values)
    return ps


def make_bool_param_set(name, values):
    return _make("add_bool", name, values)


def make_float_param_set(name, values):
    return _make("add_float", name, values)


def make_int_param_set(name, values):
    return _make("add_int", name, values)


def make_point2f_param_set(name, values):
    return _make("add_point2f", name, values)


def make_vector2f_param_set(name, values):
    return _make("add_vector2f", name, values)


def make_point3f_param_set(name, values):
    return _make("add_point3f", name, values)


def make_vector3f_param_set(name, values):
    return _make("add_vector3f", name, values)


def make_normal3f_param_set(name, values):
    return _make("add_normal3f", name, values)


def make_string_param_set(name, values):
    return _make("add_string", name, values)


def make_texture_param_set(name, value):
    return _make("add_texture", name, value)


def make_rgb_spectrum_param_set(name, values):
    return _make("add_rgb_spectrum", name, values)


class MockAPI:
    """Records every API callback; parser tests decouple from the renderer
    exactly like the reference's MockAPI (api_test.rs:29-174)."""

    def __init__(self):
        self.calls = []

    def __getattr__(self, name):
        def record(*args):
            self.calls.append((name, args))

        return record
