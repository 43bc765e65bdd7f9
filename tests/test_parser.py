"""Tokenizer/parser tests mirroring parser.rs:756-881 plus full-directive
coverage the reference lacks."""

import numpy as np
import pytest

from pbrt_tpu.core import parser as P
from pbrt_tpu.core.paramset import ParamSet


class MockAPI:
    """Records every callback (analogue of api_test.rs MockAPI)."""

    def __init__(self):
        self.calls = []

    def __getattr__(self, name):
        def record(*args):
            self.calls.append((name, args))

        return record


def toks(s):
    return list(P.create_from_string(s))


def test_tokenizer_basic():
    t = toks('Sampler "halton" "integer pixelsamples" 128')
    assert t == ["Sampler", '"halton"', '"integer pixelsamples"', "128"]


def test_tokenizer_unterminated():
    with pytest.raises(P.ParseError):
        toks('Sampler "128')


def test_tokenizer_comments_and_brackets():
    t = toks("LookAt 1 2 3 # eye\n[ 4 5 ]")
    assert t[:4] == ["LookAt", "1", "2", "3"]
    assert t[4].startswith("#")
    assert t[5:] == ["[", "4", "5", "]"]


def test_tokenizer_escapes():
    t = toks(r'"a\"b" "c\nd"')
    assert t == ['"a"b"', '"c\nd"']


def test_parse_sampler():
    api = MockAPI()
    P.parse(P.create_from_string('Sampler "halton" "integer pixelsamples" 128'), api)
    (name, args), = [(n, a) for n, a in api.calls if n == "sampler"]
    assert args[0] == "halton"
    assert args[1].find_one_int("pixelsamples", 0) == 128


def test_param_list_cases():
    """The three table-driven cases from parser.rs:803-880."""
    api = MockAPI()
    P.parse(P.create_from_string('Camera "perspective" "float fov" 45'), api)
    name, (cam_name, ps) = api.calls[0][0], api.calls[0][1]
    assert cam_name == "perspective"
    assert ps.find_one_float("fov", 0.0) == 45.0

    api = MockAPI()
    P.parse(
        P.create_from_string(
            'Shape "trianglemesh" "integer indices" [ 0 1 2 2 3 0 ] '
            '"point P" [-0.5 -0.5 0.5 -0.5 -0.5 -0.5 0.5 -0.5 -0.5 0.5 -0.5 0.5]'
        ),
        api,
    )
    _, (shape_name, ps) = api.calls[0]
    assert shape_name == "trianglemesh"
    assert ps.find_int("indices") == [0, 1, 2, 2, 3, 0]
    pts = ps.find_point3f("P")
    assert pts.shape == (4, 3)
    np.testing.assert_allclose(pts[0], [-0.5, -0.5, 0.5])

    api = MockAPI()
    P.parse(
        P.create_from_string(
            'Texture "t" "spectrum" "imagemap"\n'
            '    "string filename" ["textures/BeoCom.png"]\n'
            '    "float scale" [1.000000]\n'
            '    "vector v1" [0.500000 0.000000 0.000000]\n'
        ),
        api,
    )
    _, (name, kind, texname, ps) = api.calls[0]
    assert (name, kind, texname) == ("t", "spectrum", "imagemap")
    assert ps.find_string("filename") == ["textures/BeoCom.png"]
    assert ps.find_one_float("scale", 0.0) == 1.0
    np.testing.assert_allclose(ps.find_one_vector3f("v1", np.zeros(3)), [0.5, 0, 0])


def test_mixed_parameters_error():
    api = MockAPI()
    with pytest.raises(P.ParseError):
        P.parse(
            P.create_from_string('Camera "perspective" "float fov" [1 "two"]'), api
        )


def test_syntax_error():
    with pytest.raises(P.ParseError):
        P.parse(P.create_from_string("Bogus 1 2 3"), MockAPI())


def test_all_transform_directives():
    api = MockAPI()
    P.parse(
        P.create_from_string(
            """
            Identity
            Translate 1 2 3
            Scale 2 2 2
            Rotate 45 0 0 1
            LookAt 0 0 -5 0 0 0 0 1 0
            ConcatTransform [1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1]
            Transform [1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1]
            CoordinateSystem "cs"
            CoordSysTransform "cs"
            ActiveTransform All
            ActiveTransform StartTime
            ActiveTransform EndTime
            TransformTimes 0 1
            """
        ),
        api,
    )
    names = [n for n, _ in api.calls]
    assert names == [
        "identity",
        "translate",
        "scale",
        "rotate",
        "look_at",
        "concat_transform",
        "transform",
        "coordinate_system",
        "coordinate_system_transform",
        "active_transform_all",
        "active_transform_start_time",
        "active_transform_end_time",
        "transform_times",
    ]


def test_world_directives():
    api = MockAPI()
    P.parse(
        P.create_from_string(
            """
            WorldBegin
            AttributeBegin
            Material "matte" "rgb Kd" [.5 .5 .5]
            AreaLightSource "diffuse" "rgb L" [1 1 1]
            ReverseOrientation
            Shape "sphere" "float radius" 1
            AttributeEnd
            ObjectBegin "tree"
            Shape "sphere"
            ObjectEnd
            ObjectInstance "tree"
            MediumInterface "inside" "outside"
            WorldEnd
            """
        ),
        api,
    )
    names = [n for n, _ in api.calls]
    assert names == [
        "world_begin",
        "attribute_begin",
        "material",
        "area_light_source",
        "reverse_orientation",
        "shape",
        "attribute_end",
        "object_begin",
        "shape",
        "object_end",
        "object_instance",
        "medium_interface",
        "world_end",
    ]


def test_include(tmp_path):
    inc = tmp_path / "inc.pbrt"
    inc.write_text('Sampler "halton" "integer pixelsamples" 4')
    main = tmp_path / "main.pbrt"
    main.write_text(f'Include "inc.pbrt"\nCamera "perspective"')
    api = MockAPI()
    P.parse_file(main, api)
    names = [n for n, _ in api.calls]
    assert names == ["sampler", "camera"]


def test_blackbody_param():
    api = MockAPI()
    P.parse(
        P.create_from_string('LightSource "distant" "blackbody L" [3000 1.5]'), api
    )
    _, (name, ps) = api.calls[0]
    rgb = ps.find_one_spectrum("L", np.zeros(3))
    assert rgb[0] > rgb[2]  # warm


def test_spectrum_numeric_param():
    api = MockAPI()
    P.parse(
        P.create_from_string(
            'LightSource "x" "spectrum L" [400 0.5 500 1.0 600 0.5 700 0.2]'
        ),
        api,
    )
    _, (_, ps) = api.calls[0]
    rgb = ps.find_one_spectrum("L", np.zeros(3))
    assert rgb.shape == (3,)


def test_correctly_spelled_attribute_begin():
    """The reference only parses the misspelled 'AttrbuteBegin'
    (parser.rs:233); we must accept the correct spelling."""
    api = MockAPI()
    P.parse(P.create_from_string("AttributeBegin"), api)
    assert api.calls == [("attribute_begin", ())]
