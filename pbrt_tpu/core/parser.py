"""pbrt scene-file tokenizer and recursive-descent parser.

Byte-level tokenizer with the reference's exact token rules
(/root/reference/src/core/parser.rs:66-148): whitespace separation, quoted
strings (escape sequences *are* decoded here — the reference leaves them
``unimplemented!()``, parser.rs:96-110), single-char ``[`` ``]`` tokens, and
``#`` comments to end of line.

The parser implements the FULL pbrt-v3 directive set — the reference returns
``NotImplemented`` for 25 of the 36 directives (parser.rs:227-310) and only
recognizes the misspelled ``AttrbuteBegin`` (parser.rs:233); we implement the
correctly spelled directive and do not inherit the typo (SURVEY.md §7 "do not
inherit the bugs").

Typed parameter declarations ("float fov" etc.) follow parser.rs:433-502,
including aliases point=point3, vector=vector3, color=rgb.
"""

from __future__ import annotations

import logging
from typing import Callable, List, Optional

from pbrt_tpu.core.fileutil import directory_containing, resolve_filename, set_search_directory
from pbrt_tpu.core.paramset import ParamSet

log = logging.getLogger("pbrt_tpu")


class ParseError(ValueError):
    """Tokenization/parse errors (parser.rs:32-58)."""


class Tokenizer:
    """Iterator over scene-file tokens (parser.rs:61-170)."""

    __slots__ = ("data", "pos", "filename")

    def __init__(self, data: bytes, filename: str = "<string>"):
        self.data = data
        self.pos = 0
        self.filename = filename

    def __iter__(self):
        return self

    def _get(self) -> Optional[int]:
        if self.pos == len(self.data):
            return None
        b = self.data[self.pos]
        self.pos += 1
        return b

    def _unget(self) -> None:
        self.pos -= 1

    def __next__(self) -> str:
        while True:
            token_start = self.pos
            b = self._get()
            if b is None:
                raise StopIteration
            if b in (0x20, 0x0A, 0x09, 0x0D):  # space \n \t \r
                continue
            if b == 0x22:  # '"'
                have_escaped = False
                while True:
                    c = self._get()
                    if c is None:
                        raise ParseError(f"{self.filename}: premature EOF in string")
                    if c == 0x22:
                        break
                    if c == 0x0A:
                        raise ParseError(f"{self.filename}: unterminated string")
                    if c == 0x5C:  # backslash
                        have_escaped = True
                        if self._get() is None:
                            raise ParseError(f"{self.filename}: premature EOF in string")
                raw = self.data[token_start : self.pos]
                if not have_escaped:
                    return raw.decode("utf-8")
                return self._decode_escaped(raw)
            if b in (0x5B, 0x5D):  # [ ]
                return self.data[token_start : self.pos].decode("utf-8")
            if b == 0x23:  # '#': comment token to end of line
                while True:
                    c = self._get()
                    if c is None:
                        break
                    if c in (0x0A, 0x0D):
                        self._unget()
                        break
                return self.data[token_start : self.pos].decode("utf-8")
            # regular token
            while True:
                c = self._get()
                if c is None:
                    break
                if c in (0x20, 0x0A, 0x09, 0x0D, 0x22, 0x5B, 0x5D):
                    self._unget()
                    break
            return self.data[token_start : self.pos].decode("utf-8")

    @staticmethod
    def _decode_escaped(raw: bytes) -> str:
        out = bytearray()
        i = 0
        escapes = {
            ord("b"): 8, ord("f"): 12, ord("n"): 10, ord("r"): 13,
            ord("t"): 9, ord("\\"): 92, ord("'"): 39, ord('"'): 34,
        }
        while i < len(raw):
            c = raw[i]
            if c == 0x5C and i + 1 < len(raw):
                nxt = raw[i + 1]
                out.append(escapes.get(nxt, nxt))
                i += 2
            else:
                out.append(c)
                i += 1
        return out.decode("utf-8")


def create_from_string(data, filename: str = "<string>") -> Tokenizer:
    if isinstance(data, str):
        data = data.encode("utf-8")
    return Tokenizer(data, filename)


def create_from_file(path) -> Tokenizer:
    with open(path, "rb") as f:
        return Tokenizer(f.read(), str(path))


def _is_quoted(s: str) -> bool:
    return len(s) >= 2 and s.startswith('"') and s.endswith('"')


def _dequote(s: str) -> str:
    if not _is_quoted(s):
        raise ParseError(f"expected quoted string, got '{s}'")
    return s[1:-1]


# Parameter type decoding (parser.rs:450-475)
_PARAM_TYPES = {
    "float": "float",
    "integer": "int",
    "bool": "bool",
    "point2": "point2",
    "vector2": "vector2",
    "point3": "point3",
    "vector3": "vector3",
    "point": "point3",
    "vector": "vector3",
    "normal": "normal",
    "string": "string",
    "texture": "texture",
    "color": "rgb",
    "rgb": "rgb",
    "xyz": "xyz",
    "blackbody": "blackbody",
    "spectrum": "spectrum",
}


def _add_param(ps: ParamSet, decl: str, doubles: List[float], strings: List[str]) -> None:
    """Decode "type name" declaration and add values (parser.rs:504-738)."""
    decl_stripped = decl.strip()
    if not decl_stripped:
        log.error("Parameter '%s' doesn't have a type declaration?!", decl)
        return
    parts = decl_stripped.split(None, 1)
    if len(parts) != 2:
        log.error("Parameter '%s' missing space before name", decl)
        return
    type_str, name = parts[0], parts[1].strip()
    p_type = _PARAM_TYPES.get(type_str)
    if p_type is None:
        log.error("Unable to decode type from '%s'", decl)
        return
    if not name:
        log.error("Unable to find parameter name from '%s'", decl)
        return

    n_items = len(doubles) + len(strings)
    if p_type in ("texture", "string", "bool"):
        if not strings:
            log.error(
                "Expected string parameter value for parameter '%s' with type '%s'. Ignoring.",
                name, p_type,
            )
            return
    elif p_type != "spectrum":
        if strings:
            log.error(
                "Expected numeric parameter value for parameter '%s' with type '%s'. Ignoring.",
                name, p_type,
            )
            return

    def chunk_warn(mod: int, what: str):
        if n_items % mod != 0:
            log.warning(
                "Excess values given with %s parameter '%s'. Ignoring last %d of them.",
                what, decl, n_items % mod,
            )

    if p_type == "int":
        ps.add_int(name, [int(d) for d in doubles])
    elif p_type == "bool":
        vals = []
        for s in strings:
            if s == "true":
                vals.append(True)
            elif s == "false":
                vals.append(False)
            else:
                log.warning(
                    "Value '%s' unknown for Boolean parameter '%s'. Using 'false'.", s, decl
                )
                vals.append(False)
        ps.add_bool(name, vals)
    elif p_type == "float":
        ps.add_float(name, doubles)
    elif p_type == "point2":
        chunk_warn(2, "point2")
        n = len(doubles) - len(doubles) % 2
        ps.add_point2f(name, doubles[:n])
    elif p_type == "vector2":
        chunk_warn(2, "vector2")
        n = len(doubles) - len(doubles) % 2
        ps.add_vector2f(name, doubles[:n])
    elif p_type == "point3":
        chunk_warn(3, "point3")
        n = len(doubles) - len(doubles) % 3
        ps.add_point3f(name, doubles[:n])
    elif p_type == "vector3":
        chunk_warn(3, "vector3")
        n = len(doubles) - len(doubles) % 3
        ps.add_vector3f(name, doubles[:n])
    elif p_type == "normal":
        chunk_warn(3, "normal")
        n = len(doubles) - len(doubles) % 3
        ps.add_normal3f(name, doubles[:n])
    elif p_type == "rgb":
        chunk_warn(3, "rgb")
        n = len(doubles) - len(doubles) % 3
        ps.add_rgb_spectrum(name, doubles[:n])
    elif p_type == "xyz":
        chunk_warn(3, "xyz")
        n = len(doubles) - len(doubles) % 3
        ps.add_xyz_spectrum(name, doubles[:n])
    elif p_type == "blackbody":
        chunk_warn(2, "blackbody")
        n = len(doubles) - len(doubles) % 2
        ps.add_blackbody(name, doubles[:n])
    elif p_type == "spectrum":
        if strings:
            ps.add_sampled_spectrum_files(name, strings)
        else:
            chunk_warn(2, "spectrum")
            n = len(doubles) - len(doubles) % 2
            ps.add_sampled_spectrum(name, doubles[:n])
    elif p_type == "string":
        ps.add_string(name, strings)
    elif p_type == "texture":
        if n_items == 1:
            ps.add_texture(name, strings[0])
        else:
            log.error("Only one string allowed for 'texture' parameter '%s'", name)


class Parser:
    """Recursive-descent parser with one-token pushback and a file stack for
    ``Include`` (parser.rs:205-317, completed to the full directive set)."""

    def __init__(self, tokenizer: Tokenizer):
        self.file_stack: List[Tokenizer] = [tokenizer]
        self.unget_token: Optional[str] = None

    # -- token plumbing (parser.rs:323-352) --------------------------------

    def _next_token(self, required: bool) -> Optional[str]:
        if self.unget_token is not None:
            tok, self.unget_token = self.unget_token, None
            return tok
        while self.file_stack:
            try:
                tok = next(self.file_stack[-1])
            except StopIteration:
                self.file_stack.pop()
                continue
            if tok.startswith("#"):
                continue
            return tok
        if required:
            raise ParseError("premature EOF")
        return None

    def _parse_floats(self, n: int) -> List[float]:
        out = []
        for _ in range(n):
            tok = self._next_token(required=True)
            try:
                out.append(float(tok))
            except ValueError as e:
                raise ParseError(f"expected number, got '{tok}'") from e
        return out

    def _parse_params(self) -> ParamSet:
        """Parse "type name" value-lists until a non-quoted token
        (parser.rs:354-414)."""
        ps = ParamSet()
        while True:
            decl = self._next_token(required=False)
            if decl is None:
                return ps
            if not _is_quoted(decl):
                self.unget_token = decl
                return ps
            name = _dequote(decl)
            doubles: List[float] = []
            strings: List[str] = []

            def add_val(val: str):
                if _is_quoted(val):
                    if doubles:
                        raise ParseError("mixed string and numeric parameters")
                    strings.append(_dequote(val))
                else:
                    if strings:
                        raise ParseError("mixed string and numeric parameters")
                    try:
                        doubles.append(float(val))
                    except ValueError as e:
                        raise ParseError(f"expected number, got '{val}'") from e

            val = self._next_token(required=True)
            if val == "[":
                while True:
                    val = self._next_token(required=True)
                    if val == "]":
                        break
                    add_val(val)
            else:
                add_val(val)
            _add_param(ps, name, doubles, strings)

    def _name_and_params(self) -> tuple:
        tok = self._next_token(required=True)
        name = _dequote(tok)
        params = self._parse_params()
        return name, params

    # -- main loop ----------------------------------------------------------

    def parse(self, api) -> None:
        while True:
            tok = self._next_token(required=False)
            if tok is None:
                return
            handler = _DIRECTIVES.get(tok)
            if handler is None:
                raise ParseError(f"syntax error: '{tok}'")
            handler(self, api)


def _pl(method_name: str) -> Callable:
    """Directive taking (quoted name, param list)."""

    def handler(p: Parser, api):
        name, params = p._name_and_params()
        getattr(api, method_name)(name, params)

    return handler


def _d_active_transform(p: Parser, api):
    which = p._next_token(required=True)
    if which == "All":
        api.active_transform_all()
    elif which == "EndTime":
        api.active_transform_end_time()
    elif which == "StartTime":
        api.active_transform_start_time()
    else:
        raise ParseError(f"expected All/EndTime/StartTime after ActiveTransform, got '{which}'")


def _d_look_at(p: Parser, api):
    v = p._parse_floats(9)
    api.look_at(v[0:3], v[3:6], v[6:9])


def _d_translate(p: Parser, api):
    v = p._parse_floats(3)
    api.translate(v[0], v[1], v[2])


def _d_scale(p: Parser, api):
    v = p._parse_floats(3)
    api.scale(v[0], v[1], v[2])


def _d_rotate(p: Parser, api):
    v = p._parse_floats(4)
    api.rotate(v[0], v[1], v[2], v[3])


def _d_concat_transform(p: Parser, api):
    tok = p._next_token(required=True)
    if tok != "[":
        raise ParseError(f"expected '[' after ConcatTransform, got '{tok}'")
    v = p._parse_floats(16)
    if p._next_token(required=True) != "]":
        raise ParseError("expected ']' after ConcatTransform values")
    api.concat_transform(v)


def _d_transform(p: Parser, api):
    tok = p._next_token(required=True)
    if tok != "[":
        raise ParseError(f"expected '[' after Transform, got '{tok}'")
    v = p._parse_floats(16)
    if p._next_token(required=True) != "]":
        raise ParseError("expected ']' after Transform values")
    api.transform(v)


def _d_transform_times(p: Parser, api):
    v = p._parse_floats(2)
    api.transform_times(v[0], v[1])


def _d_texture(p: Parser, api):
    name = _dequote(p._next_token(required=True))
    kind = _dequote(p._next_token(required=True))
    texname = _dequote(p._next_token(required=True))
    params = p._parse_params()
    api.texture(name, kind, texname, params)


def _d_coordinate_system(p: Parser, api):
    api.coordinate_system(_dequote(p._next_token(required=True)))


def _d_coord_sys_transform(p: Parser, api):
    api.coordinate_system_transform(_dequote(p._next_token(required=True)))


def _d_include(p: Parser, api):
    fn = _dequote(p._next_token(required=True))
    path = resolve_filename(fn)
    p.file_stack.append(create_from_file(path))


def _d_named_material(p: Parser, api):
    api.named_material(_dequote(p._next_token(required=True)))


def _d_object_begin(p: Parser, api):
    api.object_begin(_dequote(p._next_token(required=True)))


def _d_object_instance(p: Parser, api):
    api.object_instance(_dequote(p._next_token(required=True)))


def _d_medium_interface(p: Parser, api):
    inside = _dequote(p._next_token(required=True))
    # outside name is optional in pbrt-v3
    tok = p._next_token(required=False)
    outside = ""
    if tok is not None:
        if _is_quoted(tok):
            outside = _dequote(tok)
        else:
            p.unget_token = tok
    api.medium_interface(inside, outside)


def _d_make_named_medium(p: Parser, api):
    name, params = p._name_and_params()
    api.make_named_medium(name, params)


_DIRECTIVES = {
    "Accelerator": _pl("accelerator"),
    "ActiveTransform": _d_active_transform,
    "AreaLightSource": _pl("area_light_source"),
    "AttributeBegin": lambda p, api: api.attribute_begin(),
    "AttributeEnd": lambda p, api: api.attribute_end(),
    "Camera": _pl("camera"),
    "ConcatTransform": _d_concat_transform,
    "CoordinateSystem": _d_coordinate_system,
    "CoordSysTransform": _d_coord_sys_transform,
    "Film": _pl("film"),
    "Identity": lambda p, api: api.identity(),
    "Include": _d_include,
    "Integrator": _pl("integrator"),
    "LightSource": _pl("light_source"),
    "LookAt": _d_look_at,
    "MakeNamedMaterial": _pl("make_named_material"),
    "MakeNamedMedium": _d_make_named_medium,
    "Material": _pl("material"),
    "MediumInterface": _d_medium_interface,
    "NamedMaterial": _d_named_material,
    "ObjectBegin": _d_object_begin,
    "ObjectEnd": lambda p, api: api.object_end(),
    "ObjectInstance": _d_object_instance,
    "PixelFilter": _pl("pixel_filter"),
    "ReverseOrientation": lambda p, api: api.reverse_orientation(),
    "Rotate": _d_rotate,
    "Sampler": _pl("sampler"),
    "Scale": _d_scale,
    "Shape": _pl("shape"),
    "Texture": _d_texture,
    "Transform": _d_transform,
    "TransformBegin": lambda p, api: api.transform_begin(),
    "TransformEnd": lambda p, api: api.transform_end(),
    "TransformTimes": _d_transform_times,
    "Translate": _d_translate,
    "WorldBegin": lambda p, api: api.world_begin(),
    "WorldEnd": lambda p, api: api.world_end(),
}


def parse(tokenizer: Tokenizer, api) -> None:
    """Parse all tokens, invoking API callbacks (parser.rs:752-754)."""
    Parser(tokenizer).parse(api)


def parse_file(path, api) -> None:
    """Parse a scene file, setting the include search directory."""
    set_search_directory(directory_containing(path))
    parse(create_from_file(path), api)
