"""Go encoding/json compatibility tests: float formatting rules, string
escaping, MarshalIndent layout — cross-checked against known Go outputs."""
import json

import pytest

from hulk_tpu.io.gojson import format_go_float, format_go_string, marshal_indent

# (value, exact Go encoding/json output)
FLOAT_CASES = [
    (0.0, "0"),
    (5.0, "5"),
    (123000.0, "123000"),
    (0.123456, "0.123456"),
    (1e-6, "0.000001"),
    (1.5e-7, "1.5e-7"),
    (1e-7, "1e-7"),
    (1e21, "1e+21"),
    (1.2e22, "1.2e+22"),
    (1e20, "100000000000000000000"),
    (1.7976931348623157e308, "1.7976931348623157e+308"),
    (-2.5, "-2.5"),
    (1e-100, "1e-100"),
    (3.5e-5, "0.000035"),
    (0.6046602879796196, "0.6046602879796196"),
    (1234567890.12345, "1234567890.12345"),
]


@pytest.mark.parametrize("value,expected", FLOAT_CASES)
def test_float_format(value, expected):
    assert format_go_float(value) == expected


def test_float_roundtrip_random():
    import numpy as np

    rng = np.random.default_rng(0)
    vals = np.concatenate(
        [
            rng.uniform(-1e3, 1e3, 2000),
            rng.uniform(0, 1, 2000),
            10 ** rng.uniform(-300, 300, 2000) * rng.choice([-1, 1], 2000),
        ]
    )
    for v in vals:
        s = format_go_float(float(v))
        assert float(s) == float(v), (v, s)


def test_string_escaping():
    assert format_go_string("a<b>&c") == '"a\\u003cb\\u003e\\u0026c"'
    assert format_go_string('q"uo\\te') == '"q\\"uo\\\\te"'
    assert format_go_string("new\nline\ttab") == '"new\\nline\\ttab"'
    assert format_go_string("\x01") == '"\\u0001"'


def test_marshal_indent_layout():
    doc = {"a": 1, "b": [1, 2], "c": {"x": True}, "d": [], "e": "s"}
    out = marshal_indent(doc).decode()
    expected = (
        '{\n    "a": 1,\n    "b": [\n        1,\n        2\n    ],\n'
        '    "c": {\n        "x": true\n    },\n    "d": [],\n    "e": "s"\n}'
    )
    assert out == expected
    # and it must still be valid JSON
    assert json.loads(out) == doc


def test_uint64_ints_exact():
    big = 2**64 - 1
    assert marshal_indent([big]).decode() == f"[\n    {big}\n]"
