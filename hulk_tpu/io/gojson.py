"""Go encoding/json-compatible marshalling.

The reference writes sketches with json.MarshalIndent(hulkData, "", "    ")
(src/sketchio/sketchio.go:86) — struct-order keys, 4-space indent, Go float
formatting, HTML-escaped strings. Interchange equality requires byte-identical
output, so this module reimplements Go's encoder rules:

* float64: shortest round-trip digits; fixed notation for 1e-6 <= |x| < 1e21,
  else exponent notation with Go's "e-07" -> "e-7" cleanup
  (encoding/json floatEncoder).
* strings: escape ", \\, control chars, and (HTML mode, Go's default)
  <, >, & as \\u003c/\\u003e/\\u0026; U+2028/U+2029 escaped.
* MarshalIndent layout: every element/key on its own line; empty containers
  collapse to []/{} ; no trailing newline.
"""
from __future__ import annotations

from decimal import Decimal


def format_go_float(f: float) -> str:
    """strconv-compatible float encoding as used by encoding/json (64-bit)."""
    if f != f or f in (float("inf"), float("-inf")):
        raise ValueError("json: unsupported float value")
    if f == 0.0:
        import math

        return "-0" if math.copysign(1.0, f) < 0 else "0"
    d = Decimal(repr(f))  # repr gives the shortest round-trip digits
    sign, digits, exp = d.as_tuple()
    digits = "".join(map(str, digits))
    # strip trailing zeros from repr artifacts like '5.0'
    while len(digits) > 1 and digits.endswith("0"):
        digits = digits[:-1]
        exp += 1
    neg = "-" if sign else ""
    absf = abs(f)
    point = len(digits) + exp  # position of decimal point in digit string
    if 1e-6 <= absf < 1e21:
        # fixed notation
        if exp >= 0:
            return neg + digits + "0" * exp
        if point > 0:
            return neg + digits[:point] + "." + digits[point:]
        return neg + "0." + "0" * (-point) + digits
    # exponent notation: d[.ddd]e±XX (>=2 exponent digits), then Go cleanup
    e10 = point - 1
    mant = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
    esign = "+" if e10 >= 0 else "-"
    mag = abs(e10)
    estr = f"{mag:02d}"
    out = f"{neg}{mant}e{esign}{estr}"
    # Go cleanup: "e-07" -> "e-7"
    if len(out) >= 4 and out[-4] == "e" and out[-3] == "-" and out[-2] == "0":
        out = out[:-2] + out[-1]
    return out


_ESCAPES = {
    ord('"'): '\\"',
    ord("\\"): "\\\\",
    ord("\n"): "\\n",
    ord("\r"): "\\r",
    ord("\t"): "\\t",
    ord("<"): "\\u003c",
    ord(">"): "\\u003e",
    ord("&"): "\\u0026",
}


def format_go_string(s: str) -> str:
    out = ['"']
    for ch in s:
        o = ord(ch)
        if o in _ESCAPES:
            out.append(_ESCAPES[o])
        elif o < 0x20:
            out.append(f"\\u{o:04x}")
        elif o in (0x2028, 0x2029):
            out.append(f"\\u{o:04x}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _marshal(value, indent: str, level: int, parts: list) -> None:
    pad = indent * level
    cpad = indent * (level + 1)
    if isinstance(value, bool):
        parts.append("true" if value else "false")
    elif value is None:
        parts.append("null")
    elif isinstance(value, int):
        parts.append(str(value))
    elif isinstance(value, float):
        parts.append(format_go_float(value))
    elif isinstance(value, str):
        parts.append(format_go_string(value))
    elif isinstance(value, dict):
        if not value:
            parts.append("{}")
            return
        parts.append("{\n")
        for i, (k, v) in enumerate(value.items()):
            parts.append(cpad + format_go_string(str(k)) + ": ")
            _marshal(v, indent, level + 1, parts)
            parts.append(",\n" if i < len(value) - 1 else "\n")
        parts.append(pad + "}")
    elif isinstance(value, (list, tuple)):
        if len(value) == 0:
            parts.append("[]")
            return
        parts.append("[\n")
        for i, v in enumerate(value):
            parts.append(cpad)
            _marshal(v, indent, level + 1, parts)
            parts.append(",\n" if i < len(value) - 1 else "\n")
        parts.append(pad + "]")
    else:
        # numpy scalars
        import numpy as np

        if isinstance(value, np.integer):
            parts.append(str(int(value)))
        elif isinstance(value, np.floating):
            parts.append(format_go_float(float(value)))
        elif isinstance(value, np.bool_):
            parts.append("true" if value else "false")
        else:
            raise TypeError(f"unsupported type: {type(value)}")


def marshal_indent(value, indent: str = "    ") -> bytes:
    parts: list = []
    _marshal(value, indent, 0, parts)
    return "".join(parts).encode("utf-8")
