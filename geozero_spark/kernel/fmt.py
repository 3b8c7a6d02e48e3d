"""Rust-compatible float formatting.

geozero writes coordinates with Rust's ``{}`` Display for f64
(reference: geozero/src/wkt/wkt_writer.rs:108, geojson_writer.rs:85),
which prints the shortest decimal string that round-trips, never uses
scientific notation, and drops a trailing ``.0`` for integral values
(``10.0`` -> ``"10"``, ``-0.5`` -> ``"-0.5"``).

Python's ``repr`` also produces shortest-roundtrip digits but keeps the
trailing ``.0`` and switches to exponent form for very large/small
magnitudes. This module converts Python's shortest digits into the Rust
rendering so our WKT/GeoJSON output is byte-identical to the reference.
"""

from __future__ import annotations

import math


def format_f64(x: float) -> str:
    """Render ``x`` exactly like Rust's ``format!("{}", x: f64)``."""
    if x != x:  # NaN
        return "NaN"
    if math.isinf(x):
        return "inf" if x > 0 else "-inf"
    if x == 0.0:
        return "-0" if math.copysign(1.0, x) < 0 else "0"

    r = repr(x)  # shortest roundtrip digits, possibly exponent form
    if "e" not in r and "E" not in r:
        if r.endswith(".0"):
            return r[:-2]
        return r

    # Expand exponent notation to plain decimal (Rust Display never uses
    # scientific notation for f64).
    mantissa, _, exp_s = r.partition("e")
    exp = int(exp_s)
    neg = mantissa.startswith("-")
    if neg:
        mantissa = mantissa[1:]
    int_part, _, frac_part = mantissa.partition(".")
    digits = int_part + frac_part
    point = len(int_part) + exp  # position of decimal point within digits
    if point <= 0:
        out = "0." + "0" * (-point) + digits
    elif point >= len(digits):
        out = digits + "0" * (point - len(digits))
    else:
        out = digits[:point] + "." + digits[point:]
    out = out.rstrip("0").rstrip(".") if "." in out else out
    if not out or out == "":
        out = "0"
    return "-" + out if neg else out
