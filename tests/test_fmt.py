"""Rust f64 Display parity for coordinate formatting."""

import math

from geozero_spark.kernel.fmt import format_f64


def test_integral():
    assert format_f64(10.0) == "10"
    assert format_f64(-20.0) == "-20"
    assert format_f64(0.0) == "0"
    assert format_f64(100.0) == "100"


def test_fractional():
    assert format_f64(-0.5) == "-0.5"
    assert format_f64(1.1) == "1.1"
    assert format_f64(47.37) == "47.37"
    assert format_f64(8.53) == "8.53"


def test_shortest_roundtrip():
    assert format_f64(0.1) == "0.1"
    assert format_f64(1 / 3) == "0.3333333333333333"
    assert float(format_f64(math.pi)) == math.pi


def test_exponent_expansion():
    assert format_f64(1e21) == "1000000000000000000000"
    assert format_f64(1e-7) == "0.0000001"
    assert format_f64(1.5e-5) == "0.000015"
    assert format_f64(-2.5e20) == "-250000000000000000000"
    # all expansions must roundtrip
    for v in (1e21, 1e-7, 1.5e-5, -2.5e20, 6.02e23, 1e-300):
        assert float(format_f64(v)) == v


def test_negative_zero():
    assert format_f64(-0.0) == "-0"
