"""SVG writer — exact parity with geozero/src/svg/writer.rs.

Event-for-event re-expression of the reference's emitter:

- ``xy``: ``"{x} {y} "`` with Y negated when invert_y
  (writer.rs:92-96); numbers use Rust-Display formatting (kernel/fmt).
- Point: ``<path d="M`` ... ``Z"/>`` (writer.rs:97-104).
- Tagged LineString: ``<path d="`` coords ``"/>`` — NO M, NO Z
  (writer.rs:105-119, test :199).
- Untagged LineString (ring / multi-line member): ``M `` coords ``Z ``
  (same methods, tagged=false; test :167 shows rings as M...Z runs).
- MultiLineString: one ``<path>`` wrapping M...Z runs (:121-128).
- Polygon: one ``<path>`` wrapping its rings (:129-136); polygons
  inside a MultiPolygon each emit their own ``<path>`` (polygon_begin
  ignores ``tagged``; test :182-184 shows two path elements).
- Document framing: dataset_begin/end (writer.rs:46-90).
"""

from __future__ import annotations

from typing import Optional

from .fmt import format_f64
from .model import (GEOMETRYCOLLECTION, LINESTRING, MULTILINESTRING,
                    MULTIPOINT, MULTIPOLYGON, POINT, POLYGON, TRIANGLE,
                    Geom)


def _xy(out: list, c, invert_y: bool) -> None:
    y = -c[1] if invert_y else c[1]
    out.append(format_f64(float(c[0])))
    out.append(" ")
    out.append(format_f64(float(y)))
    out.append(" ")


def _point(out: list, c, invert_y: bool) -> None:
    out.append('<path d="M ')
    _xy(out, c, invert_y)
    out.append('Z"/>')


def _linestring(out: list, coords, tagged: bool, invert_y: bool) -> None:
    out.append('<path d="' if tagged else "M ")
    for c in coords:
        _xy(out, c, invert_y)
    out.append('"/>' if tagged else "Z ")


def _polygon(out: list, rings, invert_y: bool) -> None:
    out.append('<path d="')
    for ring in rings:
        _linestring(out, ring, False, invert_y)
    out.append('"/>')


def encode(g: Geom, invert_y: bool = False) -> str:
    """One geometry -> SVG path element(s) (ToSvg::to_svg parity)."""
    out: list[str] = []

    def walk(g: Geom, tagged: bool) -> None:
        k = g.kind
        if k == POINT:
            if g.data is not None:
                _point(out, g.data, invert_y)
        elif k == MULTIPOINT:
            for c in g.data:
                if c is not None:
                    _point(out, c, invert_y)
        elif k == LINESTRING:
            _linestring(out, g.data, tagged, invert_y)
        elif k == MULTILINESTRING:
            out.append('<path d="')
            for line in g.data:
                _linestring(out, line, False, invert_y)
            out.append('"/>')
        elif k in (POLYGON, TRIANGLE):
            _polygon(out, g.data, invert_y)
        elif k == MULTIPOLYGON:
            for rings in g.data:
                _polygon(out, rings, invert_y)
        elif k == GEOMETRYCOLLECTION:
            for m in g.data:
                walk(m, True)
        else:
            raise ValueError(f"SVG writer: unsupported kind {k}")

    walk(g, True)
    return "".join(out)


def document(feature_svgs: list[str], name: str = "",
             bounds: Optional[tuple] = None, invert_y: bool = True,
             width: Optional[int] = None,
             height: Optional[int] = None) -> str:
    """Dataset framing (dataset_begin/dataset_end, writer.rs:46-90)."""
    out = ['<?xml version="1.0"?>\n<svg xmlns="http://www.w3.org/2000/'
           'svg" version="1.2" baseProfile="tiny" ']
    if width is not None and height is not None:
        out.append(f'width="{width}" height="{height}" ')
    if bounds is not None:
        xmin, ymin, xmax, ymax = bounds
        if invert_y:
            ymin, ymax = -ymax, -ymin
        out.append(f'viewBox="{xmin} {ymin} {xmax - xmin} '
                   f'{ymax - ymin}" ')
    out.append('stroke-linecap="round" stroke-linejoin="round">\n')
    out.append(f'<g id="{name}">')
    for f in feature_svgs:
        out.append("\n")
        out.append(f)
    out.append("\n</g>\n</svg>")
    return "".join(out)
