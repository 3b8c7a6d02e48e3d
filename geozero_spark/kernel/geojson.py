"""GeoJSON codec.

Writer parity target: geozero/src/geojson/geojson_writer.rs — exact text
layout: ``{"type": "Point", "coordinates": [x,y]}`` (space after the
colon in object keys, none inside coordinate arrays), numbers via Rust
f64 Display, POINT EMPTY as ``"coordinates": []``, GeometryCollection
uses ``"geometries"``.

Reader semantics: geozero/src/geojson/geojson_reader.rs:160-217 —
accepts Geometry / Feature / FeatureCollection; 3rd coordinate element is
z (no m in GeoJSON).
"""

from __future__ import annotations

import json

from .fmt import format_f64
from .model import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
)

_GJ_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}
_GJ_KINDS = {v: k for k, v in _GJ_NAMES.items()}


class GeoJsonError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

def encode(geom: Geom, with_z: bool | None = None) -> str:
    wz = geom.has_z if with_z is None else with_z
    out: list[str] = []
    _enc(out, geom, wz)
    return "".join(out)


def _coord(out: list, c, wz: bool) -> None:
    out.append("[")
    out.append(format_f64(c[0]))
    out.append(",")
    out.append(format_f64(c[1]))
    if wz and len(c) > 2 and c[2] is not None:
        out.append(",")
        out.append(format_f64(c[2]))
    out.append("]")


def _coords(out: list, coords, wz: bool) -> None:
    for i, c in enumerate(coords):
        if i:
            out.append(",")
        _coord(out, c, wz)


def _enc(out: list, g: Geom, wz: bool) -> None:
    t = g.kind
    name = _GJ_NAMES.get(t)
    if name is None:
        raise GeoJsonError(
            f"geometry type {t} not representable in GeoJSON")
    if t == GEOMETRYCOLLECTION:
        out.append('{"type": "GeometryCollection", "geometries": [')
        for i, m in enumerate(g.data):
            if i:
                out.append(",")
            _enc(out, m, wz)
        out.append("]}")
        return
    out.append(f'{{"type": "{name}", "coordinates": ')
    if t == POINT:
        if g.data is None:
            out.append("[]")
        else:
            _coord(out, g.data, wz)
    elif t == LINESTRING:
        out.append("[")
        _coords(out, g.data, wz)
        out.append("]")
    elif t == POLYGON:
        out.append("[")
        for i, ring in enumerate(g.data):
            if i:
                out.append(",")
            out.append("[")
            _coords(out, ring, wz)
            out.append("]")
        out.append("]")
    elif t == MULTIPOINT:
        out.append("[")
        kept = [c for c in g.data if c is not None]
        _coords(out, kept, wz)
        out.append("]")
    elif t == MULTILINESTRING:
        out.append("[")
        for i, line in enumerate(g.data):
            if i:
                out.append(",")
            out.append("[")
            _coords(out, line, wz)
            out.append("]")
        out.append("]")
    elif t == MULTIPOLYGON:
        out.append("[")
        for i, rings in enumerate(g.data):
            if i:
                out.append(",")
            out.append("[")
            for j, ring in enumerate(rings):
                if j:
                    out.append(",")
                out.append("[")
                _coords(out, ring, wz)
                out.append("]")
            out.append("]")
        out.append("]")
    out.append("}")


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

def decode(text: str) -> Geom:
    """Parse a GeoJSON Geometry / Feature (geometry part) string."""
    return from_obj(json.loads(text))


def from_obj(obj: dict) -> Geom:
    if not isinstance(obj, dict) or "type" not in obj:
        raise GeoJsonError("not a GeoJSON object")
    typ = obj["type"]
    if typ == "Feature":
        geom = obj.get("geometry")
        if geom is None:
            raise GeoJsonError("Feature without geometry")
        return from_obj(geom)
    if typ == "FeatureCollection":
        members = [from_obj(f) for f in obj.get("features", [])]
        g = Geom(GEOMETRYCOLLECTION, members)
        g.has_z = any(m.has_z for m in members)
        return g
    if typ == "GeometryCollection":
        members = [from_obj(m) for m in obj.get("geometries", [])]
        g = Geom(GEOMETRYCOLLECTION, members)
        g.has_z = any(m.has_z for m in members)
        return g
    kind = _GJ_KINDS.get(typ)
    if kind is None:
        raise GeoJsonError(f"unknown GeoJSON type {typ!r}")
    coords = obj.get("coordinates")
    if coords is None:
        raise GeoJsonError("geometry without coordinates")

    has_z = [False]

    def c(v) -> tuple:
        if len(v) > 2:
            has_z[0] = True
            return (float(v[0]), float(v[1]), float(v[2]))
        return (float(v[0]), float(v[1]))

    if kind == POINT:
        data = c(coords) if coords else None
    elif kind == LINESTRING:
        data = [c(v) for v in coords]
    elif kind == POLYGON:
        data = [[c(v) for v in ring] for ring in coords]
    elif kind == MULTIPOINT:
        data = [c(v) for v in coords]
    elif kind == MULTILINESTRING:
        data = [[c(v) for v in line] for line in coords]
    elif kind == MULTIPOLYGON:
        data = [[[c(v) for v in ring] for ring in rings] for rings in coords]
    else:  # pragma: no cover
        raise GeoJsonError(f"unhandled kind {kind}")
    return Geom(kind, data, has_z=has_z[0])
