"""WKT codec.

Writer parity target: geozero/src/wkt/wkt_writer.rs — byte-identical
output: no space after the tag, comma-separated coords with single
spaces, ``EMPTY`` for empty geometries, ``SRID=n;`` prefix only for the
EWKT dialect (wkt_writer.rs:44-53), untagged inner linestrings/polygons,
MULTIPOINT members rendered without parentheses
(e.g. ``MULTIPOINT(10 -20 100,0 -0.5 101)``, wkb_reader.rs:747-752).

Reader: recursive-descent parser for the same grammar plus common WKT
variants (``Z``/``M``/``ZM`` dimension markers, optional member parens in
MULTIPOINT, ``SRID=n;`` EWKT prefix) — semantics of the ``wkt`` crate
usage in geozero/src/wkt/wkt_reader.rs:82-150.
"""

from __future__ import annotations

import re
from typing import Optional

from .fmt import format_f64
from .model import (
    CIRCULARSTRING,
    COMPOUNDCURVE,
    CURVEPOLYGON,
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTICURVE,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    MULTISURFACE,
    POINT,
    POLYGON,
    POLYHEDRALSURFACE,
    TIN,
    TRIANGLE,
    WKT_TAGS,
    Geom,
)


class WktError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

def encode(geom: Geom, dialect: str = "wkt", srid: Optional[int] = None,
           with_z: bool | None = None, with_m: bool | None = None) -> str:
    """Encode a Geom as WKT (or EWKT when ``dialect='ewkt'``).

    ``with_z``/``with_m`` select the output dimensions like
    WktWriter::with_dims; default = the geometry's own dims.
    """
    wz = geom.has_z if with_z is None else with_z
    wm = geom.has_m if with_m is None else with_m
    out = []
    if dialect == "ewkt":
        s = srid if srid is not None else geom.srid
        if s not in (None, 0):
            out.append(f"SRID={s};")
    _enc(out, geom, wz and geom.has_z, wm and geom.has_m, True)
    return "".join(out)


def _coord_str(c, wz: bool, wm: bool) -> str:
    parts = [format_f64(c[0]), format_f64(c[1])]
    if wz and len(c) > 2 and c[2] is not None:
        parts.append(format_f64(c[2]))
    if wm and len(c) > 3 and c[3] is not None:
        parts.append(format_f64(c[3]))
    return " ".join(parts)


def _coords_str(coords, wz, wm) -> str:
    return ",".join(_coord_str(c, wz, wm) for c in coords)


def _enc(out: list, g: Geom, wz: bool, wm: bool, tagged: bool) -> None:
    t = g.kind
    tag = WKT_TAGS[t]
    if t == POINT:
        if g.data is None:
            out.append(f"{tag} EMPTY" if tagged else "EMPTY")
        else:
            if tagged:
                out.append(tag)
            out.append("(")
            out.append(_coord_str(g.data, wz, wm))
            out.append(")")
        return

    if tagged:
        out.append(tag)
    if not g.data:
        out.append(" EMPTY" if tagged else "EMPTY")
        return
    out.append("(")

    if t in (LINESTRING, CIRCULARSTRING):
        out.append(_coords_str(g.data, wz, wm))
    elif t in (POLYGON, TRIANGLE):
        out.append(",".join(f"({_coords_str(r, wz, wm)})" for r in g.data))
    elif t == MULTIPOINT:
        # members untagged and unparenthesized; EMPTY members as "EMPTY"
        out.append(",".join(
            "EMPTY" if c is None else _coord_str(c, wz, wm) for c in g.data))
    elif t == MULTILINESTRING:
        out.append(",".join(f"({_coords_str(line, wz, wm)})"
                            for line in g.data))
    elif t in (MULTIPOLYGON, POLYHEDRALSURFACE, TIN):
        out.append(",".join(
            "(" + ",".join(f"({_coords_str(r, wz, wm)})" for r in rings) + ")"
            for rings in g.data))
    elif t in (COMPOUNDCURVE, CURVEPOLYGON, MULTICURVE, MULTISURFACE):
        # members tagged only when not a plain LineString (wkt output style
        # of the reference: COMPOUNDCURVE(CIRCULARSTRING(...),(...)) )
        parts = []
        for m in g.data:
            if m.kind == LINESTRING:
                sub: list = []
                _enc(sub, m, wz, wm, False)
                parts.append("".join(sub))
            else:
                sub = []
                _enc(sub, m, wz, wm, True)
                parts.append("".join(sub))
        out.append(",".join(parts))
    elif t == GEOMETRYCOLLECTION:
        parts = []
        for m in g.data:
            sub: list = []
            _enc(sub, m, wz, wm, True)
            parts.append("".join(sub))
        out.append(",".join(parts))
    else:
        raise WktError(f"unsupported geometry type {t}")
    out.append(")")


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

_TAGS = {v: k for k, v in WKT_TAGS.items()}
_NUM_RE = re.compile(r"[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)?")


class _P:
    __slots__ = ("s", "i")

    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def skip_ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t\n\r":
            self.i += 1

    def peek(self) -> str:
        self.skip_ws()
        return self.s[self.i] if self.i < len(self.s) else ""

    def expect(self, ch: str):
        self.skip_ws()
        if self.i >= len(self.s) or self.s[self.i] != ch:
            raise WktError(f"expected {ch!r} at {self.i} in {self.s[:80]!r}")
        self.i += 1

    def try_char(self, ch: str) -> bool:
        self.skip_ws()
        if self.i < len(self.s) and self.s[self.i] == ch:
            self.i += 1
            return True
        return False

    def word(self) -> str:
        self.skip_ws()
        j = self.i
        while j < len(self.s) and (self.s[j].isalpha() or self.s[j] == "_"):
            j += 1
        w = self.s[self.i:j]
        self.i = j
        return w

    def number(self) -> float:
        self.skip_ws()
        m = _NUM_RE.match(self.s, self.i)
        if not m:
            raise WktError(f"expected number at {self.i} in {self.s[:80]!r}")
        self.i = m.end()
        return float(m.group(0))


def decode(text: str) -> Geom:
    """Parse WKT/EWKT text into a Geom."""
    p = _P(text.strip())
    srid = None
    if p.s[:5].upper() == "SRID=":
        p.i = 5
        srid = int(p.number())
        p.expect(";")
    g = _parse_geom(p)
    p.skip_ws()
    if p.i != len(p.s):
        raise WktError(f"trailing input at {p.i}")
    g.srid = srid
    return g


def _parse_geom(p: _P) -> Geom:
    tag = p.word().upper()
    if tag not in _TAGS:
        raise WktError(f"unknown WKT tag {tag!r}")
    kind = _TAGS[tag]
    # optional dimension marker
    has_z = has_m = False
    save = p.i
    dim = p.word().upper()
    if dim in ("Z", "M", "ZM"):
        has_z = "Z" in dim
        has_m = "M" in dim
    elif dim == "EMPTY":
        return _empty(kind, has_z, has_m)
    elif dim:
        p.i = save
    p.skip_ws()
    if p.s[p.i:p.i + 5].upper() == "EMPTY":
        p.i += 5
        return _empty(kind, has_z, has_m)

    width_seen = [0]
    # an explicit Z/M/ZM tag fixes the coordinate width; untagged input
    # infers it but must stay uniform (the reference's wkt crate rejects
    # mixed-dimensionality coordinate sequences)
    expect_w = 2 + int(has_z) + int(has_m) if (has_z or has_m) else None

    def coord() -> tuple:
        vals = [p.number()]
        while p.peek() not in (",", ")", ""):
            vals.append(p.number())
        if len(vals) < 2:
            raise WktError(f"coordinate needs at least x y at {p.i}")
        if expect_w is not None and len(vals) != expect_w:
            raise WktError(
                f"coordinate has {len(vals)} values but dimension tag "
                f"requires {expect_w} at {p.i}")
        if width_seen[0] and len(vals) != width_seen[0]:
            raise WktError(
                f"inconsistent coordinate dimensions at {p.i}")
        width_seen[0] = max(width_seen[0], len(vals))
        return tuple(vals)

    def coord_seq() -> list:
        p.expect("(")
        out = [coord()]
        while p.try_char(","):
            out.append(coord())
        p.expect(")")
        return out

    def rings() -> list:
        p.expect("(")
        out = [coord_seq()]
        while p.try_char(","):
            out.append(coord_seq())
        p.expect(")")
        return out

    g = Geom(kind, None, has_z=has_z, has_m=has_m)
    if kind == POINT:
        p.expect("(")
        g.data = coord()
        p.expect(")")
    elif kind in (LINESTRING, CIRCULARSTRING):
        g.data = coord_seq()
    elif kind in (POLYGON, TRIANGLE):
        g.data = rings()
    elif kind == MULTIPOINT:
        p.expect("(")
        pts: list = []
        while True:
            p.skip_ws()
            if p.s[p.i:p.i + 5].upper() == "EMPTY":
                p.i += 5
                pts.append(None)
            elif p.peek() == "(":
                p.expect("(")
                pts.append(coord())
                p.expect(")")
            else:
                pts.append(coord())
            if not p.try_char(","):
                break
        p.expect(")")
        g.data = pts
    elif kind == MULTILINESTRING:
        g.data = rings()
    elif kind in (MULTIPOLYGON, POLYHEDRALSURFACE, TIN):
        p.expect("(")
        polys = [rings()]
        while p.try_char(","):
            polys.append(rings())
        p.expect(")")
        g.data = polys
    elif kind in (COMPOUNDCURVE, CURVEPOLYGON, MULTICURVE, MULTISURFACE):
        p.expect("(")
        members: list = []
        while True:
            if p.peek() == "(":
                # untagged → plain linestring member
                members.append(Geom(LINESTRING, coord_seq()))
            else:
                members.append(_parse_geom(p))
            if not p.try_char(","):
                break
        p.expect(")")
        g.data = members
        _inherit_dims(g)
    elif kind == GEOMETRYCOLLECTION:
        p.expect("(")
        members = [_parse_geom(p)]
        while p.try_char(","):
            members.append(_parse_geom(p))
        p.expect(")")
        g.data = members
        _inherit_dims(g)
    else:
        raise WktError(f"unsupported geometry {kind}")

    # infer dims from coordinate width when no Z/M marker was present
    if not has_z and not has_m and width_seen[0] > 2:
        g.has_z = True
        g.has_m = width_seen[0] > 3
    if g.has_m and not g.has_z:
        # model convention packs M-without-Z as (x, y, None, m)
        # (matches wkb._pack_coord; geometry_processor.rs:31-41 dims)
        _remap_m_only(g)
    return g


def _remap_m_only(g: Geom) -> None:
    def fix(c):
        return (c[0], c[1], None, c[2]) if c is not None and len(c) == 3 else c

    k = g.kind
    if k == POINT:
        g.data = fix(g.data)
    elif k in (LINESTRING, CIRCULARSTRING, MULTIPOINT):
        g.data = [fix(c) for c in g.data]
    elif k in (POLYGON, TRIANGLE, MULTILINESTRING):
        g.data = [[fix(c) for c in seq] for seq in g.data]
    elif k in (MULTIPOLYGON, POLYHEDRALSURFACE, TIN):
        g.data = [[[fix(c) for c in r] for r in rings] for rings in g.data]
    elif k in (COMPOUNDCURVE, CURVEPOLYGON, MULTICURVE, MULTISURFACE,
               GEOMETRYCOLLECTION):
        # untagged members (plain coord runs inside curve containers)
        # inherit the container's M-only layout
        for m in g.data:
            if not m.has_z and not m.has_m:
                m.has_m = True
                _remap_m_only(m)


def _inherit_dims(g: Geom) -> None:
    if g.data:
        g.has_z = g.has_z or any(m.has_z for m in g.data)
        g.has_m = g.has_m or any(m.has_m for m in g.data)


def _empty(kind: int, has_z: bool, has_m: bool) -> Geom:
    data = None if kind == POINT else []
    return Geom(kind, data, has_z=has_z, has_m=has_m)
