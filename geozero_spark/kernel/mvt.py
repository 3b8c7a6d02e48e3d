"""Mapbox Vector Tile (MVT) codec — hand-rolled protobuf, no dependency.

Implements the vector-tile-spec 2.1 wire format
(https://github.com/mapbox/vector-tile-spec/tree/master/2.1), the same
spec the reference targets via the ``fast-mvt`` crate
(geozero/src/mvt/mvt_writer.rs:1-13, mvt_reader.rs).

Semantics matched to the reference:
- geometry commands MoveTo(1)/LineTo(2)/ClosePath(7), command integer
  ``(id & 0x7) | (count << 3)``, zigzag-encoded parameter deltas
- polygon ring rewinding on encode: exterior ring positive shoelace
  area in y-down tile space, interiors negative
  (mvt_reader.rs tests polygon_ccw_exterior_is_rewound :382-427)
- repeated closing coordinate dropped before ClosePath
- value typing: string/float/double/int/uint/sint/bool
  (mvt_writer.rs:380-401)
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .model import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
)

GEOM_UNKNOWN = 0
GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3


class MvtError(ValueError):
    pass


# ---------------------------------------------------------------------------
# protobuf primitives
# ---------------------------------------------------------------------------

def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int):
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise MvtError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise MvtError("varint too long")


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _read_len(buf: bytes, pos: int):
    """Length-delimited field header with bounds check (strict decode:
    truncated tiles must error, not silently shrink)."""
    ln, pos = _read_varint(buf, pos)
    if pos + ln > len(buf):
        raise MvtError("truncated length-delimited field")
    return ln, pos


def _tag(out: bytearray, field_num: int, wire_type: int) -> None:
    _write_varint(out, (field_num << 3) | wire_type)


def _write_bytes(out: bytearray, field_num: int, data: bytes) -> None:
    _tag(out, field_num, 2)
    _write_varint(out, len(data))
    out.extend(data)


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

@dataclass
class MvtFeature:
    id: int | None
    geom_type: int  # GEOM_POINT/LINESTRING/POLYGON
    # geometry in decoded form:
    #  POINT -> list[(x, y)]
    #  LINESTRING -> list[list[(x, y)]]
    #  POLYGON -> list[list[list[(x, y)]]] (polygons -> rings -> coords,
    #    rings closed: first coord repeated at the end)
    geometry: list
    properties: dict = field(default_factory=dict)


@dataclass
class MvtLayer:
    name: str
    extent: int = 4096
    version: int = 2
    features: list = field(default_factory=list)


@dataclass
class MvtTile:
    layers: list = field(default_factory=list)


# ---------------------------------------------------------------------------
# geometry command codec
# ---------------------------------------------------------------------------

def _shoelace2(ring) -> int:
    """Twice the signed shoelace area in tile (y-down) coords."""
    s = 0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def _open_ring(ring):
    """Drop a repeated closing coordinate."""
    if len(ring) >= 2 and tuple(ring[0]) == tuple(ring[-1]):
        return ring[:-1]
    return list(ring)


def _encode_commands(feature_geom: list, geom_type: int) -> list[int]:
    cmds: list[int] = []
    cx = cy = 0

    def moveto(pts):
        nonlocal cx, cy
        cmds.append((1 & 0x7) | (len(pts) << 3))
        for x, y in pts:
            cmds.append(_zigzag(int(x) - cx))
            cmds.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)

    def lineto(pts):
        nonlocal cx, cy
        if not pts:
            return
        cmds.append((2 & 0x7) | (len(pts) << 3))
        for x, y in pts:
            cmds.append(_zigzag(int(x) - cx))
            cmds.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)

    if geom_type == GEOM_POINT:
        moveto(feature_geom)
    elif geom_type == GEOM_LINESTRING:
        for line in feature_geom:
            if len(line) < 2:
                raise MvtError("LineString with fewer than 2 coordinates")
            moveto(line[:1])
            lineto(line[1:])
    elif geom_type == GEOM_POLYGON:
        for rings in feature_geom:
            for ri, ring in enumerate(rings):
                pts = _open_ring(ring)
                if len(pts) < 3:
                    raise MvtError("ring with fewer than 3 distinct coords")
                area2 = _shoelace2(pts + [pts[0]])
                want_positive = ri == 0
                if (area2 > 0) != want_positive:
                    pts = pts[::-1]
                moveto(pts[:1])
                lineto(pts[1:])
                cmds.append((7 & 0x7) | (1 << 3))  # ClosePath
    else:
        raise MvtError(f"unsupported geom type {geom_type}")
    return cmds


def _decode_commands(cmds: list[int], geom_type: int) -> list:
    pos = 0
    cx = cy = 0
    parts: list = []  # list of (cmd_id, coords)
    while pos < len(cmds):
        c = cmds[pos]
        pos += 1
        cmd_id = c & 0x7
        count = c >> 3
        if cmd_id in (1, 2):  # MoveTo / LineTo
            pts = []
            for _ in range(count):
                if pos + 1 >= len(cmds) + 1 and pos + 2 > len(cmds):
                    raise MvtError("truncated geometry")
                cx += _unzigzag(cmds[pos])
                cy += _unzigzag(cmds[pos + 1])
                pos += 2
                pts.append((cx, cy))
            parts.append((cmd_id, pts))
        elif cmd_id == 7:
            parts.append((7, []))
        else:
            raise MvtError(f"unknown command {cmd_id}")

    if geom_type == GEOM_POINT:
        pts = []
        for cmd_id, p in parts:
            if cmd_id != 1:
                raise MvtError("point geometry must be MoveTo only")
            pts.extend(p)
        return pts
    if geom_type == GEOM_LINESTRING:
        lines = []
        cur = None
        for cmd_id, p in parts:
            if cmd_id == 1:
                cur = list(p)
                lines.append(cur)
            elif cmd_id == 2:
                if cur is None:
                    raise MvtError("LineTo before MoveTo")
                cur.extend(p)
            else:
                raise MvtError("ClosePath in linestring")
        return lines
    if geom_type == GEOM_POLYGON:
        # split into rings; group rings into polygons by winding:
        # a positive-area ring starts a new polygon
        rings = []
        cur = None
        for cmd_id, p in parts:
            if cmd_id == 1:
                cur = list(p)
            elif cmd_id == 2:
                if cur is None:
                    raise MvtError("LineTo before MoveTo")
                cur.extend(p)
            elif cmd_id == 7:
                if cur is None:
                    raise MvtError("ClosePath before ring")
                cur.append(cur[0])  # close
                rings.append(cur)
                cur = None
        polys: list = []
        for ring in rings:
            if _shoelace2(_open_ring(ring) + [_open_ring(ring)[0]]) > 0 or not polys:
                polys.append([ring])
            else:
                polys[-1].append(ring)
        return polys
    raise MvtError(f"unsupported geom type {geom_type}")


# ---------------------------------------------------------------------------
# value codec
# ---------------------------------------------------------------------------

def _encode_value(v) -> bytes:
    out = bytearray()
    if isinstance(v, bool):
        _tag(out, 7, 0)
        _write_varint(out, 1 if v else 0)
    elif isinstance(v, str):
        _write_bytes(out, 1, v.encode("utf-8"))
    elif isinstance(v, int):
        _tag(out, 4, 0)
        _write_varint(out, v)
    elif isinstance(v, float):
        _tag(out, 3, 1)
        out.extend(struct.pack("<d", v))
    elif isinstance(v, bytes):
        _write_bytes(out, 1, v)
    else:
        _write_bytes(out, 1, str(v).encode("utf-8"))
    return bytes(out)


def _decode_value(buf: bytes):
    pos = 0
    val = None
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        fnum, wt = key >> 3, key & 0x7
        if fnum == 1 and wt == 2:
            ln, pos = _read_len(buf, pos)
            val = buf[pos:pos + ln].decode("utf-8")
            pos += ln
        elif fnum == 2 and wt == 5:
            val = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        elif fnum == 3 and wt == 1:
            val = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif fnum in (4, 5) and wt == 0:
            val, pos = _read_varint(buf, pos)
            if fnum == 4 and val >= 1 << 63:
                val -= 1 << 64
        elif fnum == 6 and wt == 0:
            raw, pos = _read_varint(buf, pos)
            val = _unzigzag(raw)
        elif fnum == 7 and wt == 0:
            raw, pos = _read_varint(buf, pos)
            val = bool(raw)
        else:
            pos = _skip_field(buf, pos, wt)
    return val


def _skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:
        _, pos = _read_varint(buf, pos)
    elif wire_type == 1:
        pos += 8
    elif wire_type == 2:
        ln, pos = _read_len(buf, pos)
        pos += ln
    elif wire_type == 5:
        pos += 4
    else:
        raise MvtError(f"unsupported wire type {wire_type}")
    return pos


# ---------------------------------------------------------------------------
# tile encode / decode
# ---------------------------------------------------------------------------

def encode_tile(tile: MvtTile) -> bytes:
    out = bytearray()
    for layer in tile.layers:
        _write_bytes(out, 3, _encode_layer(layer))
    return bytes(out)


def _encode_layer(layer: MvtLayer) -> bytes:
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    values: list[bytes] = []
    value_idx: dict[bytes, int] = {}

    out = bytearray()
    _tag(out, 15, 0)
    _write_varint(out, layer.version)
    _write_bytes(out, 1, layer.name.encode("utf-8"))

    feat_bufs = []
    for f in layer.features:
        fb = bytearray()
        if f.id is not None:
            _tag(fb, 1, 0)
            _write_varint(fb, f.id)
        tags: list[int] = []
        for k, v in f.properties.items():
            if k not in key_idx:
                key_idx[k] = len(keys)
                keys.append(k)
            ev = _encode_value(v)
            if ev not in value_idx:
                value_idx[ev] = len(values)
                values.append(ev)
            tags.append(key_idx[k])
            tags.append(value_idx[ev])
        if tags:
            packed = bytearray()
            for t in tags:
                _write_varint(packed, t)
            _write_bytes(fb, 2, bytes(packed))
        _tag(fb, 3, 0)
        _write_varint(fb, f.geom_type)
        cmds = _encode_commands(f.geometry, f.geom_type)
        packed = bytearray()
        for c in cmds:
            _write_varint(packed, c)
        _write_bytes(fb, 4, bytes(packed))
        feat_bufs.append(bytes(fb))

    for fb in feat_bufs:
        _write_bytes(out, 2, fb)
    for k in keys:
        _write_bytes(out, 3, k.encode("utf-8"))
    for v in values:
        _write_bytes(out, 4, v)
    _tag(out, 5, 0)
    _write_varint(out, layer.extent)
    return bytes(out)


def decode_tile(buf: bytes) -> MvtTile:
    tile = MvtTile()
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        fnum, wt = key >> 3, key & 0x7
        if fnum == 3 and wt == 2:
            ln, pos = _read_len(buf, pos)
            tile.layers.append(_decode_layer(buf[pos:pos + ln]))
            pos += ln
        else:
            pos = _skip_field(buf, pos, wt)
    return tile


def _decode_layer(buf: bytes) -> MvtLayer:
    layer = MvtLayer(name="")
    keys: list[str] = []
    values: list = []
    raw_features: list[bytes] = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        fnum, wt = key >> 3, key & 0x7
        if fnum == 15 and wt == 0:
            layer.version, pos = _read_varint(buf, pos)
        elif fnum == 1 and wt == 2:
            ln, pos = _read_len(buf, pos)
            layer.name = buf[pos:pos + ln].decode("utf-8")
            pos += ln
        elif fnum == 2 and wt == 2:
            ln, pos = _read_len(buf, pos)
            raw_features.append(buf[pos:pos + ln])
            pos += ln
        elif fnum == 3 and wt == 2:
            ln, pos = _read_len(buf, pos)
            keys.append(buf[pos:pos + ln].decode("utf-8"))
            pos += ln
        elif fnum == 4 and wt == 2:
            ln, pos = _read_len(buf, pos)
            values.append(_decode_value(buf[pos:pos + ln]))
            pos += ln
        elif fnum == 5 and wt == 0:
            layer.extent, pos = _read_varint(buf, pos)
        else:
            pos = _skip_field(buf, pos, wt)
    for fb in raw_features:
        layer.features.append(_decode_feature(fb, keys, values))
    return layer


def _decode_feature(buf: bytes, keys: list, values: list) -> MvtFeature:
    fid = None
    geom_type = GEOM_UNKNOWN
    tags: list[int] = []
    cmds: list[int] = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        fnum, wt = key >> 3, key & 0x7
        if fnum == 1 and wt == 0:
            fid, pos = _read_varint(buf, pos)
        elif fnum == 2 and wt == 2:
            ln, pos = _read_len(buf, pos)
            end = pos + ln
            while pos < end:
                t, pos = _read_varint(buf, pos)
                tags.append(t)
        elif fnum == 3 and wt == 0:
            geom_type, pos = _read_varint(buf, pos)
        elif fnum == 4 and wt == 2:
            ln, pos = _read_len(buf, pos)
            end = pos + ln
            while pos < end:
                c, pos = _read_varint(buf, pos)
                cmds.append(c)
        else:
            pos = _skip_field(buf, pos, wt)
    props = {}
    for i in range(0, len(tags) - 1, 2):
        props[keys[tags[i]]] = values[tags[i + 1]]
    return MvtFeature(id=fid, geom_type=geom_type,
                      geometry=_decode_commands(cmds, geom_type),
                      properties=props)


# ---------------------------------------------------------------------------
# Geom <-> MVT feature bridge
# ---------------------------------------------------------------------------

def feature_from_geom(tile_geom: Geom, properties: dict | None = None,
                      fid: int | None = None) -> MvtFeature:
    """Build an MvtFeature from an integer tile-space Geom (output of
    tiles.transform_geom_to_tile)."""
    t = tile_geom.kind
    if t == POINT:
        return MvtFeature(fid, GEOM_POINT, [tile_geom.data],
                          properties or {})
    if t == MULTIPOINT:
        return MvtFeature(fid, GEOM_POINT,
                          [c for c in tile_geom.data if c is not None],
                          properties or {})
    if t == LINESTRING:
        return MvtFeature(fid, GEOM_LINESTRING, [tile_geom.data],
                          properties or {})
    if t == MULTILINESTRING:
        return MvtFeature(fid, GEOM_LINESTRING, tile_geom.data,
                          properties or {})
    if t == POLYGON:
        return MvtFeature(fid, GEOM_POLYGON, [tile_geom.data],
                          properties or {})
    if t == MULTIPOLYGON:
        return MvtFeature(fid, GEOM_POLYGON, tile_geom.data,
                          properties or {})
    raise MvtError(f"geometry type {t} not supported in MVT features")


def geom_from_feature(f: MvtFeature) -> Geom:
    """Integer tile-space Geom from a decoded feature."""
    if f.geom_type == GEOM_POINT:
        if len(f.geometry) == 1:
            return Geom(POINT, f.geometry[0])
        return Geom(MULTIPOINT, list(f.geometry))
    if f.geom_type == GEOM_LINESTRING:
        if len(f.geometry) == 1:
            return Geom(LINESTRING, f.geometry[0])
        return Geom(MULTILINESTRING, list(f.geometry))
    if f.geom_type == GEOM_POLYGON:
        if len(f.geometry) == 1:
            return Geom(POLYGON, f.geometry[0])
        return Geom(MULTIPOLYGON, list(f.geometry))
    raise MvtError(f"unknown feature type {f.geom_type}")
