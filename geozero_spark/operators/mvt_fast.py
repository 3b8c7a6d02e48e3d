"""Vectorized per-tile MVT encoding — byte-identical to the kernel path.

The kernel encoder (kernel/mvt.py) walks tuples per coordinate; at
millions of small features the per-feature Python dominates the tile
sink. This fast path keeps the EXACT protobuf layout (same layer/
feature framing, same command stream, same validity skips) but:

- transforms every coordinate of a tile in ONE numpy pass
  (kernel.tiles.mvt_transform_np — mvt_writer.rs:157-173 semantics
  including the saturating Y flip), and
- varint-encodes the concatenated command stream of the whole tile in
  one batched numpy pass, slicing per-feature byte spans afterwards.

Only flat 2D structs (Point/LineString/Polygon/Multi*) take this path;
anything else falls back to the kernel encoder per feature, so the
output bytes never differ (tested feature-for-feature against the
kernel in tests/test_mvt_fast.py).
"""

from __future__ import annotations

import numpy as np

from ..kernel import mvt as kmvt
from ..kernel import tiles as ktiles
from ..kernel.model import (LINESTRING, MULTILINESTRING, MULTIPOINT,
                            MULTIPOLYGON, POINT, POLYGON)

_FLAT_2D = {POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING,
            MULTIPOLYGON}


def varints_np(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Batch-encode uint64 varints; returns (bytes, per-value byte
    lengths) — identical bytes to kernel.mvt._write_varint per value."""
    v = vals.astype(np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp != 0)
        tmp = tmp >> np.uint64(7)
    pos = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=pos[1:])
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    cur = v.copy()
    for j in range(int(nbytes.max())):
        active = nbytes > j
        byte = (cur[active] & np.uint64(0x7F)).astype(np.uint8)
        more = (nbytes[active] > j + 1)
        out[pos[active] + j] = byte | (more.astype(np.uint8) << 7)
        cur = cur >> np.uint64(7)
    return out.tobytes(), nbytes


def _zigzag_np(d: np.ndarray) -> np.ndarray:
    return ((d << 1) ^ (d >> 63)).astype(np.uint64)


def _shoelace2_np(ring: np.ndarray) -> int:
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return int(np.sum(x * y2 - x2 * y))


def _feature_cmds(kind: int, seqs: list[np.ndarray]) -> np.ndarray:
    """Command-stream ints for one feature from integer tile-space
    coordinate runs (same layout as kernel.mvt._encode_commands)."""
    parts: list[np.ndarray] = []
    cx = cy = 0

    def run(pts: np.ndarray, cmd: int):
        nonlocal cx, cy
        head = np.array([(cmd & 0x7) | (len(pts) << 3)], dtype=np.int64)
        prev = np.empty_like(pts)
        prev[0] = (cx, cy)
        prev[1:] = pts[:-1]
        d = pts - prev
        zz = np.empty(2 * len(pts), dtype=np.int64)
        zz[0::2] = d[:, 0]
        zz[1::2] = d[:, 1]
        zz = _zigzag_np(zz).astype(np.int64)
        parts.append(head)
        parts.append(zz)
        cx, cy = int(pts[-1, 0]), int(pts[-1, 1])

    if kind in (POINT, MULTIPOINT):
        run(seqs[0], 1)
    elif kind in (LINESTRING, MULTILINESTRING):
        for line in seqs:
            if len(line) < 2:
                raise kmvt.MvtError(
                    "LineString with fewer than 2 coordinates")
            run(line[:1], 1)
            run(line[1:], 2)
    elif kind in (POLYGON, MULTIPOLYGON):
        # seqs: flat ring list; ring index 0 within each polygon must be
        # CCW-positive in tile space, holes negative (kernel parity);
        # caller passes (ring, is_outer) pairs via _polygon_cmds instead
        raise AssertionError("use _polygon_cmds for polygonal kinds")
    return np.concatenate(parts) if parts else np.zeros(0, dtype=np.int64)


def _polygon_cmds(polys: list[list[np.ndarray]]) -> np.ndarray:
    parts: list[np.ndarray] = []
    cx = cy = 0

    def run(pts: np.ndarray, cmd: int):
        nonlocal cx, cy
        head = np.array([(cmd & 0x7) | (len(pts) << 3)], dtype=np.int64)
        prev = np.empty_like(pts)
        prev[0] = (cx, cy)
        prev[1:] = pts[:-1]
        d = pts - prev
        zz = np.empty(2 * len(pts), dtype=np.int64)
        zz[0::2] = d[:, 0]
        zz[1::2] = d[:, 1]
        parts.append(head)
        parts.append(_zigzag_np(zz).astype(np.int64))
        cx, cy = int(pts[-1, 0]), int(pts[-1, 1])

    close = np.array([(7 & 0x7) | (1 << 3)], dtype=np.int64)
    for rings in polys:
        for ri, ring in enumerate(rings):
            pts = ring
            if len(pts) >= 2 and (pts[0] == pts[-1]).all():
                pts = pts[:-1]
            if len(pts) < 3:
                raise kmvt.MvtError(
                    "ring with fewer than 3 distinct coords")
            area2 = _shoelace2_np(np.vstack([pts, pts[:1]]))
            want_positive = ri == 0
            if (area2 > 0) != want_positive:
                pts = pts[::-1]
            run(pts[:1], 1)
            run(pts[1:], 2)
            parts.append(close)
    return np.concatenate(parts)


def _distinct_len(ring: np.ndarray) -> int:
    if len(ring) >= 2 and (ring[0] == ring[-1]).all():
        return len(ring) - 1
    return len(ring)


def encode_layer_fast(name: str, extent: int, feats: list) -> bytes:
    """feats: list of (fid, props_dict, kind, seqs) where seqs is the
    transformed integer tile-space structure:
    - POINT/MULTIPOINT: [ (n,2) ]
    - LINESTRING/MULTILINESTRING: [ per-line (n,2) ]
    - POLYGON/MULTIPOLYGON: list of polygons, each list of rings
    Returns layer bytes identical to kernel.mvt._encode_layer."""
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    values: list[bytes] = []
    value_idx: dict[bytes, int] = {}

    out = bytearray()
    kmvt._tag(out, 15, 0)
    kmvt._write_varint(out, 2)
    kmvt._write_bytes(out, 1, name.encode("utf-8"))

    # batch-encode all features' command streams at once
    cmd_arrays = []
    metas = []
    for fid, props, kind, seqs in feats:
        if kind in (POLYGON, MULTIPOLYGON):
            cmds = _polygon_cmds(seqs)
            gtype = kmvt.GEOM_POLYGON
        elif kind in (LINESTRING, MULTILINESTRING):
            cmds = _feature_cmds(kind, seqs)
            gtype = kmvt.GEOM_LINESTRING
        else:
            cmds = _feature_cmds(kind, seqs)
            gtype = kmvt.GEOM_POINT
        cmd_arrays.append(cmds)
        metas.append((fid, props, gtype, len(cmds)))
    all_cmds = (np.concatenate(cmd_arrays) if cmd_arrays
                else np.zeros(0, dtype=np.int64))
    blob, nbytes = varints_np(all_cmds)
    byte_off = np.zeros(len(nbytes) + 1, dtype=np.int64)
    np.cumsum(nbytes, out=byte_off[1:])

    ci = 0
    for fid, props, gtype, ncmds in metas:
        fb = bytearray()
        if fid is not None:
            kmvt._tag(fb, 1, 0)
            kmvt._write_varint(fb, fid)
        tags: list[int] = []
        for k, v in props.items():
            if k not in key_idx:
                key_idx[k] = len(keys)
                keys.append(k)
            ev = kmvt._encode_value(v)
            if ev not in value_idx:
                value_idx[ev] = len(values)
                values.append(ev)
            tags.append(key_idx[k])
            tags.append(value_idx[ev])
        if tags:
            packed = bytearray()
            for t in tags:
                kmvt._write_varint(packed, t)
            kmvt._write_bytes(fb, 2, bytes(packed))
        kmvt._tag(fb, 3, 0)
        kmvt._write_varint(fb, gtype)
        span = blob[byte_off[ci]:byte_off[ci + ncmds]]
        kmvt._write_bytes(fb, 4, span)
        ci += ncmds
        kmvt._write_bytes(out, 2, bytes(fb))

    for k in keys:
        kmvt._write_bytes(out, 3, k.encode("utf-8"))
    for v in values:
        kmvt._write_bytes(out, 4, v)
    kmvt._tag(out, 5, 0)
    kmvt._write_varint(out, extent)
    return bytes(out)


def struct_to_tile_seqs(rec: dict, extent: int, left: float,
                        bottom: float, right: float, top: float):
    """Flat 2D geometry struct dict -> (kind, transformed seqs) in tile
    space, enforcing the kernel's validity rules (MvtError on failure).
    Returns None if the struct is not fast-path eligible."""
    kind = rec.get("kind")
    if kind is None or int(kind) not in _FLAT_2D:
        return None
    if rec.get("wkb") is not None or rec.get("has_z") or rec.get("has_m"):
        return None
    coords = rec.get("coords")
    if coords is None:
        return None
    arr = np.asarray(coords, dtype=np.float64)
    if arr.size == 0:
        raise kmvt.MvtError("empty geometry")
    arr = arr.reshape(-1, 2)
    tx, ty = ktiles.mvt_transform_np(arr[:, 0], arr[:, 1], extent,
                                     left, bottom, right, top)
    pts = np.stack([tx.astype(np.int64), ty.astype(np.int64)], axis=1)
    kind = int(kind)
    if kind in (POINT, MULTIPOINT):
        return kind, [pts]
    offs1 = rec.get("offs1")
    if kind == LINESTRING:
        seqs = [pts]
    else:
        o1 = np.asarray(offs1, dtype=np.int64)
        seqs = [pts[o1[i]:o1[i + 1]] for i in range(len(o1) - 1)]
    if kind in (LINESTRING, MULTILINESTRING):
        if any(len(s) < 2 for s in seqs):
            raise kmvt.MvtError("LineString with fewer than 2 coordinates")
        return kind, seqs
    # polygonal: regroup rings into polygons via offs2
    if kind == POLYGON:
        polys = [seqs]
    else:
        o2 = rec.get("offs2")
        o2 = np.asarray(o2, dtype=np.int64)
        polys = [seqs[o2[i]:o2[i + 1]] for i in range(len(o2) - 1)]
    for rings in polys:
        if not rings or any(_distinct_len(r) < 3 for r in rings):
            raise kmvt.MvtError("ring with fewer than 3 distinct coords")
    return kind, polys
