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


# ---------------------------------------------------------------------------
# batched per-tile path: one transform for ALL features, python command
# building for the (dominant) tiny-geometry case
# ---------------------------------------------------------------------------
#
# Profiling the per-feature pipeline above on the bench tiles showed
# ~36us/feature in struct_to_tile_seqs (a fresh asarray + transform per
# feature) and ~58us/feature in the numpy command builders — all
# numpy-call overhead on 3-5 point geometries. Batching the transform
# per TILE (0.11ms vs 5.1ms per 142-feature tile) and building command
# ints in plain python (2us vs 58us per small feature) keeps the bytes
# identical while removing the per-feature numpy fixed costs. varint
# encoding stays vectorized over the tile's concatenated command
# stream.


def _zz(v: int) -> int:
    # python ints sign-extend on >>, so this is exact zigzag
    return (v << 1) ^ (v >> 63)


def _run_py(cmds: list, cmd: int, xs, ys, s: int, e: int, cx: int,
            cy: int, step: int = 1):
    cmds.append((cmd & 0x7) | ((e - s if step == 1 else s - e) << 3))
    rng = range(s, e, 1) if step == 1 else range(s, e, -1)
    for i in rng:
        x, y = xs[i], ys[i]
        cmds.append(_zz(x - cx))
        cmds.append(_zz(y - cy))
        cx, cy = x, y
    return cx, cy


def _eligible(rec) -> bool:
    if rec is None:
        return True  # handled as skip
    kind = rec.get("kind")
    if kind is None or int(kind) not in _FLAT_2D:
        return False
    if (rec.get("wkb") is not None or rec.get("has_z")
            or rec.get("has_m")):
        return False
    return rec.get("coords") is not None


# below this many features the per-feature python loop beats the
# fixed cost of ~40 whole-tile numpy passes (measured crossover ~50)
_VECTOR_MIN = 64


def _concat_aranges(reps: np.ndarray) -> np.ndarray:
    """[0..reps[0]) ++ [0..reps[1]) ++ ... as one int64 array."""
    total = int(reps.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    cum0 = np.zeros(len(reps), dtype=np.int64)
    np.cumsum(reps[:-1], out=cum0[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(cum0, reps)


def _zz_i64(v: np.ndarray) -> np.ndarray:
    return (v << 1) ^ (v >> 63)


def encode_tile_fast(layer_name: str, extent: int, items: list,
                     left: float, bottom: float, right: float,
                     top: float, props_list: list | None = None):
    """items: [(feature_key, rec_dict_or_None)] in final feature order.
    ``props_list``: optional parallel list of per-feature property
    dicts (typed MVT values); None keeps the default {"id": str(key)}.
    Returns (tile_bytes, n_features, n_skipped) or None if any feature
    is not fast-eligible (caller falls back to the kernel encoder for
    the whole tile). Bytes identical to the kernel path.

    Large tiles build the command stream COLUMNAR: features are
    partitioned into point / linestring / single-ring-polygon classes
    and each class's commands, deltas and zigzags are computed in a
    handful of whole-tile numpy passes scattered into one preallocated
    int64 stream (multi-part kinds keep the per-feature builder,
    written into their slots). Small tiles keep the plain-python
    per-feature loop — the numpy fixed costs only pay off past ~64
    features."""
    # eligibility scan first: the fallback must re-encode everything
    for _, rec in items:
        if rec is not None and not _eligible(rec):
            return None
    n_items = len(items)
    # gather: kinds / coord counts / ring counts + one transform for
    # all coordinates in the tile
    kinds = np.full(n_items, -1, dtype=np.int64)
    lens = np.zeros(n_items, dtype=np.int64)
    nrings = np.ones(n_items, dtype=np.int64)
    coord_arrays = []
    for idx, (_, rec) in enumerate(items):
        if rec is None:
            continue
        kinds[idx] = int(rec["kind"])
        c = np.asarray(rec["coords"], dtype=np.float64)
        coord_arrays.append(c)
        lens[idx] = len(c) >> 1
        o1 = rec.get("offs1")
        if o1 is not None and len(o1) > 1:
            nrings[idx] = len(o1) - 1
    return _encode_gathered(
        layer_name, extent, n_items, kinds, lens, nrings, coord_arrays,
        lambda i: items[i][1], lambda i: items[i][0],
        left, bottom, right, top,
        props_for=(None if props_list is None
                   else lambda i: props_list[i]))


def encode_tile_cols(layer_name: str, extent: int, keys: list,
                     kind_l: list, has_z_l: list, has_m_l: list,
                     coords_l: list, offs1_l: list, offs2_l: list,
                     wkb_l: list, left: float, bottom: float,
                     right: float, top: float,
                     props_list: list | None = None):
    """Column-wise twin of encode_tile_fast: parallel per-feature
    sequences instead of struct dicts, so the Arrow struct -> python
    dict materialization (~several us/row) never happens. An absent
    feature is kind_l[i] is None. Returns the same
    (bytes, n_features, n_skipped), or None for whole-tile kernel
    fallback. Byte-identical to the dict path on equivalent input.
    ``props_list``: optional parallel per-feature property dicts."""
    n_items = len(keys)
    kinds = np.full(n_items, -1, dtype=np.int64)
    lens = np.zeros(n_items, dtype=np.int64)
    nrings = np.ones(n_items, dtype=np.int64)
    coord_arrays = []
    for idx in range(n_items):
        k = kind_l[idx]
        if k is None:
            continue
        k = int(k)
        if (k not in _FLAT_2D or wkb_l[idx] is not None
                or has_z_l[idx] or has_m_l[idx]
                or coords_l[idx] is None):
            return None
        kinds[idx] = k
        c = np.asarray(coords_l[idx], dtype=np.float64)
        coord_arrays.append(c)
        lens[idx] = len(c) >> 1
        o1 = offs1_l[idx]
        if o1 is not None and len(o1) > 1:
            nrings[idx] = len(o1) - 1

    def rec_for(i):
        if kind_l[i] is None:
            return None
        return {"kind": kind_l[i], "has_z": has_z_l[i],
                "has_m": has_m_l[i], "coords": coords_l[i],
                "offs1": offs1_l[i], "offs2": offs2_l[i],
                "wkb": wkb_l[i]}

    return _encode_gathered(
        layer_name, extent, n_items, kinds, lens, nrings, coord_arrays,
        rec_for, lambda i: keys[i], left, bottom, right, top,
        props_for=(None if props_list is None
                   else lambda i: props_list[i]))


def _encode_gathered(layer_name, extent, n_items, kinds, lens, nrings,
                     coord_arrays, rec_for, key_for,
                     left, bottom, right, top, props_for=None):
    if coord_arrays:
        arr = np.concatenate(coord_arrays).reshape(-1, 2)
        tx, ty = ktiles.mvt_transform_np(arr[:, 0], arr[:, 1], extent,
                                         left, bottom, right, top)
        xs = tx.astype(np.int64)
        ys = ty.astype(np.int64)
    else:
        xs = ys = np.zeros(0, dtype=np.int64)
    base = np.zeros(n_items, dtype=np.int64)
    np.cumsum(lens[:-1], out=base[1:])

    if n_items < _VECTOR_MIN:
        xl, yl = xs.tolist(), ys.tolist()
        feats = []  # (fid, props, gtype, cmd_list)
        skipped = 0
        for idx in range(n_items):
            rec = rec_for(idx)
            if rec is None:
                skipped += 1
                continue
            try:
                feats.append(_feature_cmds_py(
                    rec, idx, key_for(idx), xl, yl, int(base[idx]),
                    int(lens[idx]),
                    props=props_for(idx) if props_for else None))
            except kmvt.MvtError:
                skipped += 1
        all_cmds = np.array([c for f in feats for c in f[3]],
                            dtype=np.int64)
        metas = [(fid, props, gtype, len(cmds))
                 for fid, props, gtype, cmds in feats]
        layer = _frame_layer(layer_name, extent, metas, all_cmds)
        out = bytearray()
        kmvt._write_bytes(out, 3, layer)
        return bytes(out), len(metas), skipped

    present = kinds >= 0
    skipped = int(n_items - present.sum())
    empty = present & (lens == 0)
    skipped += int(empty.sum())
    live = present & ~empty
    is_p = live & (kinds == POINT) & (lens == 1)
    is_l = live & (kinds == LINESTRING)
    is_g = live & (kinds == POLYGON) & (nrings == 1)
    is_py = live & ~(is_p | is_l | is_g)

    bad_l = is_l & (lens < 2)
    skipped += int(bad_l.sum())
    is_l &= ~bad_l

    # single-ring polygons: closure trim, min-size, orientation
    gi = np.nonzero(is_g)[0]
    m_full = np.zeros(n_items, dtype=np.int64)
    rev_full = np.zeros(n_items, dtype=bool)
    if len(gi):
        b = base[gi]
        n = lens[gi]
        closed = ((n >= 2) & (xs[b] == xs[b + n - 1])
                  & (ys[b] == ys[b + n - 1]))
        m = n - closed
        ok = m >= 3
        skipped += int((~ok).sum())
        is_g[gi[~ok]] = False
        gi, b, m = gi[ok], b[ok], m[ok]
        if len(gi):
            # shoelace area*2 over ring [b, b+m) per feature
            reps = m - 1
            ar = _concat_aranges(reps)
            i0 = np.repeat(b, reps) + ar
            cross = xs[i0] * ys[i0 + 1] - xs[i0 + 1] * ys[i0]
            seg0 = np.zeros(len(gi), dtype=np.int64)
            np.cumsum(reps[:-1], out=seg0[1:])
            area2 = np.add.reduceat(cross, seg0)
            area2 += xs[b + m - 1] * ys[b] - xs[b] * ys[b + m - 1]
            m_full[gi] = m
            # exterior ring must be CCW-positive; else emit reversed
            rev_full[gi] = ~(area2 > 0)

    # multi-part / unusual kinds: per-feature python builder
    py_feats: dict[int, tuple] = {}
    for idx in np.nonzero(is_py)[0]:
        try:
            py_feats[int(idx)] = _feature_cmds_py(
                rec_for(int(idx)), int(idx), key_for(int(idx)),
                xs, ys, int(base[idx]), int(lens[idx]),
                props=props_for(int(idx)) if props_for else None)
        except kmvt.MvtError:
            skipped += 1
            is_py[idx] = False

    ncmds = np.zeros(n_items, dtype=np.int64)
    ncmds[is_p] = 3
    ncmds[is_l] = 2 * lens[is_l] + 2
    ncmds[is_g] = 2 * m_full[is_g] + 3
    for idx, f in py_feats.items():
        ncmds[idx] = len(f[3])
    keep = is_p | is_l | is_g | is_py
    kept_idx = np.nonzero(keep)[0]
    nc = ncmds[kept_idx]
    offs_full = np.zeros(n_items, dtype=np.int64)
    off_k = np.zeros(len(kept_idx), dtype=np.int64)
    np.cumsum(nc[:-1], out=off_k[1:])
    offs_full[kept_idx] = off_k
    cmds_all = np.zeros(int(nc.sum()), dtype=np.int64)

    pi = np.nonzero(is_p)[0]
    if len(pi):
        o, b = offs_full[pi], base[pi]
        cmds_all[o] = 9  # MoveTo count 1
        cmds_all[o + 1] = _zz_i64(xs[b])
        cmds_all[o + 2] = _zz_i64(ys[b])

    li = np.nonzero(is_l)[0]
    if len(li):
        o, b, n = offs_full[li], base[li], lens[li]
        cmds_all[o] = 9
        cmds_all[o + 1] = _zz_i64(xs[b])
        cmds_all[o + 2] = _zz_i64(ys[b])
        cmds_all[o + 3] = ((n - 1) << 3) | 2  # LineTo count n-1
        reps = n - 1
        ar = _concat_aranges(reps)
        ci = np.repeat(b, reps) + ar + 1
        slot = np.repeat(o + 4, reps) + 2 * ar
        cmds_all[slot] = _zz_i64(xs[ci] - xs[ci - 1])
        cmds_all[slot + 1] = _zz_i64(ys[ci] - ys[ci - 1])

    for reverse in (False, True):
        sub = np.nonzero(is_g & (rev_full == reverse))[0]
        if not len(sub):
            continue
        o, mm = offs_full[sub], m_full[sub]
        start = base[sub] if not reverse else base[sub] + mm - 1
        cmds_all[o] = 9
        cmds_all[o + 1] = _zz_i64(xs[start])
        cmds_all[o + 2] = _zz_i64(ys[start])
        cmds_all[o + 3] = ((mm - 1) << 3) | 2
        reps = mm - 1
        ar = _concat_aranges(reps)
        slot = np.repeat(o + 4, reps) + 2 * ar
        if not reverse:
            ci = np.repeat(start, reps) + ar + 1
            cmds_all[slot] = _zz_i64(xs[ci] - xs[ci - 1])
            cmds_all[slot + 1] = _zz_i64(ys[ci] - ys[ci - 1])
        else:
            ci = np.repeat(start, reps) - ar - 1
            cmds_all[slot] = _zz_i64(xs[ci] - xs[ci + 1])
            cmds_all[slot + 1] = _zz_i64(ys[ci] - ys[ci + 1])
        cmds_all[o + 2 * mm + 2] = 15  # ClosePath

    for idx, f in py_feats.items():
        o = int(offs_full[idx])
        cmds_all[o:o + len(f[3])] = f[3]

    # gtype follows the kind class (same mapping as _feature_cmds_py)
    kk = kinds[kept_idx]
    gtypes = np.where(
        np.isin(kk, (POINT, MULTIPOINT)), kmvt.GEOM_POINT,
        np.where(np.isin(kk, (LINESTRING, MULTILINESTRING)),
                 kmvt.GEOM_LINESTRING, kmvt.GEOM_POLYGON))
    if props_for is None:
        # every kept feature (python-built ones included) carries
        # exactly {"id": str(key)} and fid = item index, so the
        # single-key columnar framer applies
        key_strs = [str(key_for(int(i))) for i in kept_idx]
        layer = _frame_layer_cols(layer_name, extent,
                                  kept_idx.astype(np.int64), key_strs,
                                  gtypes, ncmds[kept_idx], cmds_all)
    else:
        # typed per-feature props: the command stream stays columnar;
        # framing goes through the general key/value-dedup framer
        # (byte-identical to the kernel encoder's tag assembly,
        # mvt_writer.rs:357-401 semantics)
        metas = [(int(i), props_for(int(i)), int(g), int(ncmds[i]))
                 for i, g in zip(kept_idx, gtypes)]
        layer = _frame_layer(layer_name, extent, metas, cmds_all)
    out = bytearray()
    kmvt._write_bytes(out, 3, layer)
    return bytes(out), len(kept_idx), skipped


def _feature_cmds_py(rec, fid, key, xs, ys, base, n, props=None):
    kind = int(rec["kind"])
    if n == 0:
        raise kmvt.MvtError("empty geometry")
    if props is None:
        props = {"id": str(key)}
    if kind in (POINT, MULTIPOINT):
        cmds: list[int] = []
        _run_py(cmds, 1, xs, ys, base, base + n, 0, 0)
        return fid, props, kmvt.GEOM_POINT, cmds
    o1 = rec.get("offs1")
    if kind == LINESTRING:
        lines = [(base, base + n)]
    elif kind == MULTILINESTRING:
        lines = [(base + int(o1[i]), base + int(o1[i + 1]))
                 for i in range(len(o1) - 1)]
    else:
        lines = None
    if lines is not None:
        if any(e - s < 2 for s, e in lines):
            raise kmvt.MvtError("LineString with fewer than 2 coordinates")
        cmds = []
        cx = cy = 0
        for s, e in lines:
            cx, cy = _run_py(cmds, 1, xs, ys, s, s + 1, cx, cy)
            cx, cy = _run_py(cmds, 2, xs, ys, s + 1, e, cx, cy)
        return fid, props, kmvt.GEOM_LINESTRING, cmds
    # polygonal
    rings = [(base + int(o1[i]), base + int(o1[i + 1]))
             for i in range(len(o1) - 1)]
    if kind == POLYGON:
        polys = [rings]
    else:
        o2 = rec["offs2"]
        polys = [rings[int(o2[i]):int(o2[i + 1])]
                 for i in range(len(o2) - 1)]
    # validate + normalize first (a later bad ring skips the feature
    # before any emission — kernel parity)
    norm = []
    for rings_of in polys:
        if not rings_of:
            raise kmvt.MvtError("ring with fewer than 3 distinct coords")
        nr = []
        for ri, (s, e) in enumerate(rings_of):
            if e - s >= 2 and xs[s] == xs[e - 1] and ys[s] == ys[e - 1]:
                e -= 1
            if e - s < 3:
                raise kmvt.MvtError("ring with fewer than 3 distinct coords")
            area2 = 0
            px, py = xs[e - 1], ys[e - 1]
            for i in range(s, e):
                x, y = xs[i], ys[i]
                area2 += px * y - x * py
                px, py = x, y
            want_positive = ri == 0
            nr.append((s, e, (area2 > 0) != want_positive))
        norm.append(nr)
    cmds = []
    cx = cy = 0
    for nr in norm:
        for s, e, rev in nr:
            if not rev:
                cx, cy = _run_py(cmds, 1, xs, ys, s, s + 1, cx, cy)
                cx, cy = _run_py(cmds, 2, xs, ys, s + 1, e, cx, cy)
            else:
                cx, cy = _run_py(cmds, 1, xs, ys, e - 1, e - 2, cx, cy,
                                 step=-1)
                cx, cy = _run_py(cmds, 2, xs, ys, e - 2, s - 1, cx, cy,
                                 step=-1)
            cmds.append((7 & 0x7) | (1 << 3))
    return fid, props, kmvt.GEOM_POLYGON, cmds


def _frame_layer_cols(name: str, extent: int, fids: np.ndarray,
                      key_strs: list, gtypes: np.ndarray,
                      ncmds: np.ndarray, all_cmds: np.ndarray) -> bytes:
    """Columnar layer framing for the canonical props pattern
    (every feature carries exactly {"id": str(key)}): all varints are
    batch-encoded and the feature messages are assembled with one
    byte-gather instead of per-feature bytearray building. Byte-
    identical to _frame_layer on the same input."""
    n = len(fids)
    out = bytearray()
    kmvt._tag(out, 15, 0)
    kmvt._write_varint(out, 2)
    kmvt._write_bytes(out, 1, name.encode("utf-8"))

    # values table: first-occurrence dedup over the id strings
    vidx: dict = {}
    value_ids = np.empty(n, dtype=np.int64)
    enc_values: list[bytes] = []
    for i, s in enumerate(key_strs):
        j = vidx.get(s)
        if j is None:
            j = len(enc_values)
            vidx[s] = j
            vb = bytearray()
            kmvt._write_bytes(vb, 1, s.encode("utf-8"))
            enc_values.append(bytes(vb))
        value_ids[i] = j

    cmd_blob, cmd_nbytes = varints_np(all_cmds)
    cmd_src = np.frombuffer(cmd_blob, dtype=np.uint8)
    cmd_off = np.zeros(len(cmd_nbytes) + 1, dtype=np.int64)
    np.cumsum(cmd_nbytes, out=cmd_off[1:])
    nco = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(ncmds, out=nco[1:])
    geom_start = cmd_off[nco[:-1]]
    geom_len = cmd_off[nco[1:]] - geom_start

    fid_blob, fid_len = varints_np(fids)
    val_blob, val_len = varints_np(value_ids)
    gl_blob, gl_len = varints_np(geom_len)
    taglen_b = (1 + val_len).astype(np.uint8)  # tags = 0x00 + varint(v)
    gtype_b = gtypes.astype(np.uint8)

    body_len = ((1 + fid_len) + (3 + val_len) + 2
                + (1 + gl_len + geom_len))
    bl_blob, bl_len = varints_np(body_len)

    feat_total = 1 + bl_len + body_len
    feat_out = np.zeros(n, dtype=np.int64)
    np.cumsum(feat_total[:-1], out=feat_out[1:])
    buf = np.zeros(int(feat_total.sum()), dtype=np.uint8)

    acc = np.zeros(n, dtype=np.int64)

    def put_const(byte: int):
        nonlocal acc
        buf[feat_out + acc] = byte
        acc = acc + 1

    def put_bytes1(vals: np.ndarray):
        nonlocal acc
        buf[feat_out + acc] = vals
        acc = acc + 1

    def put_varints(blob: bytes, lens: np.ndarray):
        nonlocal acc
        if len(blob):
            idx = (np.repeat(feat_out + acc, lens)
                   + _concat_aranges(lens))
            buf[idx] = np.frombuffer(blob, dtype=np.uint8)
        acc = acc + lens

    put_const(0x12)               # layer field 2 (feature), wire 2
    put_varints(bl_blob, bl_len)  # body length
    put_const(0x08)               # field 1 (id)
    put_varints(fid_blob, fid_len)
    put_const(0x12)               # field 2 (tags), wire 2
    put_bytes1(taglen_b)          # tags byte length (always < 128)
    put_const(0x00)               # key index 0 ("id")
    put_varints(val_blob, val_len)
    put_const(0x18)               # field 3 (type)
    put_bytes1(gtype_b)           # gtype < 128
    put_const(0x22)               # field 4 (geometry), wire 2
    put_varints(gl_blob, gl_len)
    if len(cmd_src):
        idx = (np.repeat(feat_out + acc, geom_len)
               + _concat_aranges(geom_len))
        src = np.repeat(geom_start, geom_len) + _concat_aranges(geom_len)
        buf[idx] = cmd_src[src]
    out.extend(buf.tobytes())

    if n:
        kmvt._write_bytes(out, 3, b"id")
        for v in enc_values:
            kmvt._write_bytes(out, 4, v)
    kmvt._tag(out, 5, 0)
    kmvt._write_varint(out, extent)
    return bytes(out)


def _frame_layer(name: str, extent: int, metas: list,
                 all_cmds: np.ndarray) -> bytes:
    """metas: (fid, props, gtype, ncmds) per kept feature in order;
    all_cmds: the tile's whole command stream. Returns layer bytes
    identical to kernel _encode_layer / encode_layer_fast framing."""
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    values: list[bytes] = []
    value_idx: dict[bytes, int] = {}

    out = bytearray()
    kmvt._tag(out, 15, 0)
    kmvt._write_varint(out, 2)
    kmvt._write_bytes(out, 1, name.encode("utf-8"))

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
