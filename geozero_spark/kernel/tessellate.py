"""Polygon fill tessellation — the reference's Tessellator re-expressed.

geozero's Tessellator (geozero/src/tessellator/mod.rs) feeds geometry
events into lyon's FillTessellator and emits ``vertex(x, y, z)`` +
``triangle(i0, i1, i2)`` callbacks. Triangulations are not unique, so
parity here is *semantic*: a valid triangulation of the same polygon
(n-2 triangles for a simple n-gon, summed signed area equal to the
ring's area). We use classic ear clipping (O(n^2), fine for the
web-zone polygons this engine tiles; holes are not bridged in round 1).
"""

from __future__ import annotations

from .model import MULTIPOLYGON, POLYGON, TRIANGLE, Geom


class TessellationError(ValueError):
    pass


def _area2(ring) -> float:
    s = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[(i + 1) % n][0], ring[(i + 1) % n][1]
        s += x1 * y2 - x2 * y1
    return s


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _point_in_tri(p, a, b, c) -> bool:
    d1 = _cross(p, a, b)
    d2 = _cross(p, b, c)
    d3 = _cross(p, c, a)
    has_neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
    has_pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
    return not (has_neg and has_pos)


def ear_clip(ring) -> list[tuple[int, int, int]]:
    """Triangulate a simple ring (closed or open) into index triples
    over the OPEN ring's vertex list (CCW orientation enforced)."""
    pts = [tuple(c[:2]) for c in ring]
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    n = len(pts)
    if n < 3:
        raise TessellationError("ring with fewer than 3 distinct coords")
    idx = list(range(n))
    if _area2(pts) < 0:  # enforce CCW
        idx.reverse()
    tris: list[tuple[int, int, int]] = []
    guard = 0
    while len(idx) > 3 and guard < 2 * n * n:
        guard += 1
        m = len(idx)
        clipped = False
        for k in range(m):
            i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            a, b, c = pts[i0], pts[i1], pts[i2]
            if _cross(a, b, c) <= 0:  # reflex or degenerate
                continue
            if any(_point_in_tri(pts[j], a, b, c)
                   for j in idx if j not in (i0, i1, i2)):
                continue
            tris.append((i0, i1, i2))
            idx.pop(k)
            clipped = True
            break
        if not clipped:
            raise TessellationError("no ear found (self-intersecting?)")
    if len(idx) == 3:
        tris.append((idx[0], idx[1], idx[2]))
    return tris


def tessellate(g: Geom):
    """Geom -> (vertices, triangles): flat [x0,y0,z0,x1,...] float list
    + index triples, VertexOutput-shaped (tessellator/mod.rs:13-17).
    Multi-polygons concatenate with per-part index offsets; holes are
    rejected (round-1 limitation)."""
    if g.kind in (POLYGON, TRIANGLE):
        parts = [g.data]
    elif g.kind == MULTIPOLYGON:
        parts = g.data
    else:
        raise TessellationError(
            f"tessellate expects polygonal geometry, got {g.kind}")
    vertices: list[float] = []
    triangles: list[tuple[int, int, int]] = []
    offset = 0
    for rings in parts:
        if len(rings) > 1:
            raise TessellationError("holes not supported in round 1")
        ring = [tuple(c[:2]) for c in rings[0]]
        if len(ring) >= 2 and ring[0] == ring[-1]:
            ring = ring[:-1]
        for x, y in ring:
            vertices.extend((float(x), float(y), 0.0))
        for i0, i1, i2 in ear_clip(ring):
            triangles.append((i0 + offset, i1 + offset, i2 + offset))
        offset += len(ring)
    return vertices, triangles
