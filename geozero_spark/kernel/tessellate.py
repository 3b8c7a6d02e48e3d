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
                   for j in idx
                   if j not in (i0, i1, i2)
                   and pts[j] not in (a, b, c)):
                # bridge duplicates (hole merging) sit exactly on ear
                # edges; a coincident vertex never blocks the ear
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


def _open(ring) -> list[tuple[float, float]]:
    pts = [tuple(c[:2]) for c in ring]
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    return pts


def _bridge_one(poly: list, hole: list) -> list:
    """Splice one hole (CW, open) into the outer chain (CCW, open) via
    the max-x vertex / rightward-ray bridge (the classic hole
    elimination lyon's FillTessellator subsumes; parity target
    geozero/src/tessellator/mod.rs:38-96 interior-ring handling)."""
    mi = max(range(len(hole)), key=lambda i: (hole[i][0], hole[i][1]))
    mx, my = hole[mi]
    # closest intersection of the +x ray from M with an outer edge
    best_x = None
    best_edge = None
    n = len(poly)
    for i in range(n):
        p1, p2 = poly[i], poly[(i + 1) % n]
        if (p1[1] > my) == (p2[1] > my):
            continue
        x = p1[0] + (my - p1[1]) * (p2[0] - p1[0]) / (p2[1] - p1[1])
        if x >= mx and (best_x is None or x < best_x):
            best_x, best_edge = x, i
    if best_edge is None:
        raise TessellationError("hole vertex sees no outer edge "
                                "(hole outside the outer ring?)")
    i1, i2 = best_edge, (best_edge + 1) % n
    cand = i1 if poly[i1][0] > poly[i2][0] else i2
    # Eberly refinement: if a reflex outer vertex lies inside the
    # triangle (M, I, P), bridge to the one with the smallest angle to
    # the ray (closest x on tie) so the bridge segment stays interior
    I = (best_x, my)
    P = poly[cand]
    best_tan = None
    for j in range(n):
        q = poly[j]
        if q in (P, I) or q[0] < mx:
            continue
        prv, nxt = poly[(j - 1) % n], poly[(j + 1) % n]
        if _cross(prv, q, nxt) > 0:  # convex in CCW chain
            continue
        if not _point_in_tri(q, (mx, my), I, P):
            continue
        dx, dy = q[0] - mx, abs(q[1] - my)
        tan = dy / dx if dx > 0 else float("inf")
        if (best_tan is None or tan < best_tan
                or (tan == best_tan and q[0] < poly[cand][0])):
            best_tan = tan
            cand = j
            P = q
    # merged CCW chain: outer up to P, bridge to M, CW around the hole
    # back to M, bridge back to P, rest of the outer
    hole_cycle = [hole[(mi + k) % len(hole)] for k in range(len(hole))]
    return (poly[:cand + 1] + [hole[mi]] + hole_cycle[1:][::-1]
            + [hole[mi], poly[cand]] + poly[cand + 1:])


def merge_holes(rings) -> list[tuple[float, float]]:
    """Outer ring + interior rings -> one simple CCW chain with bridge
    duplicates, ready for ear_clip."""
    outer = _open(rings[0])
    if _area2(outer) < 0:
        outer = outer[::-1]
    holes = []
    for r in rings[1:]:
        h = _open(r)
        if len(h) < 3:
            raise TessellationError("hole with fewer than 3 coords")
        if _area2(h) < 0:  # store CCW, _bridge_one walks it reversed
            h = h[::-1]
        holes.append(h)
    holes.sort(key=lambda h: max(p[0] for p in h), reverse=True)
    merged = outer
    for h in holes:
        merged = _bridge_one(merged, h)
    return merged


def tessellate(g: Geom):
    """Geom -> (vertices, triangles): flat [x0,y0,z0,x1,...] float list
    + index triples, VertexOutput-shaped (tessellator/mod.rs:13-17).
    Multi-polygons concatenate with per-part index offsets; interior
    rings are bridged into the outer chain (max-x bridging) and ear-
    clipped, preserving filled area = outer - holes."""
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
        ring = merge_holes(rings) if len(rings) > 1 else _open(rings[0])
        for x, y in ring:
            vertices.extend((float(x), float(y), 0.0))
        for i0, i1, i2 in ear_clip(ring):
            triangles.append((i0 + offset, i1 + offset, i2 + offset))
        offset += len(ring)
    return vertices, triangles
