"""Tessellator semantics: valid triangulation, area preservation."""

import pytest

from geozero_spark.kernel import tessellate as T
from geozero_spark.kernel import wkt


def _tri_area2(v, tri):
    (i, j, k) = tri
    ax, ay = v[3 * i], v[3 * i + 1]
    bx, by = v[3 * j], v[3 * j + 1]
    cx, cy = v[3 * k], v[3 * k + 1]
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _check(wkt_str, expect_tris):
    g = wkt.decode(wkt_str)
    v, tris = T.tessellate(g)
    assert len(tris) == expect_tris
    # every triangle CCW-positive, total area == ring area
    total = sum(_tri_area2(v, t) for t in tris)
    assert all(_tri_area2(v, t) > 0 for t in tris)
    return total


def test_convex_square():
    total = _check("POLYGON((0 0,4 0,4 4,0 4,0 0))", 2)
    assert total == pytest.approx(2 * 16.0)


def test_concave_polygon():
    # L-shape: 6 vertices -> n-2 = 4 triangles, area 3
    total = _check("POLYGON((0 0,2 0,2 1,1 1,1 2,0 2,0 0))", 4)
    assert total == pytest.approx(2 * 3.0)


def test_cw_input_normalized():
    total = _check("POLYGON((0 0,0 4,4 4,4 0,0 0))", 2)  # CW ring
    assert total == pytest.approx(2 * 16.0)


def test_multipolygon_offsets():
    g = wkt.decode("MULTIPOLYGON(((0 0,1 0,0 1,0 0)),((5 5,6 5,5 6,5 5)))")
    v, tris = T.tessellate(g)
    assert len(v) == 18 and len(tris) == 2
    assert tris[1][0] >= 3  # second part indices offset


def test_errors():
    with pytest.raises(T.TessellationError):
        T.tessellate(wkt.decode("POLYGON((0 0,1 0,1 1,0 1,0 0),"
                                "(0.2 0.2,0.4 0.2,0.2 0.4,0.2 0.2))"))
    with pytest.raises(T.TessellationError):
        T.tessellate(wkt.decode("LINESTRING(0 0,1 1)"))
    with pytest.raises(T.TessellationError):
        T.ear_clip([(0, 0), (1, 1)])
