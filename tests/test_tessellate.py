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
        T.tessellate(wkt.decode("LINESTRING(0 0,1 1)"))
    with pytest.raises(T.TessellationError):
        T.ear_clip([(0, 0), (1, 1)])


# --- interior rings (bridged via max-x vertex, Eberly) --------------------

def _check_holes(wkt_str, outer_area, hole_area, n_verts):
    g = wkt.decode(wkt_str)
    v, tris = T.tessellate(g)
    assert len(v) == 3 * n_verts
    assert len(tris) == n_verts - 2  # simple merged chain
    total = sum(_tri_area2(v, t) for t in tris)
    assert all(_tri_area2(v, t) > 0 for t in tris)
    assert total == pytest.approx(2 * (outer_area - hole_area))


def test_donut_square():
    # 10x10 outer, 4x4 hole: merged chain 4+4+2 = 10 vertices
    _check_holes(
        "POLYGON((0 0,10 0,10 10,0 10,0 0),(3 3,3 7,7 7,7 3,3 3))",
        100.0, 16.0, 10)


def test_hole_ccw_input_normalized():
    # hole given CCW (same winding as outer) still subtracts
    _check_holes(
        "POLYGON((0 0,10 0,10 10,0 10,0 0),(3 3,7 3,7 7,3 7,3 3))",
        100.0, 16.0, 10)


def test_hole_near_right_edge():
    _check_holes(
        "POLYGON((0 0,10 0,10 10,0 10,0 0),(8 4,8 6,9 6,9 4,8 4))",
        100.0, 2.0, 10)


def test_two_holes():
    g = wkt.decode(
        "POLYGON((0 0,12 0,12 10,0 10,0 0),"
        "(2 2,2 4,4 4,4 2,2 2),(8 6,8 8,10 8,10 6,8 6))")
    v, tris = T.tessellate(g)
    assert len(v) == 3 * (4 + 4 + 2 + 4 + 2)
    total = sum(_tri_area2(v, t) for t in tris)
    assert all(_tri_area2(v, t) > 0 for t in tris)
    assert total == pytest.approx(2 * (120.0 - 4.0 - 4.0))


def test_triangle_hole_in_concave_outer():
    g = wkt.decode(
        "POLYGON((0 0,8 0,8 8,4 5,0 8,0 0),(2 2,2 3,3 2,2 2))")
    v, tris = T.tessellate(g)
    total = sum(_tri_area2(v, t) for t in tris)
    assert all(_tri_area2(v, t) > 0 for t in tris)
    outer2 = T._area2([(0, 0), (8, 0), (8, 8), (4, 5), (0, 8)])
    assert total == pytest.approx(outer2 - 1.0)


def test_multipolygon_with_holes():
    g = wkt.decode(
        "MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0),(1 1,1 2,2 2,2 1,1 1)),"
        "((10 10,13 10,13 13,10 13,10 10)))")
    v, tris = T.tessellate(g)
    total = sum(_tri_area2(v, t) for t in tris)
    assert all(_tri_area2(v, t) > 0 for t in tris)
    assert total == pytest.approx(2 * ((16.0 - 1.0) + 9.0))


def test_random_donuts_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.integers(2, 30), st.integers(2, 30),
           st.integers(0, 27), st.integers(0, 27),
           st.integers(1, 29), st.integers(1, 29))
    def run(ow, oh, hx, hy, hw, hh):
        # clamp the hole strictly inside the outer rectangle
        hx = min(hx, ow - 2) if ow > 2 else 0
        hy = min(hy, oh - 2) if oh > 2 else 0
        hw = max(1, min(hw, ow - hx - 1))
        hh = max(1, min(hh, oh - hy - 1))
        if hx == 0 or hy == 0:
            return
        outer = [(0, 0), (ow, 0), (ow, oh), (0, oh), (0, 0)]
        hole = [(hx, hy), (hx, hy + hh), (hx + hw, hy + hh),
                (hx + hw, hy), (hx, hy)]
        from geozero_spark.kernel.model import POLYGON, Geom
        g = Geom(POLYGON, [outer, hole])
        v, tris = T.tessellate(g)
        total = sum(_tri_area2(v, t) for t in tris)
        assert all(_tri_area2(v, t) > 0 for t in tris)
        assert total == pytest.approx(2 * (ow * oh - hw * hh))

    run()
