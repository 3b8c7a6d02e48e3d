"""Dialect-dual SQL == kernel math (DuckDB side; Spark side covered by
tests/test_spark_layer.py against a live session)."""

import duckdb
import numpy as np
import pytest

from geozero_spark.functions import sqlgen as sg
from geozero_spark.kernel import cells, tiles


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE pts AS SELECT * FROM (SELECT unnest(?) lon, unnest(?) lat)",
        params=[lon.tolist(), lat.tolist()])
    return con, lon, lat


@pytest.mark.parametrize("res", [0, 4, 8, 15, 29])
def test_cell_id_matches_kernel(pts, res):
    con, lon, lat = pts
    e = sg.cell_id("lon", "lat", res, sg.DUCKDB)
    got = np.array([r[0] for r in con.sql(f"SELECT {e} FROM pts").fetchall()])
    assert (got == cells.cell_id_np(lon, lat, res)).all()


@pytest.mark.parametrize("z", [0, 3, 7])
def test_tiles_and_quadkey_match_kernel(pts, z):
    con, lon, lat = pts
    ex, ey = sg.tile_xy_eq("lon", "lat", z)
    wx, wy = sg.tile_xy_wm("lon", "lat", z)
    qk = sg.quadkey(ex, ey, z, sg.DUCKDB)
    rows = con.sql(f"SELECT {ex}, {ey}, {wx}, {wy}, {qk} FROM pts").fetchall()
    for (gx, gy, gwx, gwy, gqk), lo, la in zip(rows, lon, lat):
        assert (gx, gy) == tiles.tile_xy_eq(lo, la, z)
        assert (gwx, gwy) == tiles.tile_xy_wm(lo, la, z)
        assert gqk == tiles.quadkey(z, gx, gy)


def test_parent_and_range_prune_interval(pts):
    con, lon, lat = pts
    e8 = sg.cell_id("lon", "lat", 8, sg.DUCKDB)
    par = sg.cell_parent(e8, 8, 3, sg.DUCKDB)
    lo_, hi_ = sg.cell_range(par, 5, 8, sg.DUCKDB)
    for c8, p, lo2, hi2 in con.sql(
            f"SELECT {e8}, {par}, {lo_}, {hi_} FROM pts").fetchall():
        assert p == cells.parent(c8, 3)
        assert (lo2, hi2) == cells.cell_range(p, 8)
        assert lo2 <= c8 <= hi2


def test_poles_and_dateline_clamp(pts):
    con, _, _ = pts
    e = sg.cell_id("lon", "lat", 6, sg.DUCKDB)
    for lon_, lat_ in [(-180.0, -90.0), (180.0, 90.0), (179.999, 89.999),
                       (0.0, 0.0)]:
        got = con.sql(
            f"SELECT {e} FROM (SELECT {lon_}e0 lon, {lat_}e0 lat)").fetchone()[0]
        assert got == cells.cell_id(lon_, lat_, 6)
