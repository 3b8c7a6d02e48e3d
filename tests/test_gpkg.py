"""File-level GeoPackage path, pinned against the reference's own
gpkg_test.gpkg fixture and its live-SQLx test expectations
(geozero/tests/geopackage.rs:4-99), with the whole B-tree walker
cross-checked table-by-table against Python's stdlib sqlite3."""

import os
import sqlite3

import pytest

from geozero_spark.kernel import gpkg as kgpkg, wkt as kwkt
from geozero_spark.kernel.sqlitefile import SqliteFile, SqliteError

FIX = os.path.join(os.path.dirname(__file__), "data", "gpkg",
                   "gpkg_test.gpkg")


def _buf():
    with open(FIX, "rb") as f:
        return f.read()


def test_geometry_columns_first_row_matches_reference():
    regs = kgpkg.geometry_tables(_buf())
    first = regs[0]
    # geopackage.rs:19-20 asserts ("pt2d", "geom")
    assert (first["table_name"], first["column_name"]) == ("pt2d",
                                                           "geom")
    assert first["srs_id"] == 4326


def test_pt2d_blob_decodes_to_reference_wkt():
    feats = list(kgpkg.read_features(_buf(), table="pt2d"))
    # geopackage.rs:40 asserts the first geom is POINT(1.1 1.1)
    props, geom = feats[0]
    assert kwkt.encode(geom) == "POINT(1.1 1.1)"
    assert geom.srid == 4326
    assert props["name"] == "alpha"
    # geopackage.rs:82-86: the table has a NULL-geometry row
    assert any(g is None for _, g in feats)
    # rowid-alias ids materialize
    assert [p["id"] for p, _ in feats] == [1, 2, 3, 4]


def test_every_registered_table_decodes_with_declared_dims():
    buf = _buf()
    for reg in kgpkg.geometry_tables(buf):
        feats = list(kgpkg.read_features(buf, table=reg["table_name"]))
        assert feats, reg["table_name"]
        for _, g in feats:
            if g is None:
                continue
            assert g.has_z == bool(reg["z"]), reg["table_name"]
            assert g.has_m == bool(reg["m"]), reg["table_name"]
            assert g.srid == reg["srs_id"]


def test_btree_walker_matches_stdlib_sqlite3():
    db = SqliteFile(_buf())
    con = sqlite3.connect(FIX)
    tabs = db.tables()
    assert "pt2d" in tabs and "gpkg_contents" in tabs
    for t in sorted(tabs):
        want = [tuple(r) for r in
                con.execute(f'SELECT * FROM "{t}"').fetchall()]
        got = [tuple(r.values()) for r in db.rows(t)]
        assert got == want, t


def test_errors():
    with pytest.raises(SqliteError, match="magic"):
        SqliteFile(b"not a database at all")
    db = SqliteFile(_buf())
    with pytest.raises(SqliteError, match="no such table"):
        list(db.rows("nope"))
    with pytest.raises(SqliteError, match="not a registered"):
        list(kgpkg.read_features(_buf(), table="gpkg_contents"))


def test_read_gpkg_spark(spark):
    from geozero_spark.sources import readers
    d = os.path.dirname(FIX)
    rows = readers.read_gpkg(spark, d, table="pt2d").collect()
    assert len(rows) == 4
    by_name = {r.props["name"]: r for r in rows}
    g = by_name["alpha"].geom
    assert (g.kind, g.srid) == (1, 4326)
    assert list(g.coords) == [1.1, 1.1]
    assert by_name["delta"].geom is None


def test_parse_columns_quoted_identifiers():
    """Quoted names with spaces/commas and quoted constraint-words-as-
    column-names must parse whole (a miss here silently yields
    geom=None for every feature of that table)."""
    from geozero_spark.kernel.sqlitefile import SqliteFile as S
    sql = ('CREATE TABLE t ("my geom" BLOB, "a,b" TEXT, '
           '"PRIMARY" INTEGER, id INTEGER PRIMARY KEY, '
           'CONSTRAINT u UNIQUE (id))')
    names, ipk = S.parse_columns(sql)
    assert names == ["my geom", "a,b", "PRIMARY", "id"]
    assert ipk == "id"
    names2, ipk2 = S.parse_columns(
        "CREATE TABLE x (id INTEGER, name TEXT, PRIMARY KEY (id))")
    assert names2 == ["id", "name"] and ipk2 == "id"
