"""Shapefile reader parity vs the reference's own fixtures
(geozero/tests/data/shp, expectations from geozero/tests/shp-reader.rs
and src/shp/shp_reader.rs semantics)."""

import os

import pytest

from geozero_spark.kernel import geojson, shp, wkt

DATA = os.path.join(os.path.dirname(__file__), "data", "shp")


def _load(name):
    with open(os.path.join(DATA, f"{name}.shp"), "rb") as f:
        return f.read()


def test_header_line():
    # shp-reader.rs:13-18
    h = shp.read_header(_load("line"))
    assert h["file_length"] == 136
    assert h["shape_type_name"] == "Polyline"
    assert h["bbox"][0] == 1.0 and h["bbox"][2] == 5.0


def test_poly_count_and_geojson_tail():
    # shp-reader.rs:22-27 (10 features) and :62-66 (coordinate text)
    recs = shp.decode_records(_load("poly"))
    assert len(recs) == 10
    assert all(g.kind == 6 for _, g in recs)  # MultiPolygon
    tail = geojson.encode(recs[-1][1])
    assert tail.endswith(
        "[479658.59375,4764670],[479640.09375,4764721],"
        "[479735.90625,4764752],[479750.6875,4764702]]]]}")


def test_point_variants():
    (_, p), = shp.decode_records(_load("point"))
    assert p.kind == 1 and not p.has_z and not p.has_m
    assert p.data == (122.0, 37.0)
    recs = shp.decode_records(_load("pointm"))
    assert all(g.has_m and not g.has_z for _, g in recs)
    assert recs[0][1].data == (160477.9000324604, 5403959.561417906,
                               None, 0.0)
    recs = shp.decode_records(_load("pointz"))
    assert all(g.has_z for _, g in recs)


def test_polyline_always_multi():
    # read_polyline emits MultiLineString even for one part
    (_, g), = shp.decode_records(_load("line"))
    assert g.kind == 5
    assert len(g.data) == 2  # two parts in the fixture
    (_, gm), = shp.decode_records(_load("linem"))
    assert gm.kind == 5 and gm.has_m and not gm.has_z
    (_, gz), = shp.decode_records(_load("linez"))
    assert gz.kind == 5 and gz.has_z


def test_polygon_hole_grouping():
    # detect_polys: CCW parts attach as holes of the preceding outer
    (_, g), = shp.decode_records(_load("polygon_hole"))
    assert g.kind == 6
    assert len(g.data) == 1  # one polygon
    assert len(g.data[0]) == 2  # outer + hole


def test_polygon_variants_decode():
    for name in ("polygon", "polygonm", "polygonz", "multi_polygon"):
        recs = shp.decode_records(_load(name))
        assert recs and all(g is None or g.kind == 6 for _, g in recs)


def test_multipoint_z():
    (_, g), = shp.decode_records(_load("multipointz"))
    assert g.kind == 4 and g.has_z
    # fixture carries an M block of NO_DATA sentinels; passed through
    # as-is (read_multipoint emits values verbatim, shp_reader.rs:170)
    assert g.has_m and g.data[0][3] == -1e38
    assert g.data[0][2] == 72.00995635986328
    # wkt roundtrips through the kernel
    assert wkt.encode(g).startswith("MULTIPOINT")


def test_errors():
    with pytest.raises(shp.ShpError):
        shp.read_header(b"\x00" * 50)
    with pytest.raises(shp.ShpError):
        shp.read_header(b"\x00" * 100)
    buf = _load("point")
    with pytest.raises(shp.ShpError):
        shp.decode_records(buf[:110])


def test_point_writer_roundtrip():
    from geozero_spark.kernel.model import POINT, Geom
    pts = [Geom(POINT, (float(i), float(-i))) for i in range(5)]
    buf = shp.encode(pts)
    h = shp.read_header(buf)
    assert h["shape_type"] == shp.SHP_POINT
    recs = shp.decode_records(buf)
    assert [g.data for _, g in recs] == [(float(i), float(-i))
                                        for i in range(5)]
    assert [r for r, _ in recs] == [1, 2, 3, 4, 5]


def test_dbf_properties_match_reference_expectations():
    """dbase parity on the reference's own poly.dbf: 10 records,
    EAS_ID > 100 for every feature (shp-reader.rs:33-35), AREA
    5268.813 present (shp-reader.rs:104)."""
    from geozero_spark.kernel import dbf
    with open(os.path.join(DATA, "poly.dbf"), "rb") as f:
        recs = dbf.decode_records(f.read())
    assert len(recs) == 10
    assert all(r["EAS_ID"] > 100 for r in recs)
    assert any(r["AREA"] == 5268.813 for r in recs)
    assert all(isinstance(r["PRFEDEA"], str) for r in recs)
    assert all(isinstance(r["EAS_ID"], int) for r in recs)


# --- .shx sidecar index (shx_reader.rs:17-31, reader.rs:209-221) ----------

REF_SHX = "/root/reference/geozero/tests/data/shp"


@pytest.mark.parametrize("name", ["point", "line", "poly", "polygon_hole"])
def test_shx_of_matches_reference_sidecars(name):
    # the reference repo ships real .shx files for these four — our
    # generated sidecar must be byte-identical
    if not os.path.exists(os.path.join(REF_SHX, f"{name}.shx")):
        pytest.skip("reference .shx fixtures unavailable")
    with open(os.path.join(REF_SHX, f"{name}.shx"), "rb") as f:
        ref = f.read()
    assert shp.shx_of(_load(name)) == ref


@pytest.mark.parametrize("name", [
    "point", "line", "poly", "polygon_hole", "multi_polygon",
    "multipointz", "polygonz"])
def test_shx_record_runs_roundtrip(name):
    # carving every record out via the index and decoding the runs
    # must reproduce the sequential whole-file decode exactly
    buf = _load(name)
    idx = shp.read_shx(shp.shx_of(buf))
    seq = shp.decode_records(buf)
    assert len(idx) == len(seq)
    carved = b"".join(buf[o:o + ln] for o, ln in idx)
    runs = shp.decode_record_run(carved)
    assert [r[0] for r in runs] == [r[0] for r in seq]
    for (_, a), (_, b) in zip(runs, seq):
        if a is None or b is None:
            assert a is b
        else:
            assert wkt.encode(a) == wkt.encode(b)
