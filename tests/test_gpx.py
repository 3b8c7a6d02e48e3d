"""GPX reader parity (geozero/tests/gpx.rs event expectations)."""

import pytest

from geozero_spark.kernel import gpx, wkt

WIKIPEDIA = """<?xml version="1.0" encoding="UTF-8"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1">
  <trk><name>Example GPX Document</name>
    <trkseg>
      <trkpt lat="47.644548" lon="-122.326897"><ele>4.46</ele></trkpt>
      <trkpt lat="47.644548" lon="-122.326897"><ele>4.94</ele></trkpt>
      <trkpt lat="47.644548" lon="-122.326897"><ele>6.87</ele></trkpt>
    </trkseg>
  </trk>
</gpx>"""


def test_wikipedia_example_structure():
    # gpx.rs test_wikipedia_example: GC( MLS( LS(3 x same point) ) )
    g = gpx.decode(WIKIPEDIA)
    assert wkt.encode(g) == (
        "GEOMETRYCOLLECTION(MULTILINESTRING(("
        "-122.326897 47.644548,-122.326897 47.644548,"
        "-122.326897 47.644548)))")


def test_waypoints_tracks_routes_order():
    doc = """<gpx version="1.0">
      <wpt lat="1" lon="2"/>
      <wpt lat="3" lon="4"/>
      <rte><rtept lat="10" lon="20"/><rtept lat="11" lon="21"/></rte>
      <trk><trkseg>
        <trkpt lat="5" lon="6"/><trkpt lat="7" lon="8"/>
      </trkseg></trk>
    </gpx>"""
    g = gpx.decode(doc)
    # order: waypoints, tracks, routes (gpx_reader.rs:38-41)
    assert wkt.encode(g) == (
        "GEOMETRYCOLLECTION(POINT(2 1),POINT(4 3),"
        "MULTILINESTRING((6 5,8 7)),"
        "MULTILINESTRING((20 10,21 11)))")


def test_empty_and_invalid():
    with pytest.raises(gpx.GpxError):
        gpx.decode("")
    with pytest.raises(gpx.GpxError):
        gpx.decode("<notgpx/>")
    g = gpx.decode('<gpx version="1.1"></gpx>')
    assert g.is_empty()
    # empty track segments skipped entirely
    g = gpx.decode('<gpx><trk><trkseg/></trk></gpx>')
    assert g.is_empty()
