"""GeoJSON reader fixtures mirrored from the reference's tests
(geozero/src/geojson/geojson_reader.rs:305-465)."""

from geozero_spark.kernel import geojson, svg, wkt

LS = ('{"type": "LineString", "coordinates": ['
      '[1875038.447610231,-3269648.6879248763],'
      '[1874359.641504197,-3270196.812984864],'
      '[1874141.0428635243,-3270953.7840121365],'
      '[1874440.1778162003,-3271619.4315206874],'
      '[1876396.0598222911,-3274138.747656357],'
      '[1876442.0805243007,-3275052.60551469],'
      '[1874739.312657555,-3275457.333765534]]}')


def test_linestring_to_wkt_exact():
    # geojson_reader.rs:315-331
    g = geojson.decode(LS)
    assert wkt.encode(g) == (
        "LINESTRING(1875038.447610231 -3269648.6879248763,"
        "1874359.641504197 -3270196.812984864,"
        "1874141.0428635243 -3270953.7840121365,"
        "1874440.1778162003 -3271619.4315206874,"
        "1876396.0598222911 -3274138.747656357,"
        "1876442.0805243007 -3275052.60551469,"
        "1874739.312657555 -3275457.333765534)")


def test_geometries3d():
    # geojson_reader.rs:334-349
    g = geojson.decode(
        '{"type": "LineString", "coordinates": [[1,1,10],[2,2,20]]}')
    assert g.has_z and wkt.encode(g) == "LINESTRING(1 1 10,2 2 20)"
    g = geojson.decode(
        '{"type": "LineString", "coordinates": [[1,1],[2,2]]}')
    assert not g.has_z and wkt.encode(g) == "LINESTRING(1 1,2 2)"


def test_point_conversions():
    # geojson_reader.rs:448-450 + :403-410
    g = geojson.decode('{"type": "Point", "coordinates": [10,20]}')
    assert wkt.encode(g) == "POINT(10 20)"
    assert geojson.encode(g) == '{"type": "Point", "coordinates": [10,20]}'


def test_svg_writer_matches_reference_tail():
    # geojson_reader.rs conversions test: last place in places.json
    g = geojson.decode(
        '{"type": "Point", "coordinates": '
        '[114.18306345846304, 22.30692675357551]}')
    assert svg.encode(g, invert_y=False) == \
        '<path d="M 114.18306345846304 22.30692675357551 Z"/>'
