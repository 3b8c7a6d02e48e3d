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


def test_nzl_feature_collection_to_wkt():
    """geojson_reader.rs:353-383 — FeatureCollection MultiPolygon to
    byte-identical WKT."""
    import json
    import os
    nzl = {
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "properties": {"id": "NZL", "name": "New Zealand"},
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [[[
                    [173.020375, -40.919052], [173.247234, -41.331999],
                    [173.958405, -40.926701], [174.247587, -41.349155],
                    [174.248517, -41.770008], [173.876447, -42.233184],
                    [173.22274, -42.970038], [172.711246, -43.372288],
                    [173.080113, -43.853344], [172.308584, -43.865694],
                    [171.452925, -44.242519], [171.185138, -44.897104],
                    [170.616697, -45.908929], [169.831422, -46.355775],
                    [169.332331, -46.641235], [168.411354, -46.619945],
                    [167.763745, -46.290197], [166.676886, -46.219917],
                    [166.509144, -45.852705], [167.046424, -45.110941],
                    [168.303763, -44.123973], [168.949409, -43.935819],
                    [169.667815, -43.555326], [170.52492, -43.031688],
                    [171.12509, -42.512754], [171.569714, -41.767424],
                    [171.948709, -41.514417], [172.097227, -40.956104],
                    [172.79858, -40.493962], [173.020375, -40.919052]
                ]], [[
                    [174.612009, -36.156397], [175.336616, -37.209098],
                    [175.357596, -36.526194], [175.808887, -36.798942],
                    [175.95849, -37.555382], [176.763195, -37.881253],
                    [177.438813, -37.961248], [178.010354, -37.579825],
                    [178.517094, -37.695373], [178.274731, -38.582813],
                    [177.97046, -39.166343], [177.206993, -39.145776],
                    [176.939981, -39.449736], [177.032946, -39.879943],
                    [176.885824, -40.065978], [176.508017, -40.604808],
                    [176.01244, -41.289624], [175.239567, -41.688308],
                    [175.067898, -41.425895], [174.650973, -41.281821],
                    [175.22763, -40.459236], [174.900157, -39.908933],
                    [173.824047, -39.508854], [173.852262, -39.146602],
                    [174.574802, -38.797683], [174.743474, -38.027808],
                    [174.697017, -37.381129], [174.292028, -36.711092],
                    [174.319004, -36.534824], [173.840997, -36.121981],
                    [173.054171, -35.237125], [172.636005, -34.529107],
                    [173.007042, -34.450662], [173.551298, -35.006183],
                    [174.32939, -35.265496], [174.612009, -36.156397]
                ]]]
            }
        }]
    }
    g = geojson.from_obj(nzl["features"][0]["geometry"])
    w = wkt.encode(g)
    assert w.startswith(
        "MULTIPOLYGON(((173.020375 -40.919052,173.247234 -41.331999,")
    assert w.endswith(
        "174.32939 -35.265496,174.612009 -36.156397)))")
    assert "((174.612009 -36.156397,175.336616 -37.209098," in w


def _places_wkts():
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "data", "places.json")
    with open(path) as f:
        fc = json.load(f)
    return [wkt.encode(geojson.from_obj(feat["geometry"]))
            for feat in fc["features"]]


def test_places_json_file_to_wkt():
    """geojson_reader.rs:414-446 — places.json first/last 100 chars of
    the comma-joined WKT stream."""
    joined = ",".join(_places_wkts())
    assert joined[:100] == (
        "POINT(32.533299524864844 0.583299105614628),"
        "POINT(30.27500161597942 0.671004121125236),POINT(15.7989")
    assert joined[-100:] == (
        "06510862875),POINT(103.85387481909902 1.294979325105942),"
        "POINT(114.18306345846304 22.30692675357551)")


def test_places_json_to_svg_tail():
    """geojson_reader.rs:448-465 — ProcessToSvg over places.json."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "data", "places.json")
    with open(path) as f:
        fc = json.load(f)
    geoms = [geojson.from_obj(feat["geometry"]) for feat in fc["features"]]
    doc = svg.document([svg.encode(g, invert_y=False) for g in geoms])
    assert doc.endswith(
        '387481909902 1.294979325105942 Z"/>\n'
        '<path d="M 114.18306345846304 22.30692675357551 Z"/>\n'
        "</g>\n</svg>")
