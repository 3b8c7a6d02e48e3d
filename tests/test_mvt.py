"""MVT codec parity against the reference's golden fixture.

``tests/data/tile.mvt`` + ``tile.mvt.txt`` are copied verbatim from
``geozero/tests/data/``; the golden event trace is produced by the
reference's own decoder (geozero/tests/mvt.rs:312-346). We parse the
trace into (property, coords) per feature and require our decoder to
produce the identical stream.
"""

import re
from pathlib import Path

import pytest

from geozero_spark.kernel import mvt, tiles
from geozero_spark.kernel.model import Geom, LINESTRING, MULTIPOINT, POINT, POLYGON

DATA = Path(__file__).parent / "data"


def parse_golden(path: Path):
    """[(layer, [(props, kind, coords)])] from the golden event trace."""
    feats = []
    props = {}
    coords = []
    kind = None
    for line in path.read_text().splitlines():
        line = line.strip()
        m = re.match(r'property 0: (\w+) = String\("(.*)"\)', line)
        if m:
            props[m.group(1)] = m.group(2)
            continue
        m = re.match(r"xy: (-?\d+), (-?\d+), (\d+)", line)
        if m:
            coords.append((int(m.group(1)), int(m.group(2))))
            continue
        if line.startswith("point_begin"):
            kind = "point"
        elif line.startswith("multipoint_begin"):
            kind = "multipoint"
        elif line.startswith("feature_begin"):
            props, coords, kind = {}, [], None
        elif line.startswith("feature_end"):
            feats.append((dict(props), kind, list(coords)))
    return feats


def test_decode_reference_tile_matches_golden_trace():
    tile = mvt.decode_tile((DATA / "tile.mvt").read_bytes())
    assert len(tile.layers) == 1
    layer = tile.layers[0]
    assert layer.name == "cities"
    golden = parse_golden(DATA / "tile.mvt.txt")
    assert len(layer.features) == len(golden) == 68

    for f, (gprops, gkind, gcoords) in zip(layer.features, golden):
        assert f.properties == gprops
        assert f.geom_type == mvt.GEOM_POINT
        if gkind == "point":
            assert len(f.geometry) == 1
            assert f.geometry[0] == gcoords[0]
        else:
            assert f.geometry == gcoords


def test_roundtrip_reference_tile():
    """decode -> re-encode -> decode: identical features."""
    raw = (DATA / "tile.mvt").read_bytes()
    tile = mvt.decode_tile(raw)
    out = mvt.encode_tile(tile)
    tile2 = mvt.decode_tile(out)
    l1, l2 = tile.layers[0], tile2.layers[0]
    assert l1.name == l2.name and l1.extent == l2.extent
    assert len(l1.features) == len(l2.features)
    for a, b in zip(l1.features, l2.features):
        assert a.geometry == b.geometry
        assert a.properties == b.properties
        assert a.geom_type == b.geom_type


# --- ring rewinding (mvt_reader.rs:382-427) ---------------------------------

def _poly_roundtrip(polys):
    f = mvt.MvtFeature(None, mvt.GEOM_POLYGON, polys)
    layer = mvt.MvtLayer(name="t", features=[f])
    out = mvt.encode_tile(mvt.MvtTile([layer]))
    return mvt.decode_tile(out).layers[0].features[0].geometry


def test_ccw_exterior_is_rewound():
    polys = _poly_roundtrip(
        [[[(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)]]])
    assert polys == [[[(10, 0), (10, 10), (0, 10), (0, 0), (10, 0)]]]


def test_ccw_exterior_cw_interior_rewound():
    polys = _poly_roundtrip(
        [[[(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)],
          [(12, 2), (18, 2), (18, 8), (12, 8), (12, 2)]]])
    assert polys == [[[(10, 0), (10, 10), (0, 10), (0, 0), (10, 0)],
                      [(12, 8), (18, 8), (18, 2), (12, 2), (12, 8)]]]


def test_cw_exterior_kept():
    ring = [(10, 0), (10, 10), (0, 10), (0, 0), (10, 0)]
    assert _poly_roundtrip([[ring]]) == [[ring]]


# --- validity (mvt_writer.rs:254-307, 557-583) ------------------------------

def test_too_few_linestring_coords_rejected():
    f = mvt.MvtFeature(None, mvt.GEOM_LINESTRING, [[(0, 0)]])
    with pytest.raises(mvt.MvtError, match="fewer than 2"):
        mvt.encode_tile(mvt.MvtTile([mvt.MvtLayer("t", features=[f])]))


def test_too_few_ring_coords_rejected():
    f = mvt.MvtFeature(None, mvt.GEOM_POLYGON, [[[(0, 0), (1, 1), (0, 0)]]])
    with pytest.raises(mvt.MvtError, match="fewer than 3"):
        mvt.encode_tile(mvt.MvtTile([mvt.MvtLayer("t", features=[f])]))


# --- map->tile transform (tests/mvt.rs:22-40) -------------------------------

def test_transform_example_from_reference():
    # POINT(960000 6002729) @ extent 256,
    # bounds (958826.08, 5987771.04, 978393.96, 6007338.92) -> (15, 61)
    x, y = tiles.mvt_transform(960000.0, 6002729.0, 256,
                               958826.08, 5987771.04, 978393.96, 6007338.92)
    assert (x, y) == (15, 61)


def test_feature_geom_bridge():
    g = Geom(POLYGON, [[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]])
    f = mvt.feature_from_geom(g, {"name": "sq"}, fid=7)
    layer = mvt.MvtLayer("shapes", features=[f])
    tile2 = mvt.decode_tile(mvt.encode_tile(mvt.MvtTile([layer])))
    f2 = tile2.layers[0].features[0]
    assert f2.id == 7 and f2.properties == {"name": "sq"}
    g2 = mvt.geom_from_feature(f2)
    assert g2.kind == POLYGON


def test_multipoint_linestring_roundtrip():
    fs = [
        mvt.MvtFeature(1, mvt.GEOM_POINT, [(5, 5), (7, 9)]),
        mvt.MvtFeature(2, mvt.GEOM_LINESTRING,
                       [[(2, 2), (2, 10)], [(1, 1), (3, 5), (9, 9)]]),
    ]
    tile = mvt.decode_tile(mvt.encode_tile(
        mvt.MvtTile([mvt.MvtLayer("mixed", features=fs)])))
    out = tile.layers[0].features
    assert out[0].geometry == [(5, 5), (7, 9)]
    assert out[1].geometry == [[(2, 2), (2, 10)], [(1, 1), (3, 5), (9, 9)]]


def test_value_types_roundtrip():
    f = mvt.MvtFeature(None, mvt.GEOM_POINT, [(0, 0)],
                       {"s": "x", "i": 42, "d": 2.5, "b": True, "n": -7})
    tile = mvt.decode_tile(mvt.encode_tile(
        mvt.MvtTile([mvt.MvtLayer("v", features=[f])])))
    assert tile.layers[0].features[0].properties == \
        {"s": "x", "i": 42, "d": 2.5, "b": True, "n": -7}
