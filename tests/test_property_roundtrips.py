"""Property-based codec roundtrips (hypothesis) — stronger than the
reference's fixture-only strategy (SURVEY.md §5 item 7: geozero has no
randomized testing; we add it on top of the fixture parity suite)."""

from hypothesis import given, settings, strategies as st

from geozero_spark.kernel import geojson, structrepr as sr, wkb, wkt
from geozero_spark.kernel.model import (LINESTRING, MULTILINESTRING,
                                        MULTIPOINT, MULTIPOLYGON, POINT,
                                        POLYGON, Geom)

# finite doubles that survive text roundtrips exactly. Signed zero is
# normalized: JSON "-0" parses as integer 0 (sign lost) — the reference
# has the same behavior through serde_json, so -0.0 is out of contract.
coord = st.floats(min_value=-1e15, max_value=1e15,
                  allow_nan=False, allow_infinity=False).map(
    lambda v: v + 0.0)
xy = st.tuples(coord, coord)


def ring(min_size=4):
    return st.lists(xy, min_size=min_size, max_size=8).map(
        lambda pts: pts + [pts[0]])


geom_strategy = st.one_of(
    xy.map(lambda c: Geom(POINT, c)),
    st.lists(xy, min_size=2, max_size=10).map(
        lambda c: Geom(LINESTRING, c)),
    st.lists(xy, min_size=1, max_size=6).map(
        lambda c: Geom(MULTIPOINT, c)),
    st.lists(st.lists(xy, min_size=2, max_size=6), min_size=1,
             max_size=4).map(lambda ls: Geom(MULTILINESTRING, ls)),
    st.lists(ring(), min_size=1, max_size=3).map(
        lambda rs: Geom(POLYGON, rs)),
    st.lists(st.lists(ring(), min_size=1, max_size=2), min_size=1,
             max_size=3).map(lambda ps: Geom(MULTIPOLYGON, ps)),
)


@settings(max_examples=150, deadline=None)
@given(geom_strategy)
def test_wkt_roundtrip(g):
    assert wkt.encode(wkt.decode(wkt.encode(g))) == wkt.encode(g)


@settings(max_examples=150, deadline=None)
@given(geom_strategy, st.sampled_from(["wkb", "ewkb", "gpkg", "mysql"]))
def test_wkb_roundtrip_byte_exact(g, dialect):
    if dialect in ("ewkb", "gpkg", "mysql"):
        g.srid = 4326
    blob = wkb.encode(g, dialect=dialect)
    g2 = wkb.decode(blob, dialect=dialect)
    assert wkb.encode(g2, dialect=dialect) == blob
    assert wkt.encode(g2) == wkt.encode(g)


@settings(max_examples=150, deadline=None)
@given(geom_strategy)
def test_geojson_roundtrip(g):
    j = geojson.encode(g)
    assert geojson.encode(geojson.decode(j)) == j


@settings(max_examples=150, deadline=None)
@given(geom_strategy)
def test_struct_roundtrip(g):
    g2 = sr.from_struct(sr.to_struct(g))
    assert wkt.encode(g2) == wkt.encode(g)


# --- FlatGeobuf writer/reader roundtrip (round 4) --------------------------

# one fixed type per key: mixed-type columns are deliberately coerced
# to strings by the writer's schema unification, which this roundtrip
# test is not about
_props = st.fixed_dictionaries({}, optional={
    "pi": st.integers(min_value=-2**62, max_value=2**62),
    "pf": st.floats(allow_nan=False, allow_infinity=False, width=64),
    "ps": st.text(max_size=20),
    "pb": st.booleans(),
    "pr": st.binary(max_size=16),
})


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(geom_strategy, _props), max_size=12),
       st.booleans())
def test_fgb_write_read_roundtrip(feats, indexed):
    """encode -> iter_features preserves every geometry (via the WKT
    writer) and every property, for random feature sets with and
    without the spatial index."""
    from geozero_spark.kernel import fgb, fgbwrite

    out = fgbwrite.encode(feats, name="prop",
                          index_node_size=16 if indexed else 0)
    back = list(fgb.iter_features(out))
    assert len(back) == len(feats)

    def canon(g, p):
        return (wkt.encode(g),
                sorted((k, repr(v)) for k, v in p.items()))

    assert sorted(canon(g, p) for g, p in back) == \
        sorted(canon(g, p) for g, p in feats)
