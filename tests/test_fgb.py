"""FlatGeobuf reader parity, pinned against the reference's own
countries.fgb fixture and its benchmark expectations
(geozero-bench/benches/geobench.rs: 179 features full scan; bbox
(8.8,47.2,9.5,55.3) -> 6 features)."""

import os

import pytest

from geozero_spark.kernel import fgb, wkt as kwkt
from geozero_spark.kernel.model import MULTIPOLYGON

FIX = os.path.join(os.path.dirname(__file__), "data", "fgb",
                   "countries.fgb")
BBOX = (8.8, 47.2, 9.5, 55.3)


def _buf():
    with open(FIX, "rb") as f:
        return f.read()


def test_header():
    info = fgb.read_info(_buf())
    assert info.name == "countries"
    assert info.geometry_type == 6          # MultiPolygon
    assert info.features_count == 179
    assert info.index_node_size == 16
    assert info.srid == 4326
    assert [c[0] for c in info.columns] == ["id", "name"]
    assert info.envelope[0] == -180.0 and info.envelope[2] == 180.0


def test_full_scan_179_multipolygons():
    feats = list(fgb.iter_features(_buf()))
    assert len(feats) == 179
    assert all(g.kind == MULTIPOLYGON for g, _ in feats)
    assert all(g.srid == 4326 for g, _ in feats)
    names = {p["name"] for _, p in feats}
    assert {"Antarctica", "Germany", "France", "Fiji"} <= names
    # geometry round-trips through the shared model/WKT writer
    w = kwkt.encode(feats[0][0])
    assert w.startswith("MULTIPOLYGON(((")


def test_bbox_select_matches_reference_count():
    hits = list(fgb.iter_features(_buf(), bbox=BBOX))
    assert len(hits) == 6
    assert sorted(p["id"] for _, p in hits) == [
        "AUT", "CHE", "DEU", "DNK", "FRA", "RUS"]


def test_index_search_equals_brute_force_envelopes():
    """The R-tree search must return exactly the features whose
    envelope intersects the bbox — for several probe boxes."""
    buf = _buf()

    def envelope(g):
        xs, ys = [], []
        for poly in g.data:
            for ring in poly:
                for c in ring:
                    xs.append(c[0])
                    ys.append(c[1])
        return min(xs), min(ys), max(xs), max(ys)

    all_feats = list(fgb.iter_features(buf))
    for bbox in (BBOX, (-180.0, -90.0, 180.0, 90.0),
                 (0.0, 0.0, 1.0, 1.0), (170.0, 60.0, 180.0, 80.0),
                 (500.0, 500.0, 501.0, 501.0)):
        want = sorted(
            p["id"] for g, p in all_feats
            if (lambda e: not (e[2] < bbox[0] or e[3] < bbox[1]
                               or e[0] > bbox[2] or e[1] > bbox[3]))(
                envelope(g)))
        got = sorted(p["id"]
                     for _, p in fgb.iter_features(buf, bbox=bbox))
        assert got == want, bbox


def test_error_paths():
    with pytest.raises(fgb.FgbError, match="magic"):
        fgb.read_info(b"nope nope nope")
    with pytest.raises(fgb.FgbError):
        fgb.read_info(_buf()[:20])


def test_read_fgb_spark(spark):
    from geozero_spark.sources import readers
    d = os.path.dirname(FIX)
    df = readers.read_fgb(spark, d)
    rows = df.collect()
    assert len(rows) == 179
    assert all(r.geom.kind == MULTIPOLYGON for r in rows)
    assert all(r.geom.srid == 4326 for r in rows)
    byname = {r.props["name"]: r for r in rows}
    assert "Germany" in byname and "Fiji" in byname

    hits = readers.read_fgb(spark, d, bbox=BBOX).collect()
    assert sorted(r.props["id"] for r in hits) == [
        "AUT", "CHE", "DEU", "DNK", "FRA", "RUS"]
    assert [r.feature_idx for r in hits] == list(range(6))


def test_bbox_fallback_without_index(monkeypatch):
    """bbox query on an unindexed file = sequential scan + envelope
    filter, same result set as the R-tree search (no hard failure)."""
    import dataclasses

    buf = _buf()
    bbox = (8.8, 47.2, 9.5, 55.3)
    indexed = [p.get("name") for g, p in fgb.iter_features(buf, bbox)]

    real_read_info = fgb.read_info

    def no_index(b):
        return dataclasses.replace(real_read_info(b), index_node_size=0)

    monkeypatch.setattr(fgb, "read_info", no_index)
    fallback = [p.get("name") for g, p in fgb.iter_features(buf, bbox)]
    assert sorted(fallback) == sorted(indexed) and len(indexed) == 6


def test_zm_files_refused_loudly():
    import dataclasses

    buf = _buf()
    real = fgb.read_info(buf)
    import pytest as _pytest
    for field in ("has_z", "has_m"):
        info3d = dataclasses.replace(real, **{field: True})
        orig = fgb.read_info
        try:
            fgb.read_info = lambda b: info3d
            with _pytest.raises(fgb.FgbError, match="Z/M"):
                list(fgb.iter_features(buf))
        finally:
            fgb.read_info = orig
