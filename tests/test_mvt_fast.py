"""mvt_fast must produce BYTE-IDENTICAL layers to the kernel encoder."""

import numpy as np
import pytest

from geozero_spark.kernel import mvt as kmvt
from geozero_spark.kernel import structrepr as sr
from geozero_spark.kernel import tiles as ktiles
from geozero_spark.kernel import wkt
from geozero_spark.operators import mvt_fast

BOUNDS = (-10.0, -5.0, 10.0, 5.0)  # left, bottom, right, top
EXTENT = 4096

GEOMS = [
    "POINT(0 0)",
    "POINT(-9.5 4.9)",
    "MULTIPOINT(1 1,2 2,-3 -3)",
    "LINESTRING(-8 -4,0 0,8 4)",
    "MULTILINESTRING((0 0,1 1),(2 2,3 3,4 4))",
    "POLYGON((-5 -2,5 -2,5 2,-5 2,-5 -2))",                     # CCW
    "POLYGON((-5 -2,-5 2,5 2,5 -2,-5 -2))",                     # CW input
    "POLYGON((-5 -2,5 -2,5 2,-5 2,-5 -2),(-1 -1,1 -1,1 1,-1 1,-1 -1))",
    "MULTIPOLYGON(((0 0,2 0,2 2,0 2,0 0)),((4 4,6 4,6 6,4 6,4 4),"
    "(4.5 4.5,5 4.5,5 5,4.5 5,4.5 4.5)))",
]


def _kernel_layer(geoms_wkt):
    feats = []
    for i, w in enumerate(geoms_wkt):
        g = wkt.decode(w)
        tg = ktiles.transform_geom_to_tile(g, EXTENT, *BOUNDS)
        feats.append(kmvt.feature_from_geom(
            tg, properties={"id": str(i)}, fid=i))
    return kmvt._encode_layer(
        kmvt.MvtLayer(name="layer", extent=EXTENT, features=feats))


def _fast_layer(geoms_wkt):
    feats = []
    for i, w in enumerate(geoms_wkt):
        rec = sr.to_struct(wkt.decode(w))
        r = mvt_fast.struct_to_tile_seqs(rec, EXTENT, *BOUNDS)
        assert r is not None, w
        kind, seqs = r
        feats.append((i, {"id": str(i)}, kind, seqs))
    return mvt_fast.encode_layer_fast("layer", EXTENT, feats)


def test_layer_bytes_identical():
    assert _fast_layer(GEOMS) == _kernel_layer(GEOMS)


def test_each_geom_individually():
    for w in GEOMS:
        assert _fast_layer([w]) == _kernel_layer([w]), w


def test_varints_np_matches_kernel():
    rng = np.random.default_rng(3)
    vals = np.concatenate([
        rng.integers(0, 128, 50), rng.integers(128, 1 << 14, 50),
        rng.integers(1 << 14, 1 << 35, 50),
        np.array([0, 1, 127, 128, 16383, 16384, 2 ** 63 - 1])])
    blob, lens = mvt_fast.varints_np(vals)
    ref = bytearray()
    for v in vals:
        kmvt._write_varint(ref, int(v))
    assert blob == bytes(ref)
    assert int(lens.sum()) == len(blob)


def test_validity_skips_match():
    # degenerate ring collapses identically on both paths
    w = "POLYGON((0 0,0.0001 0,0 0.0001,0 0))"
    g = wkt.decode(w)
    rec = sr.to_struct(g)
    kerr = ferr = False
    try:
        ktiles.transform_geom_to_tile(g, EXTENT, *BOUNDS)
    except ktiles.MvtValidityError:
        kerr = True
    try:
        mvt_fast.struct_to_tile_seqs(rec, EXTENT, *BOUNDS)
    except kmvt.MvtError:
        ferr = True
    assert kerr == ferr


def test_fallback_for_exotic():
    rec = sr.to_struct(wkt.decode("CIRCULARSTRING(0 0,1 1,2 0)"))
    assert mvt_fast.struct_to_tile_seqs(rec, EXTENT, *BOUNDS) is None
    rec = sr.to_struct(wkt.decode("POINT(1 2 3)"))
    assert mvt_fast.struct_to_tile_seqs(rec, EXTENT, *BOUNDS) is None


def _tile_fast_batched(geoms_wkt):
    items = [(str(i), sr.to_struct(wkt.decode(w)))
             for i, w in enumerate(geoms_wkt)]
    r = mvt_fast.encode_tile_fast("layer", EXTENT, items, *BOUNDS)
    assert r is not None
    blob, n, skipped = r
    return blob, n, skipped


def _tile_kernel(geoms_wkt):
    layer = _kernel_layer(geoms_wkt)
    out = bytearray()
    kmvt._write_bytes(out, 3, layer)
    return bytes(out)


def test_batched_tile_bytes_identical():
    blob, n, skipped = _tile_fast_batched(GEOMS)
    assert skipped == 0 and n == len(GEOMS)
    assert blob == _tile_kernel(GEOMS)


def test_batched_each_geom_individually():
    for w in GEOMS:
        blob, _, _ = _tile_fast_batched([w])
        assert blob == _tile_kernel([w]), w


def test_batched_validity_skip_and_fallback():
    # degenerate line -> skipped, not fatal
    items = [("0", sr.to_struct(wkt.decode("POINT(0 0)"))),
             ("1", sr.to_struct(wkt.decode("LINESTRING(1 1,1 1)")))]
    # same-coord linestring transforms to <2 distinct... still 2 coords
    # in tile space -> encoder emits it; use a 1-point struct instead
    bad = sr.to_struct(wkt.decode("LINESTRING(1 1,2 2)"))
    bad["coords"] = bad["coords"][:2]  # truncate to one coordinate
    items[1] = ("1", bad)
    r = mvt_fast.encode_tile_fast("layer", EXTENT, items, *BOUNDS)
    blob, n, skipped = r
    assert n == 1 and skipped == 1
    # exotic kind -> whole-tile fallback (None)
    exo = sr.to_struct(wkt.decode("CIRCULARSTRING(0 0,1 1,2 0)"))
    r = mvt_fast.encode_tile_fast(
        "layer", EXTENT, [("0", exo)], *BOUNDS)
    assert r is None


def test_vectorized_big_tile_bytes_identical():
    """>= _VECTOR_MIN features exercises the columnar command builder;
    bytes must equal both the kernel path and the per-feature python
    branch (forced via _VECTOR_MIN monkeypatch)."""
    rng = np.random.default_rng(7)
    geoms = []
    for i in range(40):
        x = float(rng.uniform(-9, 9))
        y = float(rng.uniform(-4, 4))
        geoms += [
            f"POINT({x:.4f} {y:.4f})",
            f"LINESTRING({x:.4f} {y:.4f},{x + 0.5:.4f} {y + 0.2:.4f},"
            f"{x - 0.3:.4f} {y - 0.1:.4f})",
            # CCW closed ring
            f"POLYGON(({x:.4f} {y:.4f},{x + 0.4:.4f} {y:.4f},"
            f"{x + 0.4:.4f} {y + 0.4:.4f},{x:.4f} {y + 0.4:.4f},"
            f"{x:.4f} {y:.4f}))",
            # CW input ring (must be re-oriented)
            f"POLYGON(({x:.4f} {y:.4f},{x:.4f} {y + 0.4:.4f},"
            f"{x + 0.4:.4f} {y + 0.4:.4f},{x + 0.4:.4f} {y:.4f},"
            f"{x:.4f} {y:.4f}))",
        ]
    geoms += GEOMS  # multipoint/multiline/holes hit the python scatter
    assert len(geoms) >= mvt_fast._VECTOR_MIN
    blob, n, skipped = _tile_fast_batched(geoms)
    assert skipped == 0 and n == len(geoms)
    assert blob == _tile_kernel(geoms)


def test_vectorized_matches_python_branch_with_skips(monkeypatch):
    """None rows, invalid linestrings and degenerate rings must skip
    identically in both branches (same n/skipped AND same bytes)."""
    rng = np.random.default_rng(11)
    items = []
    for i in range(90):
        x = float(rng.uniform(-9, 9))
        y = float(rng.uniform(-4, 4))
        mod = i % 6
        if mod == 0:
            items.append((str(i), None))
        elif mod == 1:
            bad = sr.to_struct(
                wkt.decode(f"LINESTRING({x:.3f} {y:.3f},0 0)"))
            bad["coords"] = bad["coords"][:2]  # 1 coord -> skip
            items.append((str(i), bad))
        elif mod == 2:
            # ring degenerates to <3 distinct coords in tile space
            w = (f"POLYGON(({x:.5f} {y:.5f},{x + 1e-05:.5f} {y:.5f},"
                 f"{x:.5f} {y + 1e-05:.5f},{x:.5f} {y:.5f}))")
            items.append((str(i), sr.to_struct(wkt.decode(w))))
        else:
            items.append((str(i), sr.to_struct(wkt.decode(
                f"POINT({x:.4f} {y:.4f})"))))
    r_vec = mvt_fast.encode_tile_fast("layer", EXTENT, items, *BOUNDS)
    monkeypatch.setattr(mvt_fast, "_VECTOR_MIN", 10 ** 9)
    r_py = mvt_fast.encode_tile_fast("layer", EXTENT, items, *BOUNDS)
    assert r_vec == r_py
    assert r_vec[2] > 0  # some features actually skipped


def test_columnar_framing_dedups_duplicate_keys(monkeypatch):
    # repeated feature keys must share one values-table slot in the
    # columnar framer exactly like the dict-based framer
    items = [("dup" if i % 3 == 0 else str(i),
              sr.to_struct(wkt.decode(f"POINT({i % 9 - 4} {i % 4 - 2})")))
             for i in range(100)]
    r_vec = mvt_fast.encode_tile_fast("layer", EXTENT, items, *BOUNDS)
    monkeypatch.setattr(mvt_fast, "_VECTOR_MIN", 10 ** 9)
    r_py = mvt_fast.encode_tile_fast("layer", EXTENT, items, *BOUNDS)
    assert r_vec == r_py


def _cols_from_items(items):
    """Flatten [(key, rec_or_None)] into encode_tile_cols' parallel
    column lists (what tiling's flat-column shuffle delivers)."""
    keys = [k for k, _ in items]
    cols = {f: [] for f in ("kind", "has_z", "has_m", "coords",
                            "offs1", "offs2", "wkb")}
    for _, rec in items:
        for f in cols:
            cols[f].append(None if rec is None else rec.get(f))
    return keys, cols


@pytest.mark.parametrize("force_python", [False, True])
def test_cols_branch_bytes_identical(monkeypatch, force_python):
    """encode_tile_cols is the THIRD parity-pinned branch: same
    (bytes, n, skipped) as encode_tile_fast on the same features —
    including None rows, duplicate keys, multi-ring/multi-part
    fallback features and skip-inducing degenerates — both above and
    below the columnar threshold."""
    rng = np.random.default_rng(23)
    items = []
    for i in range(120):
        x = float(rng.uniform(-9, 9))
        y = float(rng.uniform(-4, 4))
        mod = i % 7
        key = "dup" if i % 5 == 0 else str(i)
        if mod == 0:
            items.append((key, None))
        elif mod == 1:
            items.append((key, sr.to_struct(wkt.decode(
                f"MULTILINESTRING(({x:.3f} {y:.3f},0 0),"
                f"(1 1,2 2,3 1))"))))          # multi-part python slot
        elif mod == 2:
            w = (f"POLYGON(({x:.5f} {y:.5f},{x + 1e-05:.5f} {y:.5f},"
                 f"{x:.5f} {y + 1e-05:.5f},{x:.5f} {y:.5f}))")
            items.append((key, sr.to_struct(wkt.decode(w))))  # skip
        elif mod == 3:
            items.append((key, sr.to_struct(wkt.decode(
                f"POLYGON(({x:.3f} {y:.3f},{x + 0.8:.3f} {y:.3f},"
                f"{x + 0.8:.3f} {y + 0.6:.3f},{x:.3f} {y + 0.6:.3f},"
                f"{x:.3f} {y:.3f}),({x + 0.2:.3f} {y + 0.2:.3f},"
                f"{x + 0.4:.3f} {y + 0.2:.3f},{x + 0.2:.3f} "
                f"{y + 0.4:.3f},{x + 0.2:.3f} {y + 0.2:.3f}))"))))
        else:
            items.append((key, sr.to_struct(wkt.decode(
                f"POINT({x:.4f} {y:.4f})"))))
    if force_python:
        monkeypatch.setattr(mvt_fast, "_VECTOR_MIN", 10 ** 9)
    for n_take in (3, len(items)):  # below/above _VECTOR_MIN
        sub = items[:n_take]
        r_fast = mvt_fast.encode_tile_fast(
            "layer", EXTENT, sub, *BOUNDS)
        keys, c = _cols_from_items(sub)
        r_cols = mvt_fast.encode_tile_cols(
            "layer", EXTENT, keys, c["kind"], c["has_z"], c["has_m"],
            c["coords"], c["offs1"], c["offs2"], c["wkb"], *BOUNDS)
        assert r_cols == r_fast
        assert r_fast is not None and r_fast[2] > 0


def test_cols_branch_fallback_agreement():
    """An ineligible feature (raw-WKB exotic) makes BOTH branches
    return None (whole-tile kernel fallback)."""
    good = sr.to_struct(wkt.decode("POINT(1 1)"))
    exotic = dict(good)
    exotic["wkb"] = b"\x01\x08\x00\x00\x00"  # circularstring marker
    items = [("a", good), ("b", exotic)]
    assert mvt_fast.encode_tile_fast("layer", EXTENT, items,
                                     *BOUNDS) is None
    keys, c = _cols_from_items(items)
    assert mvt_fast.encode_tile_cols(
        "layer", EXTENT, keys, c["kind"], c["has_z"], c["has_m"],
        c["coords"], c["offs1"], c["offs2"], c["wkb"], *BOUNDS) is None


def _kernel_tile_props(geoms_wkt, props_list):
    feats = []
    for i, w in enumerate(geoms_wkt):
        g = wkt.decode(w)
        tg = ktiles.transform_geom_to_tile(g, EXTENT, *BOUNDS)
        feats.append(kmvt.feature_from_geom(
            tg, properties=props_list[i], fid=i))
    layer = kmvt._encode_layer(
        kmvt.MvtLayer(name="layer", extent=EXTENT, features=feats))
    out = bytearray()
    kmvt._write_bytes(out, 3, layer)
    return bytes(out)


def _props_for(i):
    """Typed property mix: int / double / string / bool values, a
    shared string (exercises value dedup), and a key present only on
    some features (exercises per-feature tag lists + key table)."""
    d = {"id": str(i), "n": i * 7, "score": i * 0.5,
         "lang": "en" if i % 3 else "de", "flag": i % 2 == 0}
    if i % 4 == 0:
        d["extra"] = f"x{i}"
    return d


@pytest.mark.parametrize("n_feats", [5, 120])
def test_typed_props_three_branches_byte_identical(n_feats):
    """Typed feature properties through the sink keep all THREE
    branches byte-identical to the kernel encoder (mvt_writer.rs:
    380-401 value mapping, :357-374 tag/key/value dedup): the
    per-feature python branch (< _VECTOR_MIN), the columnar command
    branch (>= _VECTOR_MIN, frames via the general key/value-dedup
    framer), and encode_tile_cols' flat-column twin."""
    geoms = [GEOMS[i % len(GEOMS)] for i in range(n_feats)]
    props = [_props_for(i) for i in range(n_feats)]

    want = _kernel_tile_props(geoms, props)

    items = [(str(i), sr.to_struct(wkt.decode(w)))
             for i, w in enumerate(geoms)]
    r = mvt_fast.encode_tile_fast("layer", EXTENT, items, *BOUNDS,
                                  props_list=props)
    assert r is not None
    blob, n, skipped = r
    assert (n, skipped) == (n_feats, 0)
    assert blob == want

    keys, cols = _cols_from_items(items)
    r2 = mvt_fast.encode_tile_cols(
        "layer", EXTENT, keys, cols["kind"], cols["has_z"],
        cols["has_m"], cols["coords"], cols["offs1"], cols["offs2"],
        cols["wkb"], *BOUNDS, props_list=props)
    assert r2 is not None
    assert r2[0] == want


def test_typed_props_default_unchanged():
    """props_list=None keeps the original {"id": str(key)} bytes —
    the pinned pre-props behavior (and the single-key columnar
    framer) is untouched."""
    geoms = [GEOMS[i % len(GEOMS)] for i in range(120)]
    id_props = [{"id": str(i)} for i in range(120)]
    items = [(str(i), sr.to_struct(wkt.decode(w)))
             for i, w in enumerate(geoms)]
    r_default = mvt_fast.encode_tile_fast("layer", EXTENT, items,
                                          *BOUNDS)
    r_explicit = mvt_fast.encode_tile_fast("layer", EXTENT, items,
                                           *BOUNDS,
                                           props_list=id_props)
    assert r_default is not None and r_explicit is not None
    assert r_default[0] == r_explicit[0] == _kernel_tile_props(
        geoms, id_props)


def test_typed_props_random_parity():
    """Property-based three-branch parity: random typed prop dicts
    (value collisions for dedup, absent keys, all four MVT value
    types, empty dicts) against the kernel encoder, above and below
    the columnar threshold."""
    from hypothesis import given, settings, strategies as st

    vals = st.one_of(
        st.integers(min_value=0, max_value=1 << 40),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(max_size=8),
        st.booleans())
    props_st = st.dictionaries(
        st.text(min_size=1, max_size=6), vals, max_size=4)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(props_st, min_size=1, max_size=6),
           st.booleans())
    def run(prop_dicts, big):
        n = len(prop_dicts)
        if big:
            # replicate past the columnar threshold, keys stay aligned
            reps = (mvt_fast._VECTOR_MIN // n) + 1
            prop_dicts = prop_dicts * reps
            n = len(prop_dicts)
        geoms = [GEOMS[i % len(GEOMS)] for i in range(n)]
        want = _kernel_tile_props(geoms, prop_dicts)
        items = [(str(i), sr.to_struct(wkt.decode(w)))
                 for i, w in enumerate(geoms)]
        r = mvt_fast.encode_tile_fast("layer", EXTENT, items, *BOUNDS,
                                      props_list=prop_dicts)
        assert r is not None and r[0] == want
        keys, cols = _cols_from_items(items)
        r2 = mvt_fast.encode_tile_cols(
            "layer", EXTENT, keys, cols["kind"], cols["has_z"],
            cols["has_m"], cols["coords"], cols["offs1"],
            cols["offs2"], cols["wkb"], *BOUNDS,
            props_list=prop_dicts)
        assert r2 is not None and r2[0] == want

    run()
