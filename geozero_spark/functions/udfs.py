"""Arrow-batched pandas UDFs over the pure-Python geometry kernel.

These are the Spark re-expression of geozero's fused reader->writer
event pipelines (geozero/src/api.rs:17-41): one Arrow batch replaces one
event stream, one vectorized UDF call replaces one read->process pass.
Per the north rule, NO per-row Python UDFs — everything here is a
``pandas_udf`` crossing the JVM boundary once per batch.

Format parity lives in the kernel (tests replicate geozero's own hex
fixtures); this module is only the batching shim. Anything expressible
as a built-in Column expression (cell ids, tiles, bbox predicates) does
NOT live here — see sqlgen.py — so the UDF path is reserved for actual
codec work.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (ArrayType, BinaryType, BooleanType, ByteType,
                               DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

from ..kernel import bounds as kbounds
from ..kernel import geojson as kgeojson
from ..kernel import structrepr as sr
from ..kernel import wkb as kwkb
from ..kernel import wkt as kwkt
from ..kernel.model import Geom

# matches sr.GEOMETRY_DDL; built programmatically so no SparkSession is
# needed at import time
GEOMETRY_TYPE = StructType([
    StructField("kind", ByteType()),
    StructField("srid", IntegerType()),
    StructField("has_z", BooleanType()),
    StructField("has_m", BooleanType()),
    StructField("bbox", ArrayType(DoubleType())),
    StructField("coords", ArrayType(DoubleType())),
    StructField("offs1", ArrayType(IntegerType())),
    StructField("offs2", ArrayType(IntegerType())),
    StructField("wkb", BinaryType()),
    StructField("tvals", ArrayType(DoubleType())),
    StructField("tmvals", ArrayType(LongType())),
])
_FIELDS = [f.name for f in GEOMETRY_TYPE.fields]


def _structs_to_pdf(structs: list[Optional[dict]]) -> pd.DataFrame:
    return pd.DataFrame(
        {f: [None if s is None else s[f] for s in structs] for f in _FIELDS})


def _pdf_to_geoms(pdf: pd.DataFrame) -> list[Optional[Geom]]:
    kinds = pdf["kind"]
    out: list[Optional[Geom]] = []
    for i, rec in enumerate(pdf.to_dict("records")):
        if kinds.iloc[i] is None or (isinstance(kinds.iloc[i], float)
                                     and np.isnan(kinds.iloc[i])):
            out.append(None)
        else:
            out.append(sr.from_struct(rec))
    return out


def _decode_udf(decode: Callable[..., Geom], caster=lambda v: v,
                strict: bool = False):
    @pandas_udf(GEOMETRY_TYPE)
    def f(s: pd.Series) -> pd.DataFrame:
        structs: list[Optional[dict]] = []
        for v in s:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                structs.append(None)
                continue
            try:
                structs.append(sr.to_struct(decode(caster(v))))
            except Exception:
                if strict:
                    raise
                structs.append(None)
        return _structs_to_pdf(structs)

    return f


def st_geomfromwkt(strict: bool = False):
    """string -> geometry struct (wkt_reader.rs:82-89 semantics)."""
    return _decode_udf(kwkt.decode, strict=strict)


def st_pointfromtext():
    """Vectorized 2D ``POINT(x y)`` decode — the hot scan path.

    Batches parse via pandas C-level str extraction (no per-row Python);
    anything that is not a plain 2D point falls back to the generic
    kernel decoder, so semantics match st_geomfromwkt exactly.
    """
    _PT = r"^POINT\((-?[0-9.]+) (-?[0-9.]+)\)$"

    @pandas_udf(GEOMETRY_TYPE)
    def f(s: pd.Series) -> pd.DataFrame:
        ext = s.str.extract(_PT, expand=True)
        x = pd.to_numeric(ext[0], errors="coerce")
        y = pd.to_numeric(ext[1], errors="coerce")
        ok = x.notna() & y.notna()
        n = len(s)
        out = {
            "kind": np.where(ok, 1, 0).astype("int8"),
            "srid": [None] * n,
            "has_z": [False] * n,
            "has_m": [False] * n,
            "bbox": [None] * n,
            "coords": [None] * n,
            "offs1": [None] * n,
            "offs2": [None] * n,
            "wkb": [None] * n,
            "tvals": [None] * n,
            "tmvals": [None] * n,
        }
        pdf = pd.DataFrame(out)
        xv = x.to_numpy(dtype=np.float64)
        yv = y.to_numpy(dtype=np.float64)
        okv = ok.to_numpy()
        bboxes = pdf["bbox"].to_numpy(dtype=object)
        coords = pdf["coords"].to_numpy(dtype=object)
        kinds = pdf["kind"].to_numpy(dtype=object).copy()
        for i in np.nonzero(okv)[0]:
            coords[i] = [xv[i], yv[i]]
            bboxes[i] = [xv[i], yv[i], xv[i], yv[i]]
        # fallback rows: generic kernel decode (keeps full semantics)
        for i in np.nonzero(~okv)[0]:
            v = s.iloc[i]
            if v is None or (isinstance(v, float) and np.isnan(v)) \
                    or v == "":
                kinds[i] = None
                continue
            try:
                st = sr.to_struct(kwkt.decode(v))
            except Exception:
                kinds[i] = None
                continue
            for fld in _FIELDS:
                pdf.at[i, fld] = st[fld]
            kinds[i] = st["kind"]
        pdf["kind"] = kinds
        pdf["bbox"] = bboxes
        pdf["coords"] = coords
        return pdf

    return f


def st_geomfromgeojson(strict: bool = False):
    """GeoJSON geometry string -> struct (geojson_reader.rs:73-81)."""
    return _decode_udf(kgeojson.decode, strict=strict)


def st_geomfromwkb(dialect: str = kwkb.DIALECT_EWKB, strict: bool = False):
    """binary -> struct; dialect in wkb/ewkb/gpkg/spatialite/mysql
    (wkb_reader.rs:115-150)."""
    return _decode_udf(lambda b: kwkb.decode(b, dialect=dialect),
                       caster=bytes, strict=strict)


def _encode_udf(encode: Callable[[Geom], object], ret):
    @pandas_udf(ret)
    def f(g: pd.DataFrame) -> pd.Series:
        geoms = _pdf_to_geoms(g)
        return pd.Series(
            [None if gm is None else encode(gm) for gm in geoms],
            dtype=object)

    return f


def st_aswkt():
    """struct -> WKT string (wkt_writer.rs semantics incl. Rust f64
    Display-compatible shortest-roundtrip formatting, kernel/fmt.py)."""
    return _encode_udf(kwkt.encode, StringType())


def st_asewkt():
    return _encode_udf(
        lambda g: kwkt.encode(g, dialect="ewkt", srid=g.srid), StringType())


def st_asgeojson():
    return _encode_udf(kgeojson.encode, StringType())


def st_aswkb(dialect: str = kwkb.DIALECT_EWKB, srid: Optional[int] = None):
    def enc(g: Geom) -> bytes:
        if srid is not None:
            g.srid = srid
        return kwkb.encode(g, dialect=dialect)

    return _encode_udf(enc, BinaryType())


def st_npoints():
    return _encode_udf(kbounds.npoints, IntegerType())


def mvt_tile_stats(int_prop: str | None = None,
                   float_prop: str | None = None,
                   str_prop: str | None = None):
    """Decode-own-output content check for the distributed MVT sink.

    Decodes each emitted tile blob with the kernel decoder
    (kernel/mvt.decode_tile — the parity twin of geozero's mvt reader,
    geozero/src/mvt/mvt_reader.rs) and emits SQL-checkable invariants:
    decoded feature count, total vertex count (polygon rings counted
    WITHOUT the closing duplicate, mvt_writer.rs:196-204 semantics), and
    the sums of all decoded tile-space x / y coordinates. The DuckDB
    oracle reconstructs the same numbers from the tile-transform
    arithmetic (mvt_writer.rs:157-173), so the blob bytes themselves are
    content-verified end to end, not just counted.

    Optional TYPED-property checks (mvt_writer.rs:380-401 value
    mapping through the layer keys/values tables): ``int_prop`` adds
    ``prop_int_sum`` (sum of that int tag across decoded features),
    ``float_prop`` adds ``prop_float_sum`` (sum of the double tag),
    ``str_prop`` adds ``prop_chars`` (sum of the string tag's length)
    — all reconstructible in SQL when the property derives from the
    generator arithmetic.
    """
    from ..kernel import mvt as kmvt

    fields = [
        StructField("n_features", IntegerType()),
        StructField("vtx_sum", LongType()),
        StructField("sx_sum", LongType()),
        StructField("sy_sum", LongType()),
    ]
    if int_prop is not None:
        fields.append(StructField("prop_int_sum", LongType()))
    if float_prop is not None:
        fields.append(StructField("prop_float_sum", DoubleType()))
    if str_prop is not None:
        fields.append(StructField("prop_chars", LongType()))
    stats_type = StructType(fields)

    def _feature_coords(feat):
        g = feat.geometry
        if feat.geom_type == kmvt.GEOM_POINT:
            return list(g)
        if feat.geom_type == kmvt.GEOM_LINESTRING:
            return [c for line in g for c in line]
        if feat.geom_type == kmvt.GEOM_POLYGON:
            # rings are decoded closed; drop the closing duplicate so
            # counts mirror the encoder's distinct-coords rule
            return [c for poly in g for ring in poly for c in ring[:-1]]
        raise kmvt.MvtError(f"unknown geom type {feat.geom_type}")

    @pandas_udf(stats_type)
    def f(blobs: pd.Series) -> pd.DataFrame:
        nf, vtx, sx, sy = [], [], [], []
        pis, pfs, pcs = [], [], []
        for blob in blobs:
            tile = kmvt.decode_tile(bytes(blob))
            feats = [ft for layer in tile.layers for ft in layer.features]
            coords = [c for ft in feats for c in _feature_coords(ft)]
            nf.append(len(feats))
            vtx.append(len(coords))
            sx.append(sum(c[0] for c in coords))
            sy.append(sum(c[1] for c in coords))
            if int_prop is not None:
                pis.append(sum(int(ft.properties[int_prop])
                               for ft in feats
                               if int_prop in ft.properties))
            if float_prop is not None:
                pfs.append(sum(float(ft.properties[float_prop])
                               for ft in feats
                               if float_prop in ft.properties))
            if str_prop is not None:
                pcs.append(sum(len(str(ft.properties[str_prop]))
                               for ft in feats
                               if str_prop in ft.properties))
        data = {"n_features": nf, "vtx_sum": vtx,
                "sx_sum": sx, "sy_sum": sy}
        if int_prop is not None:
            data["prop_int_sum"] = pis
        if float_prop is not None:
            data["prop_float_sum"] = pfs
        if str_prop is not None:
            data["prop_chars"] = pcs
        return pd.DataFrame(data)

    return f


def tessellate_stats():
    """Tessellator surface for the Spark layer (parity target:
    geozero/src/tessellator/mod.rs — vertex/triangle emission).

    Emits per-geometry (n_vertices, n_triangles, area2) where area2 is
    the summed doubled signed triangle area. Over integer-coordinate
    geometries (the centi-degree structs) every cross product is exact
    in doubles, so area2 is an exact integer the SQL oracle can
    reconstruct (outer ring area minus holes)."""
    from ..kernel import tessellate as ktess

    stats_type = StructType([
        StructField("n_vertices", IntegerType()),
        StructField("n_triangles", IntegerType()),
        StructField("area2", LongType()),
    ])

    @pandas_udf(stats_type)
    def f(g: pd.DataFrame) -> pd.DataFrame:
        nv, nt, a2 = [], [], []
        for geom in _pdf_to_geoms(g):
            if geom is None:
                nv.append(None), nt.append(None), a2.append(None)
                continue
            verts, tris = ktess.tessellate(geom)
            total = 0.0
            for (i, j, k) in tris:
                ax, ay = verts[3 * i], verts[3 * i + 1]
                bx, by = verts[3 * j], verts[3 * j + 1]
                cx, cy = verts[3 * k], verts[3 * k + 1]
                total += (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            nv.append(len(verts) // 3)
            nt.append(len(tris))
            a2.append(int(round(total)))
        return pd.DataFrame({"n_vertices": nv, "n_triangles": nt,
                             "area2": a2})

    return f


def gpx_members():
    """GPX document text -> parallel per-member arrays (kind, n_points,
    first coord x/y), member order = the reference's
    (gpx_reader.rs:26-43: waypoints, per-track MultiLineString, ONE
    all-routes MultiLineString). Parallel arrays rather than
    array<struct> because pyspark's Arrow struct-detection path
    (pandas/types.py metadata probe) crashes on nested struct output;
    callers arrays_zip + posexplode JVM-side. Whole-document decode to
    a GeometryCollection struct is st_geomfromgpx()."""
    from ..kernel import gpx as kgpx

    members_type = StructType([
        StructField("kind", ArrayType(IntegerType())),
        StructField("n_points", ArrayType(IntegerType())),
        StructField("x0", ArrayType(DoubleType())),
        StructField("y0", ArrayType(DoubleType())),
    ])

    def _first_coord(m):
        if m.kind == 1:  # POINT
            return m.data
        return m.data[0][0]  # MULTILINESTRING

    def _npoints(m):
        if m.kind == 1:
            return 1
        return sum(len(line) for line in m.data)

    @pandas_udf(members_type)
    def f(s: pd.Series) -> pd.DataFrame:
        kinds, npts, x0s, y0s = [], [], [], []
        for txt in s:
            g = kgpx.decode(txt)
            kinds.append([m.kind for m in g.data])
            npts.append([_npoints(m) for m in g.data])
            x0s.append([float(_first_coord(m)[0]) for m in g.data])
            y0s.append([float(_first_coord(m)[1]) for m in g.data])
        return pd.DataFrame({"kind": kinds, "n_points": npts,
                             "x0": x0s, "y0": y0s})

    return f


def st_geomfromgpx(strict: bool = False):
    """GPX text -> GeometryCollection struct (gpx_reader.rs parity)."""
    from ..kernel import gpx as kgpx
    return _decode_udf(kgpx.decode, strict=strict)


def shp_records_wkb():
    """Whole .shp file bytes -> array of per-record EWKB blobs (NULL
    array element for NullShape records). Bridges the shapefile kernel
    (kernel/shp.py, parity geozero/src/shp/shp_reader.rs) to the
    geometry struct via the proven WKB path — array<binary> avoids
    pyspark's nested-struct Arrow bug, and st_geomfromwkb restores the
    struct after a JVM-side posexplode."""
    from ..kernel import shp as kshp

    @pandas_udf(ArrayType(BinaryType()))
    def f(s: pd.Series) -> pd.Series:
        out = []
        for buf in s:
            recs = kshp.decode_records(bytes(buf))
            out.append([
                None if g is None else
                kwkb.encode(g, dialect=kwkb.DIALECT_EWKB)
                for _, g in recs])
        return pd.Series(out, dtype=object)

    return f
