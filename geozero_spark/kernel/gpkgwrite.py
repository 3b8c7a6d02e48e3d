"""GeoPackage WRITER over the SQLite file writer — the sink half of
kernel/gpkg.py, closing the reference's GPKG write path
(geozero-cli writes GPKG via live SQLx; this produces the FILE the
reference's geopackage.rs tests read, no database server involved).

Emits the required GPKG core (spec www.geopackage.org/spec):
application_id 'GPKG' + user_version, gpkg_spatial_ref_sys with the
two mandatory undefined SRS rows + the data SRS, gpkg_contents,
gpkg_geometry_columns, and one features table per call with
gpkg-dialect WKB blobs (kernel/wkb.py, header/envelope semantics
mirrored from geozero/src/wkb/wkb_reader.rs). Parity pins: read back
with kernel/gpkg.py AND stdlib sqlite3 (tests/test_gpkg.py).
"""

from __future__ import annotations

from . import bounds as kbounds
from . import wkb as kwkb
from .model import TYPE_NAMES, Geom
from .sqlitewrite import build_db

APPLICATION_ID = 0x47504B47  # 'GPKG'
USER_VERSION = 10200         # GeoPackage 1.2

_SRS_SQL = (
    'CREATE TABLE gpkg_spatial_ref_sys ('
    'srs_name TEXT NOT NULL, srs_id INTEGER NOT NULL PRIMARY KEY, '
    'organization TEXT NOT NULL, organization_coordsys_id INTEGER '
    'NOT NULL, definition TEXT NOT NULL, description TEXT)')

# Spec-verbatim DDL (www.geopackage.org/spec §gpkg_contents /
# §gpkg_geometry_columns): the PRIMARY KEY / UNIQUE constraints are
# real — sqlitewrite emits the implied sqlite_autoindex_* B-trees
# (1-3 rows each), and integrity_check verifies index<->table
# consistency, so strict conformance validators reading the DDL find
# exactly the structures it promises. (gpkg_spatial_ref_sys's INTEGER
# PRIMARY KEY is the rowid itself — no index involved.)
_CONTENTS_SQL = (
    'CREATE TABLE gpkg_contents ('
    'table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL, '
    'identifier TEXT UNIQUE, description TEXT DEFAULT \'\', '
    'last_change DATETIME NOT NULL DEFAULT '
    '(strftime(\'%Y-%m-%dT%H:%M:%fZ\',\'now\')), '
    'min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, '
    'srs_id INTEGER, '
    'CONSTRAINT fk_gc_r_srs_id FOREIGN KEY (srs_id) '
    'REFERENCES gpkg_spatial_ref_sys(srs_id))')
_CONTENTS_INDEXES = [["table_name"], ["identifier"]]

_GEOMCOLS_SQL = (
    'CREATE TABLE gpkg_geometry_columns ('
    'table_name TEXT NOT NULL, column_name TEXT NOT NULL, '
    'geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, '
    'z TINYINT NOT NULL, m TINYINT NOT NULL, '
    'CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name), '
    'CONSTRAINT uk_gc_table_name UNIQUE (table_name), '
    'CONSTRAINT fk_gc_tn FOREIGN KEY (table_name) '
    'REFERENCES gpkg_contents(table_name), '
    'CONSTRAINT fk_gc_srs FOREIGN KEY (srs_id) '
    'REFERENCES gpkg_spatial_ref_sys (srs_id))')
_GEOMCOLS_INDEXES = [["table_name", "column_name"], ["table_name"]]

_WGS84_DEF = ('GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
              '6378137,298.257223563]],PRIMEM["Greenwich",0],'
              'UNIT["degree",0.0174532925199433]]')


def _sql_type(v) -> str:
    if isinstance(v, bool):
        return "BOOLEAN"
    if isinstance(v, int):
        return "INTEGER"
    if isinstance(v, float):
        return "DOUBLE"
    if isinstance(v, (bytes, bytearray)):
        return "BLOB"
    return "TEXT"


def encode(features, table: str = "features", geom_col: str = "geom",
           srid: int = 4326, page_size: int = 4096,
           srs_name: str | None = None,
           srs_def: str | None = None) -> bytes:
    """Encode [(Geom | None, props dict)] as a GeoPackage file.

    Column schema is inferred from the first non-None value per
    property name (mixed types coerce through SQLite's dynamic typing
    anyway); fids enumerate from 1 in input order. The declared
    geometry type is the single kind when uniform, else GEOMETRY.

    The gpkg_spatial_ref_sys row for ``srid`` carries the WGS-84
    name/definition ONLY for srid 4326; any other srid takes the
    caller's ``srs_name``/``srs_def`` or falls back to the spec's
    'undefined' escape hatch — never a factually wrong CRS definition
    a spatial consumer would trust."""
    features = list(features)
    cols: list = []
    seen: dict = {}
    for _, props in features:
        for k, v in (props or {}).items():
            if k not in seen:
                seen[k] = True
                cols.append((k, _sql_type(v)))
    kinds = {g.kind for g, _ in features if g is not None}
    gtype = (TYPE_NAMES[next(iter(kinds))].upper()
             if len(kinds) == 1 else "GEOMETRY")

    env = None
    for g, _ in features:
        if g is None:
            continue
        bb = kbounds.bounds(g)
        if bb is None:
            continue
        env = (bb if env is None else
               (min(env[0], bb[0]), min(env[1], bb[1]),
                max(env[2], bb[2]), max(env[3], bb[3])))

    col_defs = ", ".join(f'"{n}" {t}' for n, t in cols)
    feat_sql = (f'CREATE TABLE "{table}" (fid INTEGER PRIMARY KEY, '
                f'"{geom_col}" BLOB'
                + (f', {col_defs}' if cols else '') + ')')
    feat_rows = []
    for i, (g, props) in enumerate(features):
        blob = None
        if g is not None:
            g2 = g if g.srid else Geom(g.kind, g.data, srid=srid)
            blob = kwkb.encode(g2, dialect="gpkg")
        feat_rows.append((i + 1, blob)
                         + tuple((props or {}).get(n) for n, _ in cols))

    srs_rows = [
        ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
        ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
    ]
    if srid not in (-1, 0):
        if srid == 4326:
            name = srs_name or "WGS 84"
            definition = srs_def or _WGS84_DEF
        else:
            name = srs_name or f"SRID {srid}"
            definition = srs_def or "undefined"
        srs_rows.append((name, srid, "EPSG", srid, definition, None))
    tables = [
        ("gpkg_spatial_ref_sys", _SRS_SQL, srs_rows),
        (
            "gpkg_contents", _CONTENTS_SQL,
            [(table, "features", table, "",
              "2026-01-01T00:00:00.000Z",  # deterministic output
              env[0] if env else None, env[1] if env else None,
              env[2] if env else None, env[3] if env else None,
              srid)],
            _CONTENTS_INDEXES,
        ),
        (
            "gpkg_geometry_columns", _GEOMCOLS_SQL,
            [(table, geom_col, gtype, srid, 0, 0)],
            _GEOMCOLS_INDEXES,
        ),
        (table, feat_sql, feat_rows),
    ]
    return build_db(tables, page_size=page_size,
                    application_id=APPLICATION_ID,
                    user_version=USER_VERSION)
