"""GeoPackage feature access over the file-level SQLite walker.

Re-expresses the reference's GPKG tests (geozero/tests/geopackage.rs:
4-99 — gpkg_geometry_columns discovery, `SELECT geom FROM pt2d`, NULL
geometry rows) without a database server: kernel/sqlitefile.py walks
the B-trees, this module interprets the GPKG profile (geometry-column
registry + per-table features) and feeds blobs to the existing
gpkg-dialect WKB decode (kernel/wkb.py — header/envelope semantics
mirrored from geozero/src/wkb/wkb_reader.rs).
"""

from __future__ import annotations

from . import wkb as kwkb
from .sqlitefile import SqliteFile, SqliteError


def geometry_tables(buf: bytes) -> list[dict]:
    """Rows of gpkg_geometry_columns (table_name, column_name,
    geometry_type_name, srs_id, z, m) in file order."""
    db = SqliteFile(buf)
    return list(db.rows("gpkg_geometry_columns"))


def read_features(buf: bytes, table: str | None = None):
    """Yield (fid-or-rowkey dict, Geom | None) for ``table`` (default:
    the first registered geometry table). The dict carries every
    non-geometry column; the geometry column decodes through the
    gpkg WKB dialect (NULL blob -> None, matching the reference's
    `WHERE geom IS NULL` row)."""
    db = SqliteFile(buf)
    regs = {r["table_name"]: r for r in db.rows("gpkg_geometry_columns")}
    if not regs:
        raise SqliteError("no gpkg_geometry_columns rows")
    if table is None:
        table = next(iter(regs))
    if table not in regs:
        raise SqliteError(f"{table!r} is not a registered geometry "
                          f"table (have {sorted(regs)})")
    gcol = regs[table]["column_name"]
    for row in db.rows(table):
        blob = row.pop(gcol, None)
        geom = (None if blob is None
                else kwkb.decode(bytes(blob), dialect="gpkg"))
        yield row, geom
