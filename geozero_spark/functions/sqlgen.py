"""Dialect-dual SQL generation: one expression, two engines.

The cell index (kernel/cells.py), tile grids (kernel/tiles.py) and the
synthetic-input arithmetic are all pure integer/float math, so instead
of shipping them into Python UDFs we *generate the SQL expression* and
run it (a) in Spark — JVM-side, whole-stage-codegen'd, no Python worker
in the hot path — and (b) verbatim in DuckDB as the correctness oracle.

Re-expresses the reference's index pushdown idea (FlatGeobuf
packed-Hilbert-R-tree select_bbox, geozero README.md:88-95;
GPKG rtree bbox join, geozero-bench/benches/geobench.rs:198-208) as a
Morton-cell column any engine can compute and prune on.

Dialect quirks handled here so callers never branch:
- Spark spells shifts ``shiftleft/shiftright``; DuckDB uses ``<<``/``>>``.
- DuckDB ``CAST(x AS BIGINT)`` *rounds*; both sides get ``floor`` first.
- Float literals are written ``1.0e0`` so neither engine parses DECIMAL.
"""

from __future__ import annotations

SPARK = "spark"
DUCKDB = "duckdb"

# spread-bits masks (kernel/cells.py) as decimal literals
_MASKS = (
    (16, 281470681808895),          # 0x0000FFFF0000FFFF
    (8, 71777214294589695),         # 0x00FF00FF00FF00FF
    (4, 1085102592571150095),       # 0x0F0F0F0F0F0F0F0F
    (2, 3689348814741910323),       # 0x3333333333333333
    (1, 6148914691236517205),       # 0x5555555555555555
)

RES_SHIFT = 58


def shl(e: str, n: int, d: str) -> str:
    return f"shiftleft({e}, {n})" if d == SPARK else f"({e} << {n})"


def shr(e: str, n: int, d: str) -> str:
    return f"shiftright({e}, {n})" if d == SPARK else f"({e} >> {n})"


def f64(v: float) -> str:
    """Float literal that is DOUBLE in both dialects."""
    return f"{v!r}e0" if "e" not in f"{v!r}" else f"CAST({v!r} AS DOUBLE)"


def ibigint(e: str) -> str:
    """floor + cast (DuckDB CAST rounds, Spark truncates — floor first)."""
    return f"CAST(floor({e}) AS BIGINT)"


def clamp(e: str, lo: str, hi: str) -> str:
    return f"least(greatest({e}, {lo}), {hi})"


def spread(e: str, d: str) -> str:
    """Interleave zeros between the low 32 bits (kernel/cells._spread)."""
    v = f"({e})"
    for n, m in _MASKS:
        v = f"(({v} | {shl(v, n, d)}) & {m})"
    return v


def grid_ixy(lon: str, lat: str, res: int) -> tuple[str, str]:
    """Clamped integer grid coords at resolution res (kernel lonlat_to_ixiy)."""
    n = 1 << res
    ix = clamp(ibigint(f"(({lon}) + {f64(180.0)}) / {f64(360.0)} * {n}"),
               "0", str(n - 1))
    iy = clamp(ibigint(f"(({lat}) + {f64(90.0)}) / {f64(180.0)} * {n}"),
               "0", str(n - 1))
    return ix, iy


def cell_id(lon: str, lat: str, res: int, d: str) -> str:
    """Morton cell id expression == kernel.cells.cell_id(lon, lat, res)."""
    ix, iy = grid_ixy(lon, lat, res)
    morton = f"({spread(ix, d)} | {shl(spread(iy, d), 1, d)})"
    return f"({res << RES_SHIFT} | {morton})"


def make_cell(ix: str, iy: str, res: int, d: str) -> str:
    morton = f"({spread(f'({ix})', d)} | {shl(spread(f'({iy})', d), 1, d)})"
    return f"({res << RES_SHIFT} | {morton})"


def cell_parent(cell: str, res: int, steps: int, d: str) -> str:
    """Parent cell id (res known statically) == kernel.cells.parent."""
    payload = f"(({cell}) & {(1 << RES_SHIFT) - 1})"
    return f"({(res - steps) << RES_SHIFT} | {shr(payload, 2 * steps, d)})"


def tile_xy_eq(lon: str, lat: str, z: int) -> tuple[str, str]:
    """Equirectangular tile (kernel.tiles.tile_xy_eq): portable arithmetic."""
    nx, ny = 2 << z, 1 << z
    x = clamp(ibigint(f"(({lon}) + {f64(180.0)}) / {f64(360.0)} * {nx}"),
              "0", str(nx - 1))
    y = clamp(ibigint(f"({f64(90.0)} - ({lat})) / {f64(180.0)} * {ny}"),
              "0", str(ny - 1))
    return x, y


def tile_xy_wm(lon: str, lat: str, z: int) -> tuple[str, str]:
    """WebMercator slippy tile (kernel.tiles.tile_xy_wm).

    asinh(tan(lat)) is spelled ln(tan + 1/cos) — present in both engines.
    """
    n = 1 << z
    x = clamp(ibigint(f"(({lon}) + {f64(180.0)}) / {f64(360.0)} * {n}"),
              "0", str(n - 1))
    r = f"radians({lat})"
    asinh_tan = f"ln(tan({r}) + {f64(1.0)} / cos({r}))"
    y = clamp(ibigint(
        f"({f64(1.0)} - {asinh_tan} / pi()) / {f64(2.0)} * {n}"),
        "0", str(n - 1))
    return x, y


def quadkey(x: str, y: str, z: int, d: str) -> str:
    """Bing quadkey string (kernel.tiles.quadkey), loop-unrolled concat."""
    parts = []
    for i in range(z, 0, -1):
        mask = 1 << (i - 1)
        digit = (f"(({shr(f'({x})', i - 1, d)} & 1) + "
                 f"2 * ({shr(f'({y})', i - 1, d)} & 1))")
        parts.append(f"CAST({digit} AS STRING)")
    return " || ".join(parts) if parts else "''"


def cell_range(cell: str, res: int, at_res: int, d: str) -> tuple[str, str]:
    """[lo, hi] descendant id range at at_res (kernel.cells.cell_range) —
    the Parquet min/max pruning interval for bbox selection."""
    shift = 2 * (at_res - res)
    payload = f"(({cell}) & {(1 << RES_SHIFT) - 1})"
    lo = f"({at_res << RES_SHIFT} | {shl(payload, shift, d)})"
    hi = (f"({at_res << RES_SHIFT} | "
          f"({shl(f'({payload} + 1)', shift, d)} - 1))")
    return lo, hi
