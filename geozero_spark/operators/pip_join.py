"""Point-in-polygon join: cell prefilter -> exact ray-cast refine.

Re-expresses the reference's two index pushdown patterns — FlatGeobuf
packed-Hilbert-R-tree bbox scan (geozero README.md:88-95) and the GPKG
R-tree join (geozero-bench/benches/geobench.rs:198-208) — as a Spark
equi-join on Morton cell ids, then refines exactly with the vectorized
even-odd ray cast (GEOS prepared-geometry semantics, README.md:77-85).

Scale design (the part that must survive 1000 executors / 100 TB):

- The polygon side explodes into its bbox cell cover ONCE, entirely
  JVM-side (sequence/explode over grid ranges from the materialized
  bbox) — no Python, no UDF.
- When the polygon side is small (countries, admin zones — the common
  case), the exploded cover is broadcast: the points side is NEVER
  shuffled, so hot cells cannot skew a shuffle that doesn't exist.
- When both sides are big, we shuffle on the cell key with AQE skew
  splitting, plus optional deterministic salting: points get
  ``pmod(xxhash64(point_key), salt)`` and the polygon cover duplicates
  each cell row ``salt`` times — consistent on both sides by
  construction.
- The refine UDF sees only candidate pairs (cell-equal), decodes each
  polygon once per (batch, zone) and ray-casts the whole point slice
  vectorized.

Resolution trade-off: finer res -> more cover rows on the polygon side,
fewer false candidates on the refine; coarser res -> the opposite. For
zone-like polygons (degrees across), res 6-8 keeps cover sizes O(100)
while pruning >95% of candidates.
"""

from __future__ import annotations

import weakref

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions import cols
from ..functions import sqlgen as sg
from ..functions import udfs


def with_cell(df: DataFrame, lon: str, lat: str, res: int,
              out: str = "cell") -> DataFrame:
    """Attach the Morton cell id (JVM-side bit math, staged columns —
    see cols.with_cell_col for why not one sqlgen.cell_id expression)."""
    return cols.with_cell_col(df, lon, lat, res, out=out)


def explode_bbox_cover(df: DataFrame, res: int, bbox_col: str = "bbox",
                       out: str = "cell") -> DataFrame:
    """One row per (row, covering cell) for the row's bbox — JVM-side.

    The columnar analogue of walking the R-tree: a conservative grid
    cover of the geometry envelope at resolution ``res``.
    """
    n = 1 << res
    d = sg.SPARK

    def gi(expr: str, scale: float, off: float) -> str:
        return sg.clamp(sg.ibigint(f"(({expr}) + {sg.f64(off)}) / "
                                   f"{sg.f64(scale)} * {n}"),
                        "0", str(n - 1))

    ix0 = gi(f"element_at({bbox_col}, 1)", 360.0, 180.0)
    ix1 = gi(f"element_at({bbox_col}, 3)", 360.0, 180.0)
    iy0 = gi(f"element_at({bbox_col}, 2)", 180.0, 90.0)
    iy1 = gi(f"element_at({bbox_col}, 4)", 180.0, 90.0)
    out_df = (df
              # empty geometries carry bbox=[]; under ANSI element_at
              # would fail the whole job instead of skipping the feature
              .where(F.expr(f"size({bbox_col}) = 4"))
              .withColumn("ix",
                          F.expr(f"explode(sequence({ix0}, {ix1}))"))
              .withColumn("iy",
                          F.expr(f"explode(sequence({iy0}, {iy1}))")))
    # staged Morton assembly (cols.with_cell_from_ixiy) — the textual
    # make_cell form costs seconds of cold parse+codegen per plan
    return (cols.with_cell_from_ixiy(out_df, "ix", "iy", res, out=out)
            .drop("ix", "iy"))


_BROADCAST_POLY_LIMIT = 100_000

# prefilter=None (auto) flips the points-side cover-cell semi-join on
# when the estimated points bytes reaching the big exchange exceed
# this. The prefilter's cost is ~fixed (one cover-distinct + broadcast
# job, ~1s); its saving scales with points bytes x uncovered-grid
# fraction — measured crossover on this box is ~100-200 MB of points
# exchange (PLANS.md §5 round-4 table), threshold set at the low end
# because overshooting wastes ~1s once while undershooting wastes
# O(points) forever at 10^12 rows.
_PREFILTER_AUTO_BYTES = 128 << 20


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for a DataFrame's optimized
    plan (file-stats based for scans, propagated through projections).
    Unknown/unreliable estimates come back as the huge default —
    callers treating 'huge' as 'large input' fail safe for a
    fixed-cost-vs-linear-saving decision."""
    try:
        return int(str(df._jdf.queryExecution().optimizedPlan()
                       .stats().sizeInBytes()))
    except Exception:
        return 1 << 62

# prepared polygon-side state, keyed by the polys DataFrame OBJECT
# (weakly): the collected rows, decoded poly map (already broadcast)
# and the kernel cell cover. A dimension table joined repeatedly (the
# common pattern: one admin/zone dim object, many point queries) pays
# the take-job + decode + cover exactly once. Object identity — not a
# plan hash — so a fresh read of an overwritten path can never be
# served stale polygons, and two different dims can never collide;
# the cache empties itself when the caller drops the DataFrame.
_PREPARED: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _prepare_broadcast_polys(polys: DataFrame, res: int, poly_key: str,
                             poly_geom: str):
    """Collect + decode + cover the polygon side once per (df object,
    res, columns)."""
    from ..kernel import cells as kcells
    from ..kernel import structrepr as sr

    spark = polys.sparkSession
    subkey = (res, poly_key, poly_geom)
    cached = _PREPARED.get(polys)
    if cached is not None and subkey in cached:
        return cached[subkey]

    # ONE job for guard + collect: take(limit+1) both bounds the
    # driver memory and fetches the rows (a separate count job was
    # measurable fixed cost on every pip_join call)
    rows = polys.select(poly_key, poly_geom).take(
        _BROADCAST_POLY_LIMIT + 1)
    if len(rows) > _BROADCAST_POLY_LIMIT:
        raise ValueError(
            f"pip_join broadcast path collects the polygon side to "
            f"the driver and it exceeds {_BROADCAST_POLY_LIMIT} "
            f"rows; use broadcast_polys=False (shuffle path, "
            f"optionally salt=N) for big-big joins")
    # key -> LIST of geometries: a zone stored as several polygon rows
    # is legal (unique_polys=False) — a plain dict would silently keep
    # only the last row's geometry
    poly_map: dict = {}
    for r in rows:
        poly_map.setdefault(r[0], []).append(
            sr.from_struct(r[1].asDict(recursive=False)))
    bc = spark.sparkContext.broadcast(poly_map)
    # the cover comes from the SAME collected rows, computed with
    # the kernel driver-side and broadcast as a literal frame: a
    # distributed cover explode over decoded polygon expressions
    # compiled seconds of janino codegen per query and shipped the
    # deep parse tree into the plan for a 25-row dimension table.
    # Per-polygon cover is uncapped (limit = whole grid): the default
    # 4096-cell cap would reject a world-spanning bbox at res > 6 that
    # the distributed cover path accepted; the aggregate guard below
    # bounds driver memory instead.
    seen = set()
    cover_rows = []
    for r in rows:
        bb = r[1]["bbox"]
        if bb is None or len(bb) != 4:
            continue
        for cell in kcells.cover_bbox(bb[0], bb[1], bb[2], bb[3],
                                      res, limit=1 << (2 * res)):
            # dedupe (key, cell): overlapping bboxes of a multi-row
            # zone must not duplicate candidate rows downstream
            if (r[0], cell) not in seen:
                seen.add((r[0], cell))
                cover_rows.append((r[0], cell))
    if len(cover_rows) > 4_000_000:
        raise ValueError(
            f"pip_join broadcast cover has {len(cover_rows)} cells at "
            f"res={res}; use a coarser res or broadcast_polys=False")
    prepared = (bc, cover_rows)
    try:
        _PREPARED.setdefault(polys, {})[subkey] = prepared
    except TypeError:
        pass  # unhashable/unweakref-able DataFrame subclass: no cache
    return prepared


def pip_join(points: DataFrame, polys: DataFrame, res: int = 6,
             lon: str = "lon", lat: str = "lat",
             poly_geom: str = "poly", poly_key: str = "zone_id",
             broadcast_polys: bool = True, salt: int = 0,
             prefilter: bool | None = None,
             unique_polys: bool = True) -> DataFrame:
    """Exact point-in-polygon join.

    points: any columns + lon/lat (degrees). polys: poly_key + a
    geometry struct column ``poly_geom``. Returns points columns +
    poly_key for every (point, polygon) containment pair.

    ``unique_polys``: by default each poly_key is asserted to map to
    ONE polygon row (a duplicate raises instead of silently refining
    against an arbitrary row's geometry). Pass False for zones stored
    as several polygon rows: containment is then in-ANY-row semantics
    (masks OR-ed across the key's geometries) and exactly one output
    row per (point row, zone) — the shuffle path pays one extra
    distinct of the (zone, cell) cover for that.

    ``prefilter`` (shuffle path only): semi-join the points against
    the DISTINCT cover cells — bounded by the 4^res grid, so always
    broadcastable at sane res — BEFORE the big exchange, so points
    outside every polygon's bbox never shuffle. The prune factor is
    the fraction of the grid the polygons do NOT cover; the cost is
    one extra pass over the polygon side plus a small
    distinct+broadcast job (~1s fixed). Default ``None`` = AUTO: on
    when Catalyst's size estimate for the points side reaches
    ``_PREFILTER_AUTO_BYTES`` (measured crossover, PLANS.md §5 round-4
    table) — small bench inputs keep the cheap plain exchange, the
    10^12-row regime gets the prune without a caller decision. Pass
    True/False to pin it.
    """
    pts = with_cell(points, lon, lat, res)
    if salt > 0:
        # cast to int: the cogrouped refine hash-partitions each side
        # on its own key type, and murmur3(long 3) != murmur3(int 3) —
        # a bigint salt against the int sequence side silently strands
        # groups in mismatched partitions
        pts = pts.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(lon), F.col(lat)),
                            F.lit(salt)).cast("int"))
        keys = ["cell", "_salt"]
    else:
        keys = ["cell"]
    if broadcast_polys:
        # broadcast path: candidates carry ONLY the polygon key — the
        # decoded polygons ride a TorrentBroadcast to the Python
        # workers once, instead of one full geometry struct per
        # candidate row through Arrow (measured ~3x refine speedup)
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BooleanType

        from ..kernel import pip as kpip

        spark = points.sparkSession
        bc, cover_rows = _prepare_broadcast_polys(
            polys, res, poly_key, poly_geom)
        if unique_polys:
            dup = [k for k, gs in bc.value.items() if len(gs) > 1]
            if dup:
                raise ValueError(
                    f"pip_join: poly_key has duplicate rows for "
                    f"{dup[:5]}; pass unique_polys=False for "
                    f"multi-row zone (in-ANY-polygon) semantics")
        key_type = dict(polys.dtypes)[poly_key]
        cover = spark.createDataFrame(
            cover_rows, f"{poly_key} {key_type}, cell bigint")
        if salt > 0:
            cover = cover.withColumn(
                "_salt", F.explode(F.sequence(F.lit(0),
                                              F.lit(salt - 1))))
        cand = pts.join(F.broadcast(cover), on=keys, how="inner")

        @pandas_udf(BooleanType())
        def refine(zone: pd.Series, px: pd.Series,
                   py: pd.Series) -> pd.Series:
            out = np.zeros(len(zone), dtype=bool)
            if len(zone):
                pxv = px.to_numpy(dtype="float64")
                pyv = py.to_numpy(dtype="float64")
                pm = bc.value
                for z, idx in zone.groupby(zone,
                                           sort=False).indices.items():
                    m = kpip.points_in_polygon_np(
                        pxv[idx], pyv[idx], pm[z][0])
                    for g in pm[z][1:]:  # multi-row zone: in ANY
                        m |= kpip.points_in_polygon_np(
                            pxv[idx], pyv[idx], g)
                    out[idx] = m
            return pd.Series(out)

        refined = cand.withColumn(
            "_inside", refine(F.col(poly_key), F.col(lon), F.col(lat)))
        drop = ["_inside", "cell"] + (["_salt"] if salt else [])
        return refined.where(F.col("_inside")).drop(*drop)

    cover = explode_bbox_cover(
        polys.select(poly_key, poly_geom),
        res, bbox_col=f"{poly_geom}.bbox")
    # the candidate join ships NO geometry at all — just (zone, cell):
    # the refine below re-attaches each polygon once per group, so the
    # struct never rides the big exchange and never crosses Arrow
    # per-candidate-row (the 3x cost the broadcast path avoids, now
    # avoided distributed too)
    cover = cover.select(poly_key, "cell")
    if not unique_polys:
        # multi-row zones: overlapping bbox covers of the same key must
        # yield ONE candidate row per (point, zone) — distinct on the
        # small (dimension) side before the big exchange
        cover = cover.distinct()
    if prefilter is None:
        prefilter = _plan_size_bytes(pts) >= _PREFILTER_AUTO_BYTES
    if prefilter:
        pts = pts.join(F.broadcast(cover.select("cell").distinct()),
                       on="cell", how="leftsemi")
    if salt > 0:
        cover = cover.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    # the caller asserted the polygon side is too big to broadcast;
    # Catalyst's size estimate for the exploded cover is unreliable
    # (generate nodes), so pin the shuffle join here — AQE still
    # handles skew splitting / partition coalescing at runtime
    cand = pts.join(cover.hint("shuffle_hash"), on=keys, how="inner")

    # cogrouped exact refine: candidates and polygons meet on
    # (zone, salt); each group's geometry struct crosses the wire
    # ONCE and the whole point slice is ray-cast vectorized. A group
    # materializes as one pandas frame, so its size must be bounded:
    # the salt lane spreads a zone's candidates over `salt` groups
    # (zone_candidates / salt rows each; the polygon row is duplicated
    # salt times — the dimension side is cheap). When the caller
    # didn't salt the JOIN, a refine-only salt is derived here so an
    # unsalted big-big call still can't concentrate a whole hot zone
    # in one task; size `salt` to the hottest zone / a comfortable
    # pandas frame (AQE cannot split UDF groups).
    from ..kernel import pip as kpip
    from ..kernel import structrepr as sr

    refine_salt = salt if salt > 0 else 16
    if salt == 0:
        cand = cand.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(lon), F.col(lat)),
                            F.lit(refine_salt)).cast("int"))
    gkeys = [poly_key, "_salt"]
    # rename the dimension side's columns: cand and polys share
    # lineage (the cover came from polys), and same-attribute grouping
    # keys trip the ambiguous-self-join analyzer
    pright = (polys.select(F.col(poly_key).alias("_pk"),
                           F.col(poly_geom).alias("_pg"))
              .withColumn("_salt2", F.explode(
                  F.sequence(F.lit(0), F.lit(refine_salt - 1)))))
    rkeys = ["_pk", "_salt2"]
    out_proto = cand.drop("cell", "_salt")
    out_cols = out_proto.columns
    out_schema = out_proto.schema

    def refine(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left) or not len(right):
            return left.iloc[0:0][out_cols]
        if unique_polys and len(right) > 1:
            raise ValueError(
                f"pip_join: poly_key {right['_pk'].iloc[0]!r} has "
                f"{len(right)} polygon rows; pass unique_polys=False "
                f"for multi-row zone (in-ANY-polygon) semantics")
        pxv = left[lon].to_numpy(dtype=np.float64)
        pyv = left[lat].to_numpy(dtype=np.float64)
        mask = kpip.points_in_polygon_np(
            pxv, pyv, sr.from_struct(right["_pg"].iloc[0]))
        for i in range(1, len(right)):  # multi-row zone: in ANY
            mask |= kpip.points_in_polygon_np(
                pxv, pyv, sr.from_struct(right["_pg"].iloc[i]))
        return left.loc[mask, out_cols]

    return (cand.groupBy(*gkeys)
            .cogroup(pright.groupBy(*rkeys))
            .applyInPandas(refine, out_schema))
