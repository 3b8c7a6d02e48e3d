#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline suite once at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" (per-op sec),
"sf", plus throughput extras}.

--scaling: runs the north-rule workload (decode -> PIP join -> tiles)
at local[N] and local[4N] (N = cpus/4) on the SAME input and reports
throughput at both plus scaling efficiency
(= thr_4N / (4 * thr_N)) — the sandbox stand-in for the N vs 4N
executor-count criterion.

The pages input is tiled deterministically via ``clones``
($SPARK_GRAFT_CLONES, default 40 -> 40x documents rows) so the decode /
join / tile stages run at millions of rows while staying derived from
the driver's parquet only.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CLONES = int(os.environ.get("SPARK_GRAFT_CLONES", "40"))


def _sf() -> float:
    name = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def _session(cpus: int):
    from geozero_spark.plans.session import make_session
    s = make_session(f"bench-{cpus}", cpus=cpus,
                     shuffle_partitions=max(cpus * 2, 16))
    s.sparkContext.setLogLevel("ERROR")
    return s


def core_workload(spark, clones: int):
    """North-rule workload; returns (timings dict, counts dict)."""
    from pyspark.sql import functions as F

    from geozero_spark import queries as Q
    from geozero_spark.functions import sqlgen as sg
    from geozero_spark.operators import dedup, knn, pip_join, similarity, tiling

    t: dict[str, float] = {}
    c: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = round(time.perf_counter() - t0, 3)
        c[name] = out
        return out

    pts = Q.points_df(spark, SF_DIR, clones=clones).select(
        "url", "doc_id", "xc", "yc", "lon", "lat").persist()
    timed("decode_points", pts.count)

    polys = Q.zones_decoded(spark, SF_DIR).select("zone_id", "poly")
    timed("pip_join", lambda: pip_join.pip_join(
        pts, polys, res=Q.PIP_RES).count())

    cell = sg.cell_id("lon", "lat", 8, sg.SPARK)
    timed("cell_counts", lambda: pts.groupBy(
        F.expr(cell).alias("cell")).count().count())

    timed("tile_counts", lambda: tiling.with_tile_eq(
        pts, "lon", "lat", 6).groupBy("z", "x", "y").count().count())

    geos = Q.geos_df(spark, SF_DIR, clones=max(clones // 4, 1)).select(
        "url", "geom")
    timed("mvt_tiles", lambda: tiling.mvt_tiles(
        geos, 5, key="url").count())

    queries = (pts.where(F.col("doc_id") % 101 == 0)
               .select(F.col("doc_id").alias("q_id"),
                       F.col("xc").alias("qx"), F.col("yc").alias("qy")))
    targets = pts.select(F.col("doc_id").alias("t_id"),
                         F.col("xc").alias("tx"), F.col("yc").alias("ty"))
    timed("knn", lambda: knn.knn_join(
        queries, targets, k=3, res=None, max_radius=16).count())

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed("minhash_lsh_fast", lambda: dedup.minhash_lsh_pairs(
        docs, num_perm=16, bands=4, fast=True).count())

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = (emb.where(F.col("vec_id") % 101 == 0)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("qvec")))
    tg = emb.select(F.col("vec_id").alias("t_id"),
                    F.col("embedding").alias("tvec"))
    timed("ann_cosine", lambda: similarity.cosine_topk(q, tg, 5).count())

    n_pts = c["decode_points"]
    pts.unpersist()
    return t, c, n_pts


def main():
    if "--scaling" in sys.argv:
        lo = max(CPUS // 4, 1)
        report = {"sf": _sf(), "clones": CLONES, "levels": {}}
        for cpus in (lo, CPUS):
            s = _session(cpus)
            t0 = time.perf_counter()
            t, c, n = core_workload(s, CLONES)
            wall = time.perf_counter() - t0
            core = t["decode_points"] + t["pip_join"] + t["tile_counts"] \
                + t["mvt_tiles"]
            report["levels"][str(cpus)] = {
                "wall_s": round(wall, 2), "core_s": round(core, 2),
                "rows": n, "rows_per_s": round(n / core, 1),
                "timings": t}
            s.stop()
        a = report["levels"][str(lo)]["rows_per_s"]
        b = report["levels"][str(CPUS)]["rows_per_s"]
        report["scaling_efficiency"] = round(b / (a * (CPUS / lo)), 3)
        print(json.dumps(report))
        return

    spark = _session(CPUS)
    t0 = time.perf_counter()
    t, c, n_pts = core_workload(spark, CLONES)
    total = round(time.perf_counter() - t0, 3)
    join_rate = round(n_pts / t["pip_join"], 1)
    print(json.dumps({
        "metric": "headline suite wall time (decode+pip+cells+tiles+mvt+"
                  "knn+minhash+ann)",
        "value": total,
        "unit": "sec",
        "queries": t,
        "sf": _sf(),
        "clones": CLONES,
        "points_rows": n_pts,
        "pip_join_points_per_s": join_rate,
        "decode_rows_per_s": round(n_pts / t["decode_points"], 1),
        "counts": c,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
