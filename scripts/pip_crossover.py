#!/usr/bin/env python
"""Measure the big-big PIP prefilter crossover.

For each clones level, time the shuffle path (salt=8) with the
points-side cover-cell prefilter OFF, ON, and AUTO, plus the broadcast
path as the ideal floor, on the same materialized pages parquet
bench.py uses. Prints one JSON line per level; feeds the PLANS.md §5
round-4 table. Timings are warm (per-level fresh session + warm-up, two
reps, best-of — run-to-run wobble on this box is ~±20%).

Usage: python scripts/pip_crossover.py [clones ...]   (default 40 200 500)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (repo-root harness: session/pages helpers)


def run_level(clones: int) -> dict:
    from geozero_spark import queries as Q
    from geozero_spark.operators import pip_join

    spark = bench._session(bench.CPUS)
    bench._warm_session(spark, bench.CPUS)
    pages = spark.read.parquet(bench._pages_parquet(spark, clones))
    pts = Q.points_from_pages(pages).select(
        "doc_id", "xc", "yc", "lon", "lat").persist()
    n = pts.count()
    polys = Q.zones_decoded(spark, bench.SF_DIR).select(
        "zone_id", "poly")
    est = pip_join._plan_size_bytes(pts)

    out = {"clones": clones, "rows": n, "est_bytes": est}

    def best(tag, fn):
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            cnt = fn()
            walls.append(time.perf_counter() - t0)
        out[tag] = round(min(walls), 2)
        out.setdefault("rows_out", cnt)
        return cnt

    best("broadcast_s", lambda: pip_join.pip_join(
        pts, polys, res=Q.PIP_RES).count())
    best("shuffle_off_s", lambda: pip_join.pip_join(
        pts, polys, res=Q.PIP_RES, broadcast_polys=False, salt=8,
        prefilter=False).count())
    best("shuffle_on_s", lambda: pip_join.pip_join(
        pts, polys, res=Q.PIP_RES, broadcast_polys=False, salt=8,
        prefilter=True).count())
    best("shuffle_auto_s", lambda: pip_join.pip_join(
        pts, polys, res=Q.PIP_RES, broadcast_polys=False, salt=8).count())
    out["auto_on"] = est >= pip_join._PREFILTER_AUTO_BYTES
    out["shuffle_vs_broadcast"] = round(
        min(out["shuffle_on_s"], out["shuffle_off_s"])
        / out["broadcast_s"], 2)
    pts.unpersist()
    spark.stop()
    return out


def main():
    levels = [int(a) for a in sys.argv[1:]] or [40, 200, 500]
    for c in levels:
        print(json.dumps(run_level(c)), flush=True)


if __name__ == "__main__":
    main()
