"""Profile the broadcast pip_join driver phases at bench config."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main():
    from bench import _session, _pages_parquet
    from geozero_spark import queries as Q
    from geozero_spark.operators import pip_join as PJ
    from geozero_spark.kernel import cells as kcells
    from geozero_spark.kernel import structrepr as sr

    spark = _session(32)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(x: pd.Series) -> pd.Series:
        return x
    spark.range(0, 128, 1, 128).select(_warm("id")).count()

    pages = spark.read.parquet(_pages_parquet(spark, 40))
    pts = Q.points_from_pages(pages).select(
        "doc_id", "xc", "yc", "lon", "lat").persist()
    pts.count()

    polys = Q.zones_decoded(spark, SF_DIR).select("zone_id", "poly")

    t = {}

    t0 = time.perf_counter()
    rows = polys.select("zone_id", "poly").take(100_001)
    t["take"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    poly_map = {r[0]: sr.from_struct(r[1].asDict(recursive=False))
                for r in rows}
    bc = spark.sparkContext.broadcast(poly_map)
    t["polymap+bcast"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    cover_rows = []
    for r in rows:
        bb = r[1]["bbox"]
        if bb is None or len(bb) != 4:
            continue
        for cell in kcells.cover_bbox(bb[0], bb[1], bb[2], bb[3], 6):
            cover_rows.append((r[0], cell))
    t["cover_py"] = time.perf_counter() - t0
    print("cover rows:", len(cover_rows), "zones:", len(rows))

    t0 = time.perf_counter()
    cover = spark.createDataFrame(cover_rows, "zone_id bigint, cell bigint")
    t["createDataFrame"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    cand = PJ.with_cell(pts, "lon", "lat", 6).join(
        F.broadcast(cover), on=["cell"], how="inner")
    t["plan_build"] = time.perf_counter() - t0

    # full call for comparison, twice
    t0 = time.perf_counter()
    n = PJ.pip_join(pts, polys, res=Q.PIP_RES).count()
    t["full_call_1"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = PJ.pip_join(pts, polys, res=Q.PIP_RES).count()
    t["full_call_2"] = time.perf_counter() - t0
    print("rows:", n)
    for k, v in t.items():
        print(f"{k:20s} {v:8.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
