#!/usr/bin/env python
"""A/B harness for the ann_topk max_bucket cap implementation
(window count vs partial-agg + broadcast anti-join). Runs the bench's
ann parameters over a parquet embeddings corpus; optionally plants a
degenerate identical-vector mass to exercise the skew path.

Usage: python scripts/ann_cap_ab.py <emb.parquet> [--skew N] [reps]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geozero_spark.operators import similarity  # noqa: E402
from geozero_spark.plans.session import make_session  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    path = sys.argv[1]
    skew = 0
    args = sys.argv[2:]
    if "--skew" in args:
        i = args.index("--skew")
        skew = int(args[i + 1])
        del args[i:i + 2]
    reps = int(args[0]) if args else 3

    spark = make_session(f"ann-cap-ab", CPUS)
    e = spark.read.parquet(path)
    if skew:
        # a mass of byte-identical vectors -> one degenerate bucket in
        # every band; ids above the real corpus
        base = e.agg(F.max("vec_id")).collect()[0][0] + 1
        dim = len(e.select("embedding").head()[0])
        mass = spark.range(skew).selectExpr(
            f"id + {base} AS vec_id",
            f"array_repeat(CAST(0.5 AS FLOAT), {dim}) AS embedding")
        e = e.unionByName(mass)
    q = (e.where(F.col("vec_id") % 101 == 0)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("qvec")))
    t = e.select(F.col("vec_id").alias("t_id"),
                 F.col("embedding").alias("tvec"))
    walls = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"ann_cap_ab rep{i}")
        t0 = time.perf_counter()
        df = similarity.ann_topk(q, t, 5, dim=64, bits=48, bands=16)
        n = df.count()
        walls.append(round(time.perf_counter() - t0, 3))
    print({"walls": walls, "best": min(walls), "count": n,
           "skew": skew})
    spark.stop()


if __name__ == "__main__":
    main()
