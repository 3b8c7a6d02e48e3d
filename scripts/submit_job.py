"""spark-submit entry point — the north rule's launch mode.

Usage (see scripts/submit.sh):

    spark-submit --master local[8] \
        --py-files /tmp/geozero_spark_pkg.zip \
        scripts/submit_job.py [sf_dir] [query ...]

Runs the named queries() entries (default: the flagship PIP join via
entry()) against the given sf dir and prints one JSON line per query
with row count and wall seconds. The package reaches the executors
ONLY through --py-files — this script never touches sys.path for the
executor side, so it is exactly the cluster deployment shape.
"""
from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)  # driver-side import; executors use --py-files
    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:]
    spark = (SparkSession.builder.appName("geozero-spark-submit")
             .config("spark.sql.shuffle.partitions", "32").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    if not names:
        t0 = time.perf_counter()
        n = entrymod.entry(spark).count()
        print(json.dumps({"query": "entry", "rows": n,
                          "sec": round(time.perf_counter() - t0, 3)}))
    else:
        qs = entrymod.queries()
        for name in names:
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            print(json.dumps({"query": name, "rows": n,
                              "sec": round(time.perf_counter() - t0, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
