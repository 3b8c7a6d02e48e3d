"""Driver contract for the spark-graft builder (PySpark target).

- entry(spark): flagship query (the PIP join: extraction -> decode ->
  cell prefilter -> ray-cast refine) on sf0.001.
- queries(): every implemented operator (SURVEY.md §2) as
  (spark, sf_dir) -> DataFrame.
- oracle_sql(): DuckDB-runnable ANSI SQL per query with identical
  output column names/values. Only the raw binary sinks (mvt_tiles,
  raster_tiles) are rows-only — each has a content-checked twin
  (mvt_content decodes the emitted blobs, raster_content reads the
  grids back via JVM byte arithmetic), and ann_lsh/ann_recall are
  fully oracled via hash-derived portable LSH planes.
"""

from __future__ import annotations

import os
import sys
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_shipped = False


def _ship(spark: SparkSession) -> None:
    """Make geozero_spark importable on executors regardless of the
    launcher's cwd (the spark-submit --py-files pattern, self-serve)."""
    global _shipped
    if _shipped:
        return
    # already deployed via spark-submit --py-files? (scripts/submit.sh)
    # re-adding a zip of the same name with different bytes errors out
    pyfiles = spark.sparkContext.getConf().get("spark.submit.pyFiles", "")
    if pyfiles and "geozero_spark" in pyfiles:
        _shipped = True
        return
    z = os.path.join("/tmp", "geozero_spark_pkg.zip")
    pkg = os.path.join(_REPO, "geozero_spark")
    with zipfile.ZipFile(z, "w") as zf:
        for root, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    zf.write(p, os.path.relpath(p, _REPO))
    spark.sparkContext.addPyFile(z)
    _shipped = True


def entry(spark: SparkSession) -> DataFrame:
    _ship(spark)
    from geozero_spark.queries import q_pip_join
    return q_pip_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from geozero_spark.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from geozero_spark.oracles import ORACLES
    return dict(ORACLES)
