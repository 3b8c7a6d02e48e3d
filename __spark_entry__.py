"""Driver contract for the spark-graft builder (PySpark target).

- entry(spark): flagship query (the PIP join: extraction -> decode ->
  cell prefilter -> ray-cast refine) on sf0.001.
- queries(): every implemented operator (SURVEY.md §2) as
  (spark, sf_dir) -> DataFrame.
- oracle_sql(): DuckDB-runnable ANSI SQL per query with identical
  output column names/values (rows-only queries omitted: ann_lsh is
  probabilistic by design, mvt_tiles is a binary sink whose byte parity
  is covered by kernel golden tests).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    from geozero_spark.queries import q_pip_join
    return q_pip_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from geozero_spark.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from geozero_spark.oracles import ORACLES
    return dict(ORACLES)
