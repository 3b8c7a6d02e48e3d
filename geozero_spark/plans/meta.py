"""Per-partition lineage + metrics, and resumable stage outputs.

North-rule requirement: checkpoint per-partition lineage and row-count
metrics so a 10^12-row run can resume without recomputing finished work.

Pattern (no reference analogue — geozero is single-pass/single-process):

- A *stage* writes its output partitioned by a deterministic bucket of
  the stage key (e.g. cell prefix). Each completed bucket directory is
  recorded in ``_meta/<stage>.parquet`` with its row count, bucket id
  and input fingerprint.
- ``run_stage`` skips buckets already recorded with the same
  fingerprint — idempotent resume at bucket granularity; a killed run
  redoes only in-flight buckets.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def meta_path(base: str, stage: str) -> str:
    return f"{base}/_meta/{stage}"


def completed_buckets(spark: SparkSession, base: str, stage: str,
                      fingerprint: str) -> set[int]:
    try:
        m = spark.read.parquet(meta_path(base, stage))
    except Exception:
        return set()
    return {r.bucket for r in
            m.where(F.col("fingerprint") == fingerprint)
            .select("bucket").distinct().collect()}


def run_stage(spark: SparkSession, df: DataFrame, base: str, stage: str,
              bucket_col: str, n_buckets: int, fingerprint: str) -> list:
    """Write df bucketed by pmod(hash(bucket_col), n_buckets); skip
    buckets already recorded for this fingerprint. Returns metric rows
    [(bucket, rows, wall_s)]. Output: ``base/stage/bucket=i`` parquet."""
    done = completed_buckets(spark, base, stage, fingerprint)
    bdf = df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(bucket_col)),
                          F.lit(n_buckets)).cast("int")).persist()
    metrics = []
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.perf_counter()
        part = bdf.where(F.col("_bucket") == b).drop("_bucket")
        part.write.mode("overwrite").parquet(
            f"{base}/{stage}/bucket={b}")
        rows = spark.read.parquet(f"{base}/{stage}/bucket={b}").count()
        wall = round(time.perf_counter() - t0, 3)
        rec = spark.createDataFrame(
            [(stage, b, rows, wall, fingerprint, time.time())],
            "stage string, bucket int, rows long, wall_s double, "
            "fingerprint string, ts double")
        rec.write.mode("append").parquet(meta_path(base, stage))
        metrics.append((b, rows, wall))
    bdf.unpersist()
    return metrics


def stage_metrics(spark: SparkSession, base: str, stage: str) -> DataFrame:
    return spark.read.parquet(meta_path(base, stage))
