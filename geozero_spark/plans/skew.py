"""Hot-key (hot-cell) detection and deterministic salting.

Web-scale geo data is massively skewed (a few city cells hold a large
share of all pages — the synthetic pages table plants 3 hot cells with
~20% of rows to mirror this). Two mitigations, composable:

- AQE skew-join splitting (on by default in plans/session.py) for
  shuffle joins.
- Explicit salting for aggregations / joins where one side can
  replicate: ``salt_hot_keys`` computes the hot-key set with one cheap
  count aggregate, then appends a deterministic salt only on hot keys
  (two-level aggregation pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hot_keys(df: DataFrame, key: str, threshold_rows: int) -> DataFrame:
    """Keys whose row count exceeds threshold_rows (one agg pass)."""
    return (df.groupBy(key).count()
            .where(F.col("count") > threshold_rows)
            .select(key))


def with_salt(df: DataFrame, key: str, hot: DataFrame, n_salt: int,
              salt_src: str, out: str = "salted_key") -> DataFrame:
    """Append ``#<salt>`` to hot keys only; salt is a deterministic
    function of ``salt_src`` (e.g. url) so re-runs place rows
    identically. Non-hot keys keep salt 0."""
    hot = F.broadcast(hot.withColumn("_is_hot", F.lit(True)))
    return (df.join(hot, on=key, how="left")
            .withColumn("_salt", F.when(
                F.col("_is_hot").isNotNull(),
                F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salt)))
                .otherwise(F.lit(0)))
            .withColumn(out, F.concat(F.col(key).cast("string"),
                                      F.lit("#"),
                                      F.col("_salt").cast("string")))
            .drop("_is_hot"))


def salted_count(df: DataFrame, key: str, threshold_rows: int = 100_000,
                 n_salt: int = 16, salt_src: str = "url") -> DataFrame:
    """Two-level count aggregation: partial counts on the salted key,
    final sum on the true key — hot cells fan out over n_salt reducers
    instead of one."""
    hot = hot_keys(df, key, threshold_rows)
    salted = with_salt(df, key, hot, n_salt, salt_src)
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_partial"))
    return (partial.groupBy(key)
            .agg(F.sum("_partial").alias("n_rows")))
