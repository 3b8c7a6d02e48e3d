"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot/norm are LEFT FOLDS over the array (``aggregate``), so the oracle
  (DuckDB ``list_reduce`` with the same fold order) produces the exact
  same doubles. Queries are broadcast; targets stream by — no shuffle
  of the big side until the final per-query top-k window over k*|Q|
  candidate rows.
- ``bit_lsh_buckets`` / ``ann_topk``: the scale path — sign-random-
  projection bit signatures (deterministic hyperplanes derived from a
  seed), banded into buckets; candidates are verified with the exact
  cosine. Recall is tunable via bits/bands; at 100 TB the bucket join
  replaces the |Q| x |T| candidate blow-up with bucket-local work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        "CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
_NORM2 = ("aggregate({a}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + "
          "CAST(v AS DOUBLE) * CAST(v AS DOUBLE))")


def dot_expr(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


def norm2_expr(a: str) -> str:
    return _NORM2.format(a=a)


def cosine_topk(queries: DataFrame, targets: DataFrame, k: int,
                query_key: str = "q_id", target_key: str = "t_id",
                qvec: str = "qvec", tvec: str = "tvec",
                exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k: (query_key, target_key, cosine, rank)."""
    q = queries.withColumn("_qn", F.expr(norm2_expr(qvec)))
    t = targets.withColumn("_tn", F.expr(norm2_expr(tvec)))
    cand = F.broadcast(q).crossJoin(t)
    if exclude_self:
        cand = cand.where(F.col(query_key) != F.col(target_key))
    cand = cand.withColumn(
        "cosine",
        F.expr(f"{dot_expr(qvec, tvec)} / (sqrt(_qn) * sqrt(_tn))"))
    w = Window.partitionBy(query_key).orderBy(
        F.col("cosine").desc(), F.col(target_key))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_key, target_key, "cosine", "rank"))


def _planes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).astype(np.float64)


def signature_udf(dim: int, bits: int = 32, bands: int = 4,
                  seed: int = 42):
    """Vectorized sign-random-projection band signatures.

    Returns array<long> of length ``bands``: each entry hashes
    bits/bands sign bits of deterministic hyperplane projections. One
    matmul per Arrow batch (numpy), no per-row Python.
    """
    planes = _planes(dim, bits, seed)
    rows = bits // bands

    @pandas_udf(ArrayType(LongType()))
    def f(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        sign = (mat @ planes.T) > 0  # (n, bits)
        out = []
        for r in sign:
            sig = []
            for b in range(bands):
                chunk = r[b * rows:(b + 1) * rows]
                v = 0
                for bit in chunk:
                    v = (v << 1) | int(bit)
                sig.append((b << 58) | v)
            out.append(sig)
        return pd.Series(out)

    return f


def ann_topk(queries: DataFrame, targets: DataFrame, k: int, dim: int,
             query_key: str = "q_id", target_key: str = "t_id",
             qvec: str = "qvec", tvec: str = "tvec",
             bits: int = 32, bands: int = 4, seed: int = 42,
             exclude_self: bool = True) -> DataFrame:
    """Approximate top-k: LSH band-bucket candidates, exact cosine
    verify, per-query window. Same output schema as cosine_topk."""
    sig = signature_udf(dim, bits, bands, seed)
    q = (queries.withColumn("_sig", sig(F.col(qvec)))
         .withColumn("bucket", F.explode("_sig")).drop("_sig")
         .withColumn("_qn", F.expr(norm2_expr(qvec))))
    t = (targets.withColumn("_sig", sig(F.col(tvec)))
         .withColumn("bucket", F.explode("_sig")).drop("_sig")
         .withColumn("_tn", F.expr(norm2_expr(tvec))))
    cand = q.join(t, on="bucket").drop("bucket")
    if exclude_self:
        cand = cand.where(F.col(query_key) != F.col(target_key))
    cand = (cand
            .dropDuplicates([query_key, target_key])
            .withColumn("cosine", F.expr(
                f"{dot_expr(qvec, tvec)} / (sqrt(_qn) * sqrt(_tn))")))
    w = Window.partitionBy(query_key).orderBy(
        F.col("cosine").desc(), F.col(target_key))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_key, target_key, "cosine", "rank"))
