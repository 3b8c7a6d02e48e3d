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


def _fold_mat(vecs) -> np.ndarray:
    """(n, dim) float64 matrix from a pandas Series / list of float32
    arrays — the float->double widening is exact, so every element
    equals the SQL ``CAST(x AS DOUBLE)``."""
    return np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])


def _fold_norm2(mat: np.ndarray) -> np.ndarray:
    """Per-row left fold of squares in ascending index order — the
    exact IEEE-double op sequence of norm2_expr (acc + v*v per j), so
    the result is bit-identical to the SQL/DuckDB fold."""
    acc = np.zeros(len(mat), dtype=np.float64)
    for j in range(mat.shape[1]):
        acc += mat[:, j] * mat[:, j]
    return acc


def _select_topk_key(key: np.ndarray, kk: int, big: float):
    """Exact per-row top-k selection by (key ASC, column-order ASC) for
    float keys; columns must be pre-sorted by the tie-break order.
    Entries at ``big`` are exclusion filler (mirrors knn._select_topk).
    Returns (sel, keyo)."""
    part = np.argpartition(key, kk - 1, axis=1)[:, :kk]
    part.sort(axis=1)
    keys = np.take_along_axis(key, part, axis=1)
    order = np.argsort(keys, axis=1, kind="stable")
    sel = np.take_along_axis(part, order, axis=1)
    keyo = np.take_along_axis(keys, order, axis=1)
    kth = keyo[:, -1]
    bad = (kth < big) & ((key <= kth[:, None]).sum(axis=1) > kk)
    for r in np.nonzero(bad)[0]:
        full = np.argsort(key[r], kind="stable")[:kk]
        sel[r] = full
        keyo[r] = key[r][full]
    return sel, keyo


def cosine_topk(queries: DataFrame, targets: DataFrame, k: int,
                query_key: str = "q_id", target_key: str = "t_id",
                qvec: str = "qvec", tvec: str = "tvec",
                exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k: (query_key, target_key, cosine, rank).

    Queries are collected/broadcast (the baseline's contract — small
    query sets); each target partition computes a numpy partial top-k,
    so the big side is never shuffled and only |partitions| * |Q| * k
    partial rows reach the final per-query window. The per-pair double
    is BIT-IDENTICAL to the old SQL higher-order-function fold (and
    hence the DuckDB oracle): products and the ascending-index
    accumulation run in the same IEEE-double order (``acc += x_j*y_j``
    per j — numpy issues separate multiply and add ufuncs, no FMA),
    and sqrt/multiply/divide follow the same op order as
    ``dot / (sqrt(qn) * sqrt(tn))``. The interpreted fold the SQL form
    pays (higher-order functions run outside codegen) made the old
    |Q| x |T| crossJoin the suite's slowest non-kNN query."""
    qrows = queries.select(query_key, qvec).collect()
    spark = queries.sparkSession
    if not qrows:
        return spark.createDataFrame(
            [], f"{query_key} long, {target_key} long, cosine double, "
                f"rank int")
    qid = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = _fold_mat([r[1] for r in qrows])
    sqq = np.sqrt(_fold_norm2(qmat))
    bc = spark.sparkContext.broadcast((qid, qmat, sqq))

    out_schema = f"{query_key} long, {target_key} long, cosine double"
    kq = k

    def local_topk(it):
        qid, qmat, sqq = bc.value
        nq, dim = qmat.shape
        pdfs = [pdf for pdf in it if len(pdf)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        tid = pdf[target_key].to_numpy(dtype=np.int64)
        tmat = _fold_mat(pdf[tvec])
        # pre-sort targets by key: a STABLE selection then yields
        # (cosine DESC, target_key ASC) order fully vectorized
        ts = np.argsort(tid, kind="stable")
        tid, tmat = tid[ts], tmat[ts]
        sqt = np.sqrt(_fold_norm2(tmat))
        nt = len(tid)
        big = np.inf
        out_q, out_t, out_c = [], [], []
        chunk = min(nq, max(1, (1 << 20) // max(nt, 1)))
        acc = np.empty((chunk, nt), np.float64)
        key = np.empty((chunk, nt), np.float64)
        for s in range(0, nq, chunk):
            e = min(s + chunk, nq)
            m = e - s
            a = acc[:m]
            a.fill(0.0)
            for j in range(dim):
                # ascending-j accumulation == the SQL left fold,
                # element by element
                a += qmat[s:e, j:j + 1] * tmat[:, j][None, :]
            denom = sqq[s:e, None] * sqt[None, :]
            cos = np.divide(a, denom, out=a)
            # ordering key: cosine DESC with NaN FIRST (Spark treats
            # NaN as greatest). cos = +/-inf cannot occur for finite
            # inputs (denom == 0 implies an all-zero vector, whose dot
            # is 0 -> NaN), so -inf keys are exactly the NaN rows and
            # +inf keys are exclusion filler only.
            kb = np.negative(cos, out=key[:m])
            np.copyto(kb, -np.inf, where=np.isnan(kb))
            if exclude_self:
                lo = np.searchsorted(tid, qid[s:e], side="left")
                hi = np.searchsorted(tid, qid[s:e], side="right")
                for r in np.nonzero(hi > lo)[0]:
                    kb[r, lo[r]:hi[r]] = big
            kk = min(kq, nt)
            sel, keyo = _select_topk_key(kb, kk, big)
            keep = (keyo != big).ravel()
            cosv = np.take_along_axis(cos, sel, axis=1).ravel()[keep]
            out_q.append(np.repeat(qid[s:e], kk)[keep])
            out_t.append(tid[sel.ravel()[keep]])
            out_c.append(cosv)
        yield pd.DataFrame({
            query_key: np.concatenate(out_q),
            target_key: np.concatenate(out_t),
            "cosine": np.concatenate(out_c)})

    from ..functions import ensure_width
    partials = ensure_width(targets.select(target_key, tvec)) \
        .mapInPandas(local_topk, out_schema)
    w = Window.partitionBy(query_key).orderBy(
        F.col("cosine").desc(), F.col(target_key))
    return (partials.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_key, target_key, "cosine", "rank"))


def _pair_cosine_fn(qkey: str, tkey: str, qvec: str, tvec: str,
                    local_k: int | None = None):
    """mapInArrow scorer for candidate pairs: emits (qkey, tkey,
    cosine) where cosine is BIT-IDENTICAL to the SQL form
    ``dot / (sqrt(qn) * sqrt(tn))`` with left-fold dot/norms: the
    ascending-index ``acc += x_j*y_j`` loop runs separate IEEE-double
    multiply and add ufuncs (no FMA, no reassociation), float->double
    widening is exact, and numpy sqrt/divide are the same correctly-
    rounded IEEE ops the JVM uses. Vectors arrive as one contiguous
    Arrow values buffer (zero row-wise Python).

    ``local_k``: emit only each query's local_k best pairs OF THIS
    TASK by (cosine DESC NaN-first, tkey ASC) — the same TOTAL order
    the downstream window ranks by, so the global top-k is a subset of
    the union of task-local top-ks and the window's result is
    unchanged, while its input shrinks from |candidates| to
    |tasks| * |Q| * k rows."""
    import pyarrow as pa

    def f(it):
        acc_q, acc_t, acc_c = [], [], []
        for b in it:
            n = b.num_rows
            if not n:
                continue

            def flat(name):
                col = b.column(b.schema.get_field_index(name))
                v = np.asarray(col.flatten(), dtype=np.float64)
                return v.reshape(n, -1)

            am = flat(qvec)
            bm = flat(tvec)
            dim = am.shape[1]
            dot = np.zeros(n, np.float64)
            qn = np.zeros(n, np.float64)
            tn = np.zeros(n, np.float64)
            for j in range(dim):
                aj = am[:, j]
                bj = bm[:, j]
                dot += aj * bj
                qn += aj * aj
                tn += bj * bj
            denom = np.sqrt(qn) * np.sqrt(tn)
            cos = dot / denom
            qs = b.column(b.schema.get_field_index(qkey))
            ts = b.column(b.schema.get_field_index(tkey))
            if local_k is None:
                yield pa.record_batch(
                    [qs, ts, pa.array(cos, type=pa.float64())],
                    names=[qkey, tkey, "cosine"])
            else:
                acc_q.append(np.asarray(qs, dtype=np.int64))
                acc_t.append(np.asarray(ts, dtype=np.int64))
                acc_c.append(cos)
        if local_k is not None and acc_q:
            qa = np.concatenate(acc_q)
            ta = np.concatenate(acc_t)
            ca = np.concatenate(acc_c)
            # cos = +/-inf cannot occur for finite inputs (zero norm
            # implies dot == 0 -> NaN), so mapping NaN below every
            # finite key reproduces Spark's NaN-greatest DESC order
            key = np.negative(ca)
            np.copyto(key, -np.inf, where=np.isnan(key))
            order = np.lexsort((ta, key, qa))
            qs_sorted = qa[order]
            starts = np.nonzero(np.r_[True, qs_sorted[1:]
                                      != qs_sorted[:-1]])[0]
            ends = np.r_[starts[1:], len(qs_sorted)]
            take = np.concatenate([
                order[s:min(s + local_k, e)]
                for s, e in zip(starts, ends)])
            yield pa.record_batch(
                [pa.array(qa[take], type=pa.int64()),
                 pa.array(ta[take], type=pa.int64()),
                 pa.array(ca[take], type=pa.float64())],
                names=[qkey, tkey, "cosine"])

    return f


def _planes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).astype(np.float64)


# --------------------------------------------------------------------------
# portable (dual-dialect SQL) sign-random-projection signatures
# --------------------------------------------------------------------------
#
# Plane components come from a Lehmer-style integer hash instead of a
# numpy RNG, and the projections are LEFT FOLDS over the embedding —
# the exact pattern already proven bit-identical across Spark and DuckDB
# for cosine_topk. That makes the *whole* LSH pipeline (signatures ->
# band buckets -> bucket join -> exact-cosine rerank) reproducible in
# the DuckDB oracle, so the approximate operator gets a full content
# check, not a rows-only one. Uniform(-1,1) plane entries replace
# Gaussians; for sign projections this only mildly perturbs the angle
# estimate and leaves the banding math unchanged.

_LEHMER_M = 2147483647  # 2^31 - 1 (products stay < 2^47 « 2^63)
_LEHMER_A = 48271


def _plane_val_sql(seed: int, bit: int, j: str) -> str:
    """Deterministic plane component in [-1, 1] as portable SQL
    (identical text valid in Spark SQL and DuckDB; j is an expression
    for the 0-based vector index)."""
    base = seed * 131071 + bit * 8191 + 1  # folded, emitted as BIGINT
    h0 = (f"(((CAST({base} AS BIGINT) + ({j})) % {_LEHMER_M}) + 1)")
    h1 = f"(({h0} * {_LEHMER_A}) % {_LEHMER_M})"
    h2 = f"(({h1} * {_LEHMER_A}) % {_LEHMER_M})"
    return f"CAST(({h2} % 2000001) - 1000000 AS DOUBLE) / 1000000.0e0"


def _proj_sql(vec: str, dim: int, seed: int, bit: int, d: str) -> str:
    """Left-fold dot(vec, plane_bit) — fold order mirrored across
    dialects so the resulting double (and hence its sign) is identical."""
    pv = _plane_val_sql(seed, bit, "j")
    if d == "duckdb":
        return (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
                f"list_transform(range(1, {dim} + 1), i -> "
                f"CAST({vec}[i] AS DOUBLE) * "
                f"{_plane_val_sql(seed, bit, 'i - 1')})), "
                f"(acc, v) -> acc + v)")
    return (f"aggregate(zip_with({vec}, sequence(0, {dim} - 1), "
            f"(v, j) -> CAST(v AS DOUBLE) * {pv}), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")


def srp_band_buckets_sql(vec: str, dim: int, bits: int = 32,
                         bands: int = 4, seed: int = 42,
                         d: str = "spark") -> list[str]:
    """One bucket-id expression per band: ``(band << 58) | sign bits``.

    Bit order matches signature_udf (most significant bit = first
    hyperplane of the band)."""
    rows = bits // bands
    out = []
    for b in range(bands):
        terms = []
        for r in range(rows):
            bit = b * rows + r
            weight = 1 << (rows - 1 - r)
            terms.append(
                f"(CASE WHEN {_proj_sql(vec, dim, seed, bit, d)} > 0 "
                f"THEN {weight} ELSE 0 END)")
        out.append(f"(CAST({b} AS BIGINT) * {1 << 58} + ("
                   + " + ".join(terms) + "))")
    return out


def signature_udf(dim: int, bits: int = 32, bands: int = 4,
                  seed: int = 42):
    """Vectorized sign-random-projection band signatures.

    Returns array<long> of length ``bands``: each entry hashes
    bits/bands sign bits of deterministic hyperplane projections. One
    matmul per Arrow batch (numpy), no per-row Python.
    """
    planes = _planes(dim, bits, seed)
    rows = bits // bands
    # band packing fully vectorized: a (bands, rows) reshape matmul'd
    # with bit weights replaces the per-row Python bit loop (~96 int
    # ops/row — measured 2.5x on the whole signature stage)
    w = (1 << np.arange(rows - 1, -1, -1)).astype(np.int64)
    tags = (np.arange(bands, dtype=np.int64) << 58)

    @pandas_udf(ArrayType(LongType()))
    def f(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        sign = (mat @ planes.T) > 0  # (n, bits)
        sig = (sign.reshape(len(vecs), bands, rows).astype(np.int64)
               @ w + tags)
        return pd.Series(list(sig))

    return f


def ann_topk(queries: DataFrame, targets: DataFrame, k: int, dim: int,
             query_key: str = "q_id", target_key: str = "t_id",
             qvec: str = "qvec", tvec: str = "tvec",
             bits: int = 32, bands: int = 4, seed: int = 42,
             exclude_self: bool = True,
             portable: bool = False,
             max_bucket: int | None = 100000) -> DataFrame:
    """Approximate top-k: LSH band-bucket candidates, exact cosine
    verify, per-query window. Same output schema as cosine_topk.

    portable=True derives signatures from hash-based planes via pure
    SQL expressions (JVM-side, DuckDB-reproducible — the oracle mode);
    portable=False uses the vectorized numpy matmul (the scale mode).

    ``max_bucket`` bounds the candidate join against degenerate
    buckets — e.g. a mass of all-zero or byte-identical embeddings
    signs identically in every band, and an unbounded ``q JOIN t ON
    bucket`` then goes quadratic in that mass (the exact skew
    minhash_lsh_pairs bounds with its own max_bucket). Band buckets
    whose TARGET population exceeds the cap are dropped via a window
    count over the SAME (bucket) exchange the join needs — the
    signature UDF evaluates once and the target side still shuffles
    exactly once (a separate count-aggregate branch would re-run the
    whole signature pipeline for a second pass over the targets) — so
    per query and band at most ``max_bucket`` candidates arrive.
    Queries landing only in dropped buckets return no rows — the
    standard LSH degradation; the operator is approximate by
    contract. ``None`` disables the bound."""
    qk = queries.select(query_key, qvec)
    tk = targets.select(target_key, tvec)
    # candidate generation over SLIM (key, bucket) rows: the 64-float
    # payloads must not ride the bucket join, the max_bucket window, or
    # the pair dedup exchange (guide §8: decide with small rows, move
    # big rows once) — the old shape shuffled qvec+tvec on every
    # candidate row through dropDuplicates
    if portable:
        def _sigged(df, key, vec):
            exprs = srp_band_buckets_sql(vec, dim, bits, bands, seed)
            arr = "array(" + ", ".join(exprs) + ")"
            return (df.withColumn("bucket", F.explode(F.expr(arr)))
                    .select(key, "bucket"))
        qb = _sigged(qk, query_key, qvec)
        tb = _sigged(tk, target_key, tvec)
    else:
        sig = signature_udf(dim, bits, bands, seed)
        qb = qk.select(query_key,
                       F.explode(sig(F.col(qvec))).alias("bucket"))
        tb = tk.select(target_key,
                       F.explode(sig(F.col(tvec))).alias("bucket"))
    if max_bucket is not None:
        wb = Window.partitionBy("bucket")
        tb = (tb.withColumn("_bn", F.count("*").over(wb))
              .where(F.col("_bn") <= max_bucket).drop("_bn"))
    cand = qb.join(tb, on="bucket").select(query_key, target_key)
    if exclude_self:
        cand = cand.where(F.col(query_key) != F.col(target_key))
    cand = cand.dropDuplicates([query_key, target_key])
    # re-attach payloads once, per side, AFTER the pair set is final;
    # dot and both norms are numpy exact folds over the pair batch
    # (bit-identical to the old interpreted SQL folds — same IEEE op
    # order, see _pair_cosine_fn), computed in the join's own stage so
    # the vectors never cross another exchange: the window shuffles
    # only (q, t, cosine)
    joined = (cand.join(tk, on=target_key).join(qk, on=query_key)
              .select(query_key, target_key, qvec, tvec))
    scored = joined.mapInArrow(
        _pair_cosine_fn(query_key, target_key, qvec, tvec,
                        local_k=k),
        f"{query_key} long, {target_key} long, cosine double")
    w = Window.partitionBy(query_key).orderBy(
        F.col("cosine").desc(), F.col(target_key))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_key, target_key, "cosine", "rank"))


# ---------------------------------------------------------------------------
# IVF-flat ANN: deterministic coarse quantizer + probe search
# ---------------------------------------------------------------------------
#
# The second classic ANN scale path next to LSH: a coarse quantizer
# (k-means centroids) partitions the vectors; a query probes its
# nearest `probe` centroids and reranks only those clusters' vectors
# with the exact cosine. At 10^12 rows the cluster assignment is a
# stored column (partition key), so a probe touches probe/k of the
# data — the IVF dual of the LSH bucket join.
#
# Everything here is DETERMINISTIC and mirrored operation-for-
# operation by the DuckDB oracle (oracles.py ann_ivf):
# - centroid init: the vectors with target_key < k_clusters;
# - Lloyd rounds: assignment = argmax cosine with (cos DESC, cid)
#   tie-break; recompute = per-dimension mean where the sum FOLDS in
#   ascending target_key order from 0.0 (array_sort(collect_list) +
#   aggregate here, list(val ORDER BY t_id) + list_reduce there), so
#   float addition order is bit-identical;
# - probe/rerank reuse the exact-cosine fold of cosine_topk.


def _cos_vs_centroid(vec: str, cvec: str) -> str:
    dot = (f"aggregate(zip_with({vec}, {cvec}, (x, y) -> "
           f"CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), "
           f"(acc, v) -> acc + v)")
    cn = (f"aggregate({cvec}, CAST(0.0 AS DOUBLE), "
          f"(acc, v) -> acc + v * v)")
    return f"{dot} / (sqrt({norm2_expr(vec)}) * sqrt({cn}))"


def _assign(vectors: DataFrame, centroids: DataFrame, key: str,
            vec: str, topn: int = 1) -> DataFrame:
    """(key, cid) of the `topn` nearest centroids by cosine, ties by
    cid. One map-only Arrow pass: the centroids are driver-bounded (k
    rows — the same bound their broadcast already implied), collected
    once and closed over, so the old crossJoin's k-fold candidate
    blowup, the per-pair interpreted higher-order folds (zip_with/
    aggregate run OUTSIDE codegen), and the row_number window's
    (key)-exchange all disappear from the plan.

    The per-(vector, centroid) cosine is BIT-IDENTICAL to the SQL form
    ``_cos_vs_centroid`` (which the DuckDB oracle mirrors): ascending-
    index ``acc += x_j*y_j`` folds from 0.0 with separate IEEE-double
    multiply and add ufuncs (no FMA, no reassociation), float->double
    widening exact, denom = sqrt(qn)*sqrt(cn) then divide. Selection
    reproduces Spark's (cos DESC NaN-first, cid ASC) total order via
    key=-cos with NaN->-inf and a stable argsort over cid-ascending
    centroid columns (+/-inf cosines are impossible for finite
    inputs: a zero norm zeroes the dot too, giving NaN — which the
    old SQL form could not produce at all: ANSI mode raised
    DIVIDE_BY_ZERO on the 0/0, so zero-norm vectors crashed the
    query; here they deterministically take the lowest cid). Pinned
    against the SQL form in tests/test_similarity.py."""
    import pyarrow as pa

    crows = sorted((r["cid"], list(r["cvec"]))
                   for r in centroids.select("cid", "cvec").collect())
    cids = np.array([c for c, _ in crows], dtype=np.int64)
    cmat = np.array([v for _, v in crows], dtype=np.float64)  # (k, dim)
    kc = len(cids)
    cn = np.zeros(kc, np.float64)
    for j in range(cmat.shape[1]):
        cj = cmat[:, j]
        cn += cj * cj
    croot = np.sqrt(cn)
    nsel = min(topn, kc)

    def f(it):
        for b in it:
            n = b.num_rows
            if not n:
                continue
            col = b.column(b.schema.get_field_index(vec))
            x = np.asarray(col.flatten(),
                           dtype=np.float64).reshape(n, -1)
            dim = x.shape[1]
            qn = np.zeros(n, np.float64)
            for j in range(dim):
                xj = x[:, j]
                qn += xj * xj
            qroot = np.sqrt(qn)
            cos = np.empty((n, kc), np.float64)
            for ci in range(kc):
                dot = np.zeros(n, np.float64)
                cv = cmat[ci]
                for j in range(dim):
                    dot += x[:, j] * cv[j]
                with np.errstate(invalid="ignore", divide="ignore"):
                    cos[:, ci] = dot / (qroot * croot[ci])
            sortkey = np.negative(cos)
            np.copyto(sortkey, -np.inf, where=np.isnan(sortkey))
            order = np.argsort(sortkey, axis=1, kind="stable")[:, :nsel]
            keys = b.column(b.schema.get_field_index(key))
            out_keys = keys.take(
                pa.array(np.repeat(np.arange(n, dtype=np.int64), nsel)))
            yield pa.record_batch(
                [out_keys,
                 pa.array(cids[order].ravel(), type=pa.int64())],
                names=[key, "cid"])

    key_type = dict(vectors.dtypes)[key]
    return vectors.select(key, vec).mapInArrow(
        f, f"{key} {key_type}, cid long")


def ivf_fit(targets: DataFrame, k_clusters: int, iters: int = 2,
            target_key: str = "t_id", tvec: str = "tvec",
            fast: bool = False) -> DataFrame:
    """Deterministic k-means: seed from the k SMALLEST target keys
    (TakeOrderedAndProject — no full sort, works for offset / sparse /
    filtered key spaces, unlike a ``key < k`` predicate which silently
    under-seeds), then `iters` Lloyd rounds. Raises ValueError when
    fewer than k seed vectors exist. Returns (cid, cvec array<double>);
    cid = the seed row's key, so on dense 0-based keys the result is
    identical to the old predicate seeding (oracle unchanged there).

    Centroid recompute has the fast/portable dual every other operator
    here has:

    - ``fast=False`` (oracle mode): per-dimension mean where the sum
      FOLDS in ascending target_key order from 0.0 — array_sort(
      collect_list) + aggregate, bit-identical to the DuckDB oracle's
      list(val ORDER BY t_id) + list_reduce. The collect_list puts one
      cluster-dimension's every member value in a single aggregation
      buffer: fine at oracle scale, a memory bomb at 10^9 vectors.
    - ``fast=True`` (scale mode): plain avg() per (cid, pos) —
      map-side-combinable partial aggregation, NO collect_list
      anywhere in the plan; the k*dim mean rows (same driver-size
      bound as the broadcast centroids themselves) are assembled into
      centroid arrays driver-side, which also truncates the per-round
      lineage. Assignments agree with portable mode except where two
      centroids tie in cosine to machine precision (float-sum
      reordering); tests pin sf-corpus agreement.
    """
    seed = (targets
            .select(F.col(target_key).cast("long").alias("cid"),
                    F.expr(f"transform({tvec}, x -> CAST(x AS DOUBLE))")
                    .alias("cvec"))
            .orderBy("cid").limit(k_clusters))
    rows = seed.collect()  # <= k_clusters tiny rows; also truncates the
    # Lloyd plan chain at its root (c is referenced once per round)
    if len(rows) < k_clusters:
        raise ValueError(
            f"ivf_fit: need >= {k_clusters} target vectors to seed "
            f"centroids, got {len(rows)}")
    spark = targets.sparkSession
    c = spark.createDataFrame(rows, schema=seed.schema)
    for _ in range(iters):
        a = _assign(targets, c, target_key, tvec)
        pm = _centroid_means(a, targets, target_key, tvec, fast)
        if fast:
            by_cid: dict = {}
            for r in pm.collect():  # k_clusters * dim tiny rows
                by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
            data = [(cid, [d[p] for p in sorted(d)])
                    for cid, d in sorted(by_cid.items())]
            c = spark.createDataFrame(data, schema=seed.schema)
        else:
            c = pm.groupBy("cid").agg(F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), "
                "s -> s.m)").alias("cvec"))
    return c


def _centroid_means(assign: DataFrame, targets: DataFrame,
                    target_key: str, tvec: str,
                    fast: bool) -> DataFrame:
    """One Lloyd round's per-(cid, pos) means. fast=True is a plain
    avg() — map-side-combinable partials, no collect_list in the plan
    (pinned by test_similarity); fast=False is the oracle's sorted
    fold, which buffers every member value of a (cid, pos) group."""
    if fast:
        pe = (assign.join(targets.select(target_key, tvec),
                          on=target_key)
              .select("cid", F.posexplode(tvec).alias("pos", "val")))
        return (pe.groupBy("cid", "pos")
                .agg(F.avg(F.col("val").cast("double")).alias("m")))
    pe = (assign.join(targets.select(target_key, tvec), on=target_key)
          .select("cid", F.col(target_key).alias("_tk"),
                  F.posexplode(tvec).alias("pos", "val")))
    return (pe.groupBy("cid", "pos")
            .agg(F.expr("aggregate(array_sort(collect_list("
                        "struct(_tk, val))), CAST(0.0 AS DOUBLE), "
                        "(acc, s) -> acc + s.val)").alias("_s"),
                 F.count("*").alias("_n"))
            .withColumn("m", F.col("_s") / F.col("_n").cast("double")))


def ivf_topk(queries: DataFrame, targets: DataFrame, k: int,
             k_clusters: int = 8, probe: int = 2, iters: int = 2,
             query_key: str = "q_id", target_key: str = "t_id",
             qvec: str = "qvec", tvec: str = "tvec",
             exclude_self: bool = True, fast: bool = False) -> DataFrame:
    """IVF-flat approximate top-k: (query_key, target_key, cosine,
    rank). Candidates = vectors whose cluster is among the query's
    `probe` nearest centroids; rerank is the exact cosine fold.
    ``fast`` selects ivf_fit's avg()-based centroid recompute (the
    scale mode — see ivf_fit)."""
    c = ivf_fit(targets, k_clusters, iters=iters,
                target_key=target_key, tvec=tvec, fast=fast)
    # materialize the <= k_clusters centroid rows once: c is referenced
    # twice below and its plan is the whole multi-round Lloyd chain —
    # without this every reference re-runs the k-means end to end
    spark = targets.sparkSession
    c = spark.createDataFrame(c.collect(), schema=c.schema)
    t_assign = _assign(targets, c, target_key, tvec)
    q_probe = _assign(queries, c, query_key, qvec, topn=probe)
    cand = q_probe.join(t_assign, on="cid").select(query_key, target_key)
    if exclude_self:
        cand = cand.where(F.col(query_key) != F.col(target_key))
    qn = queries.withColumn("_qn", F.expr(norm2_expr(qvec)))
    tn = targets.withColumn("_tn", F.expr(norm2_expr(tvec)))
    scored = (cand.join(qn, on=query_key).join(tn, on=target_key)
              .withColumn("cosine", F.expr(
                  f"{dot_expr(qvec, tvec)} / (sqrt(_qn) * sqrt(_tn))")))
    w = Window.partitionBy(query_key).orderBy(
        F.col("cosine").desc(), F.col(target_key))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_key, target_key, "cosine", "rank"))
