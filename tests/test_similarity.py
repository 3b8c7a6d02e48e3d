"""ANN quality: recall floor of the banded-LSH path vs exact cosine,
plus parity of the numpy fast signature path with the portable one."""

from pyspark.sql import functions as F

from conftest import SF_DIR
from geozero_spark import queries as Q
from geozero_spark.operators import similarity as S


def test_ann_recall_floor(spark):
    rows = Q.q_ann_recall(spark, SF_DIR).collect()
    assert rows, "no query rows"
    mean = sum(r.recall for r in rows) / len(rows)
    # measured 0.922 at sf0.001 with LSH_BITS=48 / LSH_BANDS=16;
    # deterministic (hash planes), so a drop means the pipeline changed
    assert mean >= 0.85, f"mean recall@{Q.ANN_K} fell to {mean:.3f}"


def test_ann_fast_mode_runs_same_shape(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = (e.where(F.col("vec_id") % Q.QUERY_MOD == 0)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("qvec")))
    t = e.select(F.col("vec_id").alias("t_id"),
                 F.col("embedding").alias("tvec"))
    fast = S.ann_topk(q, t, k=Q.ANN_K, dim=Q.EMB_DIM, portable=False)
    assert fast.columns == ["q_id", "t_id", "cosine", "rank"]
    rows = fast.collect()
    assert rows
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in per_q.values())


def test_ann_ivf_recall_floor(spark):
    """IVF probe search quality: with probe=2 of 8 clusters each query
    scans ~25% of the vectors; on the near-random synthetic embeddings
    that bounds recall well below LSH's, but it must beat the
    scan-fraction baseline by a wide margin (clusters are informative)
    and stay deterministic."""
    rows = Q.q_ann_ivf_recall(spark, SF_DIR).collect()
    assert rows
    mean = sum(r.recall for r in rows) / len(rows)
    frac = Q.IVF_PROBE / Q.IVF_K
    assert mean >= 1.6 * frac, (
        f"mean IVF recall@{Q.ANN_K} {mean:.3f} is not meaningfully "
        f"above the {frac:.2f} scan-fraction baseline")


def test_ann_degenerate_bucket_capped(spark):
    """Adversarial skew: a mass of byte-identical embeddings signs
    identically in every band, so without a cap the bucket join is
    quadratic in the mass. With max_bucket the degenerate buckets are
    dropped from the target side: the run completes with bounded
    candidates and the identical-mass queries simply return no rows
    (standard LSH degradation), while the cap leaves small buckets
    untouched."""
    dim, mass = 8, 500
    e = spark.range(mass + 20).selectExpr(
        "id AS vec_id",
        # ids < mass: the identical vector; others: distinct hash-
        # uniform vectors
        f"IF(id < {mass}, array_repeat(CAST(1.0 AS FLOAT), {dim}), "
        f"transform(sequence(0, {dim - 1}), j -> CAST("
        f"pmod(xxhash64(id, j), 2000) - 1000 AS FLOAT) / 1000.0)) "
        "AS embedding")
    q = (e.where((F.col("vec_id") % 100 == 0))
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("qvec")))
    t = e.select(F.col("vec_id").alias("t_id"),
                 F.col("embedding").alias("tvec"))
    capped = S.ann_topk(q, t, k=3, dim=dim, bits=16, bands=4,
                        max_bucket=100).collect()
    mass_q = {r.q_id for r in capped if r.q_id < mass}
    assert mass_q == set(), (
        f"identical-mass queries {mass_q} produced candidates through "
        f"a bucket that should have been dropped")
    # uncapped: the same mass queries DO match (1999-way identical
    # candidates) — the quadratic shape the cap exists to avoid
    uncapped = S.ann_topk(q, t, k=3, dim=dim, bits=16, bands=4,
                          max_bucket=None).collect()
    assert any(r.q_id < mass for r in uncapped)
    # distinct vectors keep their candidates under the cap iff their
    # buckets are small: every capped row scores a real cosine
    assert all(r.cosine <= 1.0 + 1e-9 for r in capped)


def test_ivf_fast_matches_portable_assignments(spark):
    """fast=True (avg-based means) must assign every sf vector to the
    same cluster as the portable sorted-fold mode — the float-sum
    reorder only matters at exact cosine ties, which the synthetic
    corpus does not produce."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    t = e.select(F.col("vec_id").alias("t_id"),
                 F.col("embedding").alias("tvec"))
    c_p = S.ivf_fit(t, Q.IVF_K, iters=Q.IVF_ITERS, fast=False)
    c_f = S.ivf_fit(t, Q.IVF_K, iters=Q.IVF_ITERS, fast=True)
    # centroids agree to float-reassociation tolerance
    p = {r.cid: r.cvec for r in c_p.collect()}
    f = {r.cid: r.cvec for r in c_f.collect()}
    assert p.keys() == f.keys()
    for cid in p:
        assert max(abs(a - b) for a, b in zip(p[cid], f[cid])) < 1e-9
    a_p = S._assign(t, spark.createDataFrame(
        [(k, v) for k, v in sorted(p.items())],
        "cid long, cvec array<double>"), "t_id", "tvec")
    a_f = S._assign(t, spark.createDataFrame(
        [(k, v) for k, v in sorted(f.items())],
        "cid long, cvec array<double>"), "t_id", "tvec")
    m_p = {r.t_id: r.cid for r in a_p.collect()}
    m_f = {r.t_id: r.cid for r in a_f.collect()}
    assert m_p == m_f


def test_assign_matches_sql_fold_bitwise(spark):
    """The numpy _assign must reproduce the old SQL form — crossJoin +
    _cos_vs_centroid interpreted folds + (cos DESC, cid) row_number —
    EXACTLY, row for row, because the ann_ivf oracle mirrors that SQL.
    Covers topn=1 and topn=3 on the sf corpus. A zero-norm vector is
    checked numpy-side only: its cosine is NaN against every centroid
    and it lands on the LOWEST cid (NaN-first DESC order) — the SQL
    form cannot even run that case, ANSI mode raises DIVIDE_BY_ZERO
    on the 0/0."""
    from pyspark.sql import Window

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    t = e.select(F.col("vec_id").alias("t_id"),
                 F.col("embedding").alias("tvec"))
    dim = len(t.select("tvec").head()[0])
    zero = spark.range(1).selectExpr(
        "id + 1000000 AS t_id",
        f"array_repeat(CAST(0.0 AS FLOAT), {dim}) AS tvec")
    c = S.ivf_fit(t, Q.IVF_K, iters=1, fast=False)
    c = spark.createDataFrame(c.collect(), schema=c.schema)

    def sql_assign(vectors, centroids, topn):
        cand = vectors.select("t_id", "tvec").crossJoin(
            F.broadcast(centroids))
        cand = cand.withColumn(
            "_cos", F.expr(S._cos_vs_centroid("tvec", "cvec")))
        w = Window.partitionBy("t_id").orderBy(
            F.col("_cos").desc(), "cid")
        return (cand.withColumn("_rk", F.row_number().over(w))
                .where(F.col("_rk") <= topn).select("t_id", "cid"))

    for topn in (1, 3):
        got = sorted((r.t_id, r.cid) for r in
                     S._assign(t, c, "t_id", "tvec", topn=topn)
                     .collect())
        want = sorted((r.t_id, r.cid) for r in
                      sql_assign(t, c, topn).collect())
        assert got == want, f"topn={topn} mismatch"
    low_cids = sorted(r.cid for r in c.collect())[:1]
    zero_rows = [r.cid for r in
                 S._assign(zero, c, "t_id", "tvec").collect()]
    assert zero_rows == low_cids


def test_ivf_fast_plan_has_no_collect_list(spark):
    """The scale mode's per-round mean aggregation must be a plain
    partial-aggregating avg(): no collect_list (the per-cluster memory
    bomb) anywhere in its optimized plan. The portable mode keeps it —
    that IS the oracle's sorted fold."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    t = e.select(F.col("vec_id").alias("t_id"),
                 F.col("embedding").alias("tvec"))
    c = S.ivf_fit(t, Q.IVF_K, iters=0, fast=True)
    a = S._assign(t, c, "t_id", "tvec")
    fast_plan = S._centroid_means(a, t, "t_id", "tvec", True) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in fast_plan
    slow_plan = S._centroid_means(a, t, "t_id", "tvec", False) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" in slow_plan
