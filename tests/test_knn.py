"""kNN correctness vs brute force, incl. the round-1 advisory repro:
at small res the cell disk wraps longitude (2*radius+1 > 2^res) and an
unclamped pmod produced duplicate candidates that row_number ranked
separately — the nearest target appeared at ranks 1 AND 2 while the
true second-nearest was dropped. _disk_cells now clamps the dx span."""

import numpy as np
import pytest

from geozero_spark.operators.knn import knn_join


def brute_topk(qrows, trows, k, exclude_self=True):
    """Ground-truth (query_key, target_key, dist2, rank) rows."""
    out = []
    for qid, qx, qy in qrows:
        cands = []
        for tid, tx, ty in trows:
            if exclude_self and tid == qid:
                continue
            d2 = (tx - qx) ** 2 + (ty - qy) ** 2
            cands.append((d2, tid))
        cands.sort()
        for rank, (d2, tid) in enumerate(cands[:k], start=1):
            out.append((qid, tid, d2, rank))
    return sorted(out)


def run_knn(spark, qrows, trows, k, res, exclude_self=True,
            method="grid"):
    q = spark.createDataFrame(qrows, "q_id long, qx long, qy long")
    t = spark.createDataFrame(trows, "t_id long, tx long, ty long")
    got = knn_join(q, t, k=k, res=res, exclude_self=exclude_self,
                   method=method)
    rows = sorted((r.q_id, r.t_id, r.dist2, r.rank) for r in got.collect())
    got.unpersist()
    return rows


def test_wrap_no_duplicate_neighbors(spark):
    # res=2 -> n=4 cells per axis; query far from both targets so the
    # disk must expand past radius 2 where 2r+1 > n wraps longitude.
    qrows = [(1, -17000, 0)]
    trows = [(10, 17000, 100), (11, 17000, 8000), (12, 17500, -8000)]
    got = run_knn(spark, qrows, trows, k=2, res=2)
    want = brute_topk(qrows, trows, k=2)
    assert got == want
    # explicitly: no target may appear twice for one query
    seen = {(q, t) for q, t, _, _ in got}
    assert len(seen) == len(got)


def test_knn_matches_brute_force_random(spark):
    rng = np.random.default_rng(7)
    # clustered + sparse mix forces several expansion rounds
    tx = rng.integers(-18000, 18000, size=60)
    ty = rng.integers(-9000, 9000, size=60)
    trows = [(int(i), int(x), int(y)) for i, (x, y) in
             enumerate(zip(tx, ty))]
    qx = rng.integers(-18000, 18000, size=25)
    qy = rng.integers(-9000, 9000, size=25)
    qrows = [(int(100 + i), int(x), int(y)) for i, (x, y) in
             enumerate(zip(qx, qy))]
    want = brute_topk(qrows, trows, k=3)
    for res in (2, 3, 5):
        got = run_knn(spark, qrows, trows, k=3, res=res)
        assert got == want, f"res={res}"
    # broadcast path: bit-identical to the grid path and brute force
    got_bc = run_knn(spark, qrows, trows, k=3, res=None,
                     method="broadcast")
    assert got_bc == want


def test_knn_exclude_self_and_ties(spark):
    # targets equidistant from the query: tie broken by target_key asc
    qrows = [(5, 0, 0)]
    trows = [(5, 0, 0), (9, 100, 0), (7, -100, 0), (8, 0, 100)]
    for method in ("grid", "broadcast"):
        got = run_knn(spark, qrows, trows, k=2, res=3, method=method)
        assert got == [(5, 7, 10000, 1), (5, 8, 10000, 2)], method


def test_knn_boundary_tie_explosion(spark):
    """More than k targets tie EXACTLY at the k-th distance (a ring of
    equidistant points): argpartition alone picks an arbitrary subset,
    so this pins the _select_topk tie widening — the winners must be
    the lowest target keys at the tied distance, on BOTH paths."""
    # query at origin; 6 targets all at dist2 = 100^2, keys shuffled
    qrows = [(1, 0, 0)]
    trows = [(37, 100, 0), (12, -100, 0), (99, 0, 100), (5, 0, -100),
             (64, 60, 80), (21, -60, -80), (88, 500, 500)]
    want = brute_topk(qrows, trows, k=3, exclude_self=False)
    q = spark.createDataFrame(qrows, "q_id long, qx long, qy long")
    t = spark.createDataFrame(trows, "t_id long, tx long, ty long")
    for method in ("grid", "broadcast"):
        got = sorted(
            (r["q_id"], r["t_id"], r["dist2"], r["rank"])
            for r in knn_join(q, t, k=3, res=2, exclude_self=False,
                              method=method).collect())
        assert got == sorted(want), method
