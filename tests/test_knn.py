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


def _kernel_reference(qrows, trows, k, exclude_self):
    """Python ground truth for _local_topk_arrays: per query, the k
    nearest of these targets by (dist2, target_key); self-exclusion
    drops EVERY target sharing the query's key."""
    out = []
    for qid, qx, qy in qrows:
        cands = sorted(((tx - qx) ** 2 + (ty - qy) ** 2, tid)
                       for tid, tx, ty in trows
                       if not (exclude_self and tid == qid))
        out.extend((qid, tid, d2) for d2, tid in cands[:k])
    return sorted(out)


def _run_kernel(qrows, trows, k, exclude_self=True, budget=1 << 20):
    from geozero_spark.operators.knn import _local_topk_arrays
    qid = np.array([r[0] for r in qrows], np.int64)
    qx = np.array([r[1] for r in qrows], np.int64)
    qy = np.array([r[2] for r in qrows], np.int64)
    tid = np.array([r[0] for r in trows], np.int64)
    tx = np.array([r[1] for r in trows], np.int64)
    ty = np.array([r[2] for r in trows], np.int64)
    q, t, d = _local_topk_arrays(qid, qx, qy, tid, tx, ty, k,
                                 exclude_self, budget=budget)
    return sorted(zip(q.tolist(), t.tolist(), d.tolist()))


def test_kernel_packed_vs_int64_paths_match_reference():
    """The packed uint32 kernel (|coords| <= 23000) and the int64
    fallback must both equal the python reference — including at the
    envelope EDGE (+/-23000, where dx^2 = 46000^2 is within 1.5% of
    int32 max) and just past it (23001 flips the whole group to the
    int64 path). Tiny budget forces multi-chunk reuse of the scratch
    buffers."""
    rng = np.random.default_rng(11)
    nt, nq, k = 80, 37, 4
    tx = rng.integers(-23000, 23001, size=nt)
    ty = rng.integers(-23000, 23001, size=nt)
    trows = [(int(i), int(x), int(y)) for i, (x, y) in
             enumerate(zip(tx, ty))]
    # force the exact envelope corners in (targets and a query)
    trows[0] = (0, -23000, 23000)
    trows[1] = (1, 23000, -23000)
    qrows = [(int(200 + i), int(x), int(y)) for i, (x, y) in
             enumerate(zip(rng.integers(-23000, 23001, size=nq),
                           rng.integers(-23000, 23001, size=nq)))]
    qrows[0] = (200, 23000, 23000)
    for budget in (1 << 20, 16):  # 16: chunk=1, many refills
        got = _run_kernel(qrows, trows, k, exclude_self=False,
                          budget=budget)
        assert got == _kernel_reference(qrows, trows, k, False), budget
    # one out-of-envelope coordinate -> whole group takes the int64
    # path; same answers for the same geometry shifted out of range
    shift = 30000
    trows_s = [(i, x + shift, y) for i, x, y in trows]
    qrows_s = [(i, x + shift, y) for i, x, y in qrows]
    got_s = _run_kernel(qrows_s, trows_s, k, exclude_self=False)
    assert got_s == _kernel_reference(qrows_s, trows_s, k, False)
    # the shifted run preserves the unshifted distances (pure
    # translation): cross-check the two paths compute the same top-k
    got = _run_kernel(qrows, trows, k, exclude_self=False)
    assert [(q - 0, t, d) for q, t, d in got] == \
        [(q, t, d) for q, t, d in got_s]


def test_kernel_exclude_self_duplicate_keys_and_small_nt():
    """Self-exclusion must drop EVERY target row sharing the query's
    key (duplicate keys: the searchsorted lo:hi span), k >= nt takes
    the no-argpartition branch, and all-identical coordinates tie on
    every row (the packed key's tie-break by target key)."""
    trows = [(7, 0, 0), (7, 50, 0), (3, 100, 100), (9, -40, 30),
             (12, 0, -60)]
    qrows = [(7, 10, 10), (5, 0, 0)]
    for k in (2, 5, 9):
        got = _run_kernel(qrows, trows, k, exclude_self=True)
        assert got == _kernel_reference(qrows, trows, k, True), k
    # every target at the same point: full tie field, winners must be
    # the lowest target keys
    trows = [(i, 500, 500) for i in (31, 4, 17, 25, 8)]
    qrows = [(100, 0, 0)]
    got = _run_kernel(qrows, trows, 3, exclude_self=False)
    assert got == [(100, 4, 500000), (100, 8, 500000),
                   (100, 17, 500000)]
