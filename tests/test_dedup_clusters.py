"""connected_components / dup_clusters vs a union-find ground truth."""

import random

from geozero_spark.operators import dedup


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "doc_id_a long, doc_id_b long")
    got = {r["node"]: r["comp"]
           for r in dedup.connected_components(
               df, "doc_id_a", "doc_id_b").collect()}
    want = _uf_components(edges)
    assert got == want


def test_cc_chain(spark):
    # a long path needs multiple large/small-star rounds
    _check(spark, [(i, i + 1) for i in range(1, 41)])


def test_cc_reversed_chain_and_star(spark):
    _check(spark, [(i + 1, i) for i in range(1, 30)]
           + [(100, k) for k in range(101, 120)])


def test_cc_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n) + 1, rng.randrange(n) + 1)
                 for _ in range(45)]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges)


def test_cc_two_cliques_with_bridge(spark):
    clique1 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    clique2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    _check(spark, clique1 + clique2)
    _check(spark, clique1 + clique2 + [(5, 10)])


def test_dup_clusters_keep_policy(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 9)],
                                 "doc_id long")
    pairs = spark.createDataFrame([(2, 5), (5, 7), (3, 4)],
                                  "doc_id_a long, doc_id_b long")
    rows = {r["doc_id"]: (r["cluster_id"], r["keep"])
            for r in dedup.dup_clusters(docs, pairs).collect()}
    assert rows == {1: (1, True), 2: (2, True), 3: (3, True),
                    4: (3, False), 5: (2, False), 6: (6, True),
                    7: (2, False), 8: (8, True)}


def test_cc_empty_pairs(spark):
    pairs = spark.createDataFrame([], "doc_id_a long, doc_id_b long")
    assert dedup.connected_components(
        pairs, "doc_id_a", "doc_id_b").count() == 0
