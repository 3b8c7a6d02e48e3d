#!/usr/bin/env python
"""Connected-components (dup_clusters) scaling at amortizing EDGE scale.

The dedup suite's dup_clusters stage runs over the planted-dup
corpus's LSH pairs — only ~30k edges at clones=200, so its wall is
almost entirely per-round fixed cost (localCheckpoint, the convergence
fingerprint job, ~8 scheduled stages per large-star/small-star round)
and its 2->8 ratio measures the round BARRIER, not the operator. This
harness times the same operator on a deterministic chain graph
(chains of CHAIN_LEN nodes over n ids -> n*(CHAIN_LEN-1)/CHAIN_LEN
edges, multi-round convergence) where every round moves millions of
rows — the regime a 100 TB near-dup graph actually occupies.

Levels run in taskset-pinned subprocesses (reused JVMs degrade the
second level; unpinned local[N] burns all machine cores in helper
threads), best-of-2 per level.

Usage: python scripts/cc_scaling.py [n_nodes]      # default 8_000_000
       python scripts/cc_scaling.py --level <cpus> <n>
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHAIN_LEN = 8


def level(cpus: int, n: int) -> None:
    from pyspark.sql import functions as F

    import bench
    from geozero_spark.operators import dedup

    spark = bench._session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    par = max(cpus * 4, 16)
    docs = spark.range(n, numPartitions=par) \
        .withColumnRenamed("id", "doc_id")
    edges = (spark.range(n, numPartitions=par)
             .where(F.expr(f"id % {CHAIN_LEN} != {CHAIN_LEN - 1} "
                           f"AND id + 1 < {n}"))
             .selectExpr("id AS doc_id_a", "id + 1 AS doc_id_b")
             .persist())
    n_edges = edges.count()
    walls = []
    kept = None
    for _ in range(2):
        t0 = time.perf_counter()
        kept = dedup.dup_clusters(docs, edges).where("keep").count()
        walls.append(round(time.perf_counter() - t0, 3))
    assert kept == -(-n // CHAIN_LEN), kept  # one survivor per chain
    print(json.dumps({"cpus": cpus, "nodes": n, "edges": n_edges,
                      "survivors": kept, "wall_s": min(walls),
                      "walls": walls,
                      "edges_per_s": round(n_edges / min(walls), 1)}))
    spark.stop()


def main():
    if "--level" in sys.argv:
        i = sys.argv.index("--level")
        level(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    import shutil
    out = {"workload": "dup_clusters over chain graph "
                       f"(chains of {CHAIN_LEN})",
           "levels": {}}
    for cpus in (2, 8):
        cmd = [sys.executable, os.path.abspath(__file__), "--level",
               str(cpus), str(n)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        o = subprocess.run(cmd, capture_output=True, text=True,
                           check=True, cwd=REPO).stdout
        line = [ln for ln in o.splitlines() if ln.startswith("{")][-1]
        out["levels"][str(cpus)] = json.loads(line)
    a = out["levels"]["2"]["edges_per_s"]
    b = out["levels"]["8"]["edges_per_s"]
    out["scaling_efficiency"] = round(b / (a * 4), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
