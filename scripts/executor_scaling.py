#!/usr/bin/env python
"""Executor-count scaling for the map-only training-data stages.

``bench.py --scaling-dedup`` models N vs 4N executors as local[2] vs
local[8] in ONE JVM. That is faithful for shuffles (one exchange
fabric) but pessimistic for the shuffle-free stages: 8 task threads
share a single JVM heap/allocator, and the HOF-interpreted hash
pipelines (simhash, MinHash signatures, token stats) are
allocation-bound, so the shared allocator — not the plan — caps the
in-JVM ratio (~0.75 measured). A real 4N-executor cluster has 4x
JVMs, 4x heaps, 4x allocators.

This harness models that directly: K concurrent taskset-pinned
subprocesses, each its own local[2] JVM ("executor") processing a
disjoint slice of the input files — exactly how a map stage partitions
across executors. A file barrier start-syncs the JVMs so contention
windows fully overlap (self-timed parallel benches without a barrier
overstate throughput — measured on membw.py). Shuffle stages are NOT
run here (4 separate JVMs have no exchange fabric; their evidence is
the single-JVM harness + the geo suite's 0.847).

Usage: python scripts/executor_scaling.py            # K=1 then K=4
       python scripts/executor_scaling.py --child <cpus> <listfile> <go>
"""

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLONES = int(os.environ.get("SPARK_GRAFT_DEDUP_CLONES", "100"))
CORES_PER_EXEC = 2
K = 4
# comma list of stages to run (subset of text_stats,simhash,
# minhash_sigs): the big-corpus runs target one allocation-bound
# stage without paying the others at that scale
STAGES = os.environ.get(
    "SPARK_GRAFT_EXEC_STAGES", "text_stats,simhash,minhash_sigs"
).split(",")


def child(cpus: int, listfile: str, gofile: str) -> None:
    from pyspark.sql import functions as F

    import bench
    from geozero_spark.operators import dedup, textstats

    files = [ln.strip() for ln in open(listfile) if ln.strip()]
    spark = bench._session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(*files).select("doc_id", "text")
    n = docs.count()
    # signal ready, then spin until every executor is up: the timed
    # window must overlap across JVMs or contention is understated
    open(listfile + ".ready", "w").write("1")
    while not os.path.exists(gofile):
        time.sleep(0.05)
    t = {}

    def timed(name, fn):
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        t[name] = round(min(walls), 3)

    if "text_stats" in STAGES:
        timed("text_stats", lambda: textstats.quality_score(
            textstats.token_stats(docs)).select(
            F.sum("quality")).collect())
    if "simhash" in STAGES:
        timed("simhash", lambda: dedup.simhash(docs, fast=True).select(
            F.expr("bit_xor(simhash)")).collect())
    if "minhash_sigs" in STAGES:
        timed("minhash_sigs", lambda: dedup.minhash_signatures(
            docs, fast=True).select(
            F.expr("bit_xor(element_at(sig, 1))")).collect())
    print(json.dumps({"rows": n, "timings": t}), flush=True)
    spark.stop()


def run_level(k: int, files: list, tag: str) -> dict:
    import shutil
    procs, lists = [], []
    gofile = f"/tmp/gz_execscale_{tag}_go"
    if os.path.exists(gofile):
        os.remove(gofile)
    for i in range(k):
        lf = f"/tmp/gz_execscale_{tag}_{i}.txt"
        with open(lf, "w") as f:
            f.write("\n".join(files[i::k]))
        for stale in (lf + ".ready",):
            if os.path.exists(stale):
                os.remove(stale)
        lists.append(lf)
        cpu_lo = i * CORES_PER_EXEC
        cmd = [sys.executable, os.path.abspath(__file__), "--child",
               str(CORES_PER_EXEC), lf, gofile]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c",
                   f"{cpu_lo}-{cpu_lo + CORES_PER_EXEC - 1}"] + cmd
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, cwd=REPO))
    while not all(os.path.exists(lf + ".ready") for lf in lists):
        time.sleep(0.2)
    open(gofile, "w").write("go")
    outs = []
    for p in procs:
        out, _ = p.communicate()
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))
    stages = outs[0]["timings"].keys()
    return {
        "executors": k,
        "rows_total": sum(o["rows"] for o in outs),
        "stage_wall": {s: round(max(o["timings"][s] for o in outs), 3)
                       for s in stages},
    }


def main():
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(int(sys.argv[i + 1]), sys.argv[i + 2], sys.argv[i + 3])
        return
    import bench
    s = bench._session(8)
    s.sparkContext.setLogLevel("ERROR")
    path = bench._docs_parquet(s, CLONES)
    s.stop()
    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) >= K, files
    one = run_level(1, files, "k1")
    four = run_level(K, files, "k4")
    eff = {s: round(one["stage_wall"][s] / (K * four["stage_wall"][s]),
                    3)
           for s in one["stage_wall"]}
    print(json.dumps({
        "model": f"{K} pinned local[{CORES_PER_EXEC}] JVMs vs 1 "
                 f"(map-only stages; data split by file)",
        "clones": CLONES, "rows": one["rows_total"],
        "one_executor": one, "four_executors": four,
        "per_stage_efficiency": eff}))


if __name__ == "__main__":
    main()
