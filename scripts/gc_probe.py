#!/usr/bin/env python
"""Diagnostic (not part of the bench contract): run a prefix of the
headline list with per-query JVM GC/heap sampling to attribute the
in-bench slowdown of late queries (stream_stream_join reads 3.7 s
isolated but 19-28 s at bench position #63).  Guide §1: measure first.

Usage: gc_probe.py [N_PREFIX] [target1,target2,...]
Runs the first N_PREFIX headline queries once each, then the targets,
printing per-query wall, GC-time delta, and heap used.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod
import __spark_entry__ as entrymod
from wrangle_pypes_spark.session import get_session


def gc_stats(spark):
    jvm = spark._jvm
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    t = 0
    n = 0
    for i in range(beans.size()):
        b = beans.get(i)
        t += b.getCollectionTime()
        n += b.getCollectionCount()
    mem = jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
    used = mem.getHeapMemoryUsage().getUsed()
    return t / 1000.0, n, used / (1 << 20)


def main():
    # arg1: prefix as "N" (first N) or "A:B" (headline slice A..B)
    spec = sys.argv[1] if len(sys.argv) > 1 else "62"
    if ":" in spec:
        a, b = spec.split(":")
        lo, hi = int(a), int(b)
    else:
        lo, hi = 0, int(spec)
    targets = (sys.argv[2].split(",") if len(sys.argv) > 2
               else ["stream_stream_join"])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session("gc-probe", cpus=cpus)
    qs = entrymod.queries()
    names = benchmod.HEADLINE[lo:hi] + targets
    # warmup like the bench
    import os.path as osp
    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        f = osp.join(sf_dir, t + ".parquet")
        if osp.exists(f):
            benchmod._consume(spark.read.parquet(f))
    print(f"{'query':38s} {'wall':>7s} {'gc_d':>6s} {'gcn_d':>6s} {'heapMB':>8s}")
    gt0, gn0, _ = gc_stats(spark)
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        benchmod._consume(fn(spark, sf_dir))
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        gt1, gn1, heap = gc_stats(spark)
        print(f"{name:38s} {wall:7.2f} {gt1-gt0:6.2f} {gn1-gn0:6d} {heap:8.0f}",
              flush=True)
        gt0, gn0 = gt1, gn1


if __name__ == "__main__":
    main()
