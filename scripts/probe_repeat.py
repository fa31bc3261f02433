#!/usr/bin/env python
"""Diagnostic: run one headline query N times in one session, tracking
wall time, JVM thread count, FD count, and heap — hunts a
per-execution accumulation that would explain late-bench slowdowns.

Usage: probe_repeat.py <query> [N] [--interleave q2,q3,...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod
import __spark_entry__ as entrymod
from wrangle_pypes_spark.session import get_session


def jvm_stats(spark):
    jvm = spark._jvm
    t = jvm.java.lang.Thread.activeCount()
    mem = jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
    heap = mem.getHeapMemoryUsage().getUsed() / (1 << 20)
    # FD count of the JVM process (local mode: the gateway child)
    import glob
    import subprocess
    out = subprocess.run(["pgrep", "-f", "pyspark-shell"],
                         capture_output=True, text=True)
    fds = -1
    for pid in out.stdout.split():
        try:
            n = len(os.listdir(f"/proc/{pid}/fd"))
            fds = max(fds, n)
        except OSError:
            pass
    return t, heap, fds


def main():
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    inter = []
    if "--interleave" in sys.argv:
        inter = sys.argv[sys.argv.index("--interleave") + 1].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session("repeat-probe", cpus=cpus)
    qs = entrymod.queries()
    for i in range(n):
        for iq in inter:
            benchmod._consume(qs[iq](spark, sf_dir))
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        benchmod._consume(qs[name](spark, sf_dir))
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        th, heap, fds = jvm_stats(spark)
        print(f"run {i:2d}: {wall:7.2f}s threads={th} heap={heap:.0f}MB "
              f"fds={fds}", flush=True)


if __name__ == "__main__":
    main()
