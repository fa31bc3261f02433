#!/usr/bin/env python
"""Diagnostic: run the stream_stream_join drain and dump per-batch
progress durations + row counts (guide §1: attribute before changing)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wrangle_pypes_spark.session import get_session
from wrangle_pypes_spark.streaming.windows import (
    stream_events, stream_stream_interval_join)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session("ssj-probe", cpus=cpus)
    for rnd in range(3):
        a = stream_events(spark, sf_dir).select(
            "user_id", F.col("event_id").alias("id_a"),
            F.col("ts").alias("ts_a"))
        b = stream_events(spark, sf_dir).select(
            "user_id", F.col("event_id").alias("id_b"),
            F.col("ts").alias("ts_b"))
        joined = stream_stream_interval_join(
            a, b, on="user_id", left_ts="ts_a", right_ts="ts_b",
            upper_seconds=3600)
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        t0 = time.perf_counter()
        q = (joined.writeStream.format("memory")
             .queryName(f"ssj_probe_{rnd}")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        t1 = time.perf_counter()
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        n = spark.table(f"ssj_probe_{rnd}").count()
        t2 = time.perf_counter()
        print(f"ROUND {rnd}: drain={t1-t0:.2f}s count_after={t2-t1:.2f}s "
              f"rows={n} batches={len(q.recentProgress)}")
        for p in q.recentProgress:
            d = p["durationMs"]
            print("  batch", p["batchId"], "rows", p["numInputRows"],
                  json.dumps(d))
            for s in p.get("stateOperators", []):
                print("    state: commit={} rowsTotal={} memUsed={}".format(
                    s.get("commitTimeMs"), s.get("numRowsTotal"),
                    s.get("memoryUsedBytes")))


if __name__ == "__main__":
    main()
