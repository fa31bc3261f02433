"""Async surface: AsyncCustom + async_get_or_create.

Parity: reference ``wrangle_pypes/async/`` — async per-record Custom and
the async external-service get_or_create protocol.  Here the event loop
runs inside Arrow batches on the executors; these tests check (1) value
semantics match the sync path, (2) concurrency actually overlaps IO,
(3) the service is called once per distinct key, not once per row.
Service-call counting goes through a shared file because pandas-UDF
code runs in separate Python worker processes, not the test process.
"""

import asyncio
import time

import pytest
from pyspark.sql import functions as F

from wrangle_pypes_spark import (
    AsyncCustom,
    Cast,
    Expr,
    Get,
    Pipeline,
    async_get_or_create,
)
from wrangle_pypes_spark.aio import gather_bounded


def _prefix(p):
    return Expr(lambda c: F.concat(F.lit(p), c), out_type=str)


# -- gather_bounded ---------------------------------------------------------

def test_gather_bounded_orders_and_limits():
    peak = 0
    active = 0

    async def task(i):
        nonlocal peak, active
        active += 1
        peak = max(peak, active)
        await asyncio.sleep(0.005)
        active -= 1
        return i * 2

    out = gather_bounded([task(i) for i in range(40)], max_concurrency=8)
    assert out == [i * 2 for i in range(40)]
    assert peak <= 8


# -- AsyncCustom in a normal sync Pipeline spec -----------------------------

class Tagged:
    pass


def test_async_custom_values_and_overlap(spark, tables, tmp_path):
    # Overlap is proven from EVIDENCE, not wall clock: every service
    # call logs its (start, end) interval to a file shared with the
    # local[*] worker processes, and the assertion is on the peak
    # number of simultaneously-open intervals.  A wall-time bound
    # flakes whenever the host is loaded; interval overlap is invariant
    # to scheduling delays — serial execution has peak 1 no matter how
    # slow the box is.
    log = str(tmp_path / "svc_calls.log")

    async def svc(nation_key):
        t0 = time.monotonic()
        await asyncio.sleep(0.02)  # fake network latency
        t1 = time.monotonic()
        with open(log, "a") as f:
            f.write(f"{t0},{t1}\n")
        return f"svc-{nation_key}"

    pipe = Pipeline({
        Tagged: {
            "c_custkey": Get("c_custkey") | Cast(int),
            "tag": Get("c_nationkey") | AsyncCustom(svc, max_concurrency=64),
        },
    })
    cust = tables["customer"].limit(120).coalesce(1)
    rows = pipe.create_multiple(Tagged, cust).collect()
    assert len(rows) == 120
    got = {r.c_custkey: r.tag for r in rows}
    expect = {r.c_custkey: f"svc-{r.c_nationkey}"
              for r in cust.select("c_custkey", "c_nationkey").collect()}
    assert got == expect
    intervals = [tuple(map(float, line.split(",")))
                 for line in open(log).read().splitlines() if line]
    assert len(intervals) == 120
    points = []
    for a, b in intervals:
        points.append((a, 1))
        points.append((b, -1))
    peak = cur = 0
    for _, delta in sorted(points):  # ends sort before starts on ties
        cur += delta
        peak = max(peak, cur)
    # 120 calls through a 64-wide gather on one coalesced partition:
    # the sleeps must genuinely interleave.  Serial execution peaks at
    # 1; demand a healthy margin over that without requiring the full
    # 64 (the event loop staggers task starts).
    assert peak >= 8, f"async calls barely overlapped: peak={peak}"


# -- async_get_or_create ----------------------------------------------------

def test_async_get_or_create_hits_and_misses(spark, tables, tmp_path):
    # local class: cloudpickle serializes it by value, so the mapInPandas
    # closure that captures `model` survives the trip to the workers
    class DimNation:
        pass

    call_log = str(tmp_path / "svc_calls.log")

    async def lookup(model, kwargs):
        await asyncio.sleep(0.001)
        nk = kwargs["nk"]
        with open(call_log, "a") as f:  # O_APPEND short writes are atomic
            f.write(f"{nk}\n")
        if nk < 13:
            return {"nk": nk, "name": f"cached-{nk}"}
        return None

    pipe = Pipeline({
        DimNation: {
            "nk": Get("c_nationkey") | Cast(int),
            "name": Get("c_nationkey") | Cast(str) | _prefix("built-"),
        },
    })
    out = async_get_or_create(pipe, DimNation, tables["customer"],
                              ["nk"], lookup=lookup).collect()
    assert len(out) == tables["customer"].count()
    for r in out:
        if r.nk < 13:
            assert r.name == f"cached-{r.nk}" and r.created is False
        else:
            assert r.name == f"built-{r.nk}" and r.created is True

    # one service call per DISTINCT key, not per row (and no recompute
    # of the fetched side during the join-back — it is persisted)
    calls = [int(x) for x in open(call_log).read().split()]
    distinct_keys = tables["customer"].select("c_nationkey").distinct().count()
    assert len(set(calls)) == distinct_keys
    assert len(calls) == distinct_keys, \
        f"service called {len(calls)} times for {distinct_keys} keys"


def test_async_get_or_create_requires_targets(spark, tables):
    class DimNation:
        pass

    async def lookup(model, kwargs):
        return None

    pipe = Pipeline({DimNation: {"nk": Get("c_nationkey") | Cast(int)}})
    with pytest.raises(ValueError):
        async_get_or_create(pipe, DimNation, tables["customer"], [],
                            lookup=lookup)
