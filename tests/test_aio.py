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


def test_async_custom_values_and_overlap(spark, tables):
    async def svc(nation_key):
        await asyncio.sleep(0.02)  # fake network latency
        return f"svc-{nation_key}"

    pipe = Pipeline({
        Tagged: {
            "c_custkey": Get("c_custkey") | Cast(int),
            "tag": Get("c_nationkey") | AsyncCustom(svc, max_concurrency=64),
        },
    })
    cust = tables["customer"].limit(120).coalesce(1)
    # warm the Python UDF workers so the timing below measures overlap,
    # not daemon startup (~4-5s for the first pandas UDF in a session)
    warm = Pipeline({Tagged: {
        "c_custkey": Get("c_custkey") | Cast(int),
        "tag": Get("c_nationkey") | AsyncCustom(svc, max_concurrency=64),
    }})
    warm.create_multiple(Tagged, cust.limit(1)).collect()
    t0 = time.monotonic()
    rows = pipe.create_multiple(Tagged, cust).collect()
    wall = time.monotonic() - t0
    assert len(rows) == 120
    got = {r.c_custkey: r.tag for r in rows}
    expect = {r.c_custkey: f"svc-{r.c_nationkey}"
              for r in cust.select("c_custkey", "c_nationkey").collect()}
    assert got == expect
    # serial would sleep >= 120 * 20ms = 2.4s BEFORE any Spark overhead;
    # overlapped at 64-wide it is ~2 rounds of 20ms plus overhead.  The
    # bound sits just under the serial sleep floor so it discriminates
    # overlap-vs-serial without flaking on a loaded host.
    assert wall < 2.2, f"async batch showed no overlap: {wall:.2f}s"


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
