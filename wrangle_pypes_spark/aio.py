"""Async surface: IO-concurrent per-record lookups, Spark-first.

Parity target: reference ``wrangle_pypes/async/`` (``async/pipeline.py``
175 LoC + ``async/transformations.py`` 270 LoC).  The reference clones
every transformation with an ``async def apply`` so per-record IO — the
``lookup`` coroutine of ``async/pipeline.py:55-88`` — can overlap while
a single Python thread walks the records.  On Spark that design
inverts: pure transformations are already parallel across partitions
and need no ``await``, so duplicating ``Get``/``Map``/``If``/... as
async classes would add surface without adding concurrency.  The one
genuinely asynchronous thing is EXTERNAL IO, so this module ships
exactly that:

- :class:`AsyncCustom` — drop an ``async def`` straight into a normal
  (sync) :class:`~wrangle_pypes_spark.pipeline.Pipeline` spec.  It
  compiles to an Arrow-batched UDF that runs ONE event loop per batch
  and overlaps up to ``max_concurrency`` coroutines — the reference's
  async ``Custom`` (``async/transformations.py:69-74``), but with the
  event loop pushed down next to the data instead of on the driver.
- :func:`async_get_or_create` — the reference
  ``AsyncPipeline.get_or_create`` protocol (``async/pipeline.py:55-88``)
  against an external async service: build candidates declaratively,
  look up each DISTINCT match-key once (concurrently, inside
  ``mapInPandas``), left-join the answers back, and mark the misses
  ``created=True``.  Where the reference awaits one lookup per record,
  this does ``min(distinct keys, records)`` lookups total, spread over
  every executor, each with its own in-flight window.

Scale: with 1000 executors and ``max_concurrency=64`` the steady state
is 64k in-flight requests cluster-wide — size ``max_concurrency`` to
what the external service can take, and pre-``repartition`` the key set
if you need to cap the number of concurrently fetching tasks.  The
event loop lives only for the lifetime of a batch; no state leaks
across batches or tasks.
"""

from __future__ import annotations

import asyncio
from dataclasses import dataclass
from typing import Any, Awaitable, Callable, Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .transformations import Transformation, resolve_cast_target

__all__ = ("AsyncCustom", "async_get_or_create", "gather_bounded")


def gather_bounded(coros: Sequence[Awaitable[Any]], max_concurrency: int):
    """Run coroutines on a fresh event loop with at most
    ``max_concurrency`` in flight; results in submission order.

    A new loop per call (= per Arrow batch) keeps executor tasks
    isolated — no shared loop across threads, nothing to clean up on
    task death.  Loop startup is microseconds against a batch of
    thousands of IO calls.
    """

    async def _run():
        sem = asyncio.Semaphore(max_concurrency)

        async def _one(coro):
            async with sem:
                return await coro

        return await asyncio.gather(*[_one(c) for c in coros])

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(_run())
    finally:
        # close the per-batch loop (don't lean on __del__: that's a
        # ResourceWarning per batch and a leaked epoll fd until GC);
        # cancel stragglers first so a raising coroutine doesn't leave
        # siblings "never awaited"
        pending = asyncio.all_tasks(loop)
        for t in pending:
            t.cancel()
        if pending:
            loop.run_until_complete(
                asyncio.gather(*pending, return_exceptions=True))
        loop.close()


@dataclass(frozen=True)
class AsyncCustom(Transformation):
    """Async per-value function as a pipeline step (reference async
    ``Custom``, ``async/transformations.py:69-74``).

    ``func`` is ``async def f(value) -> result``.  Compilation wraps it
    in an Arrow-batched pandas UDF: each batch starts an event loop,
    launches one coroutine per value with ``max_concurrency`` in
    flight, and returns results in order.  Use for IO-bound enrichment
    (HTTP, RPC, external caches); CPU-bound work gains nothing from the
    loop and belongs in :class:`~wrangle_pypes_spark.transformations.Expr`
    or a plain vectorized :class:`Custom`.
    """

    func: Callable[[Any], Awaitable[Any]]
    return_type: Any = T.StringType()
    max_concurrency: int = 64

    def compile(self, ctx, col, dtype):
        to = resolve_cast_target(self.return_type)
        fn, limit = self.func, self.max_concurrency

        def _batch(s: pd.Series) -> pd.Series:
            out = gather_bounded([fn(v) for v in s], limit)
            return pd.Series(out, index=s.index, dtype=object)

        udf = F.pandas_udf(_batch, returnType=to)
        return udf(col), to


def async_get_or_create(
    pipeline,
    model: type,
    df: DataFrame,
    match_targets: Sequence[str],
    *,
    lookup: Callable[[type, dict], Awaitable[Optional[dict]]],
    max_concurrency: int = 64,
    created_col: str = "created",
    cache_registry: Optional[list] = None,
) -> DataFrame:
    """Get-or-create against an EXTERNAL async service (reference
    ``AsyncPipeline.get_or_create``, ``async/pipeline.py:55-88``).

    ``lookup(model, {target: value, ...})`` is awaited once per DISTINCT
    match-key combination and returns the stored instance as a
    field-name dict, or ``None`` for a miss.  Rows whose key the service
    knows get the SERVICE's field values and ``created=False``; misses
    keep the pipeline-built values and ``created=True`` — exactly the
    reference's per-record contract, vectorized.

    The sibling :meth:`Pipeline.get_or_create` is the right call when
    the "service" can be loaded as a dimension DataFrame; this function
    exists for services that only answer point queries.

    Scale: one service call per distinct key (not per record) — the
    dedup happens in the plan (``distinct()``), so a 1B-row input with
    1M distinct keys costs 1M calls spread over the cluster.  The
    fetched key set is persisted before the join-back so the service is
    never called twice for one key.

    The persisted frame must outlive the caller's action (unpersisting
    earlier would re-fire the service calls), so it cannot be dropped
    here.  Long-lived drivers that loop over batches should pass a list
    as ``cache_registry``: the persisted key frame is appended to it,
    and the caller ``unpersist()``s the entries after materializing
    each batch — otherwise cached key frames accumulate for the
    session's lifetime.  (An explicit out-param rather than an
    attribute on the result: any further DataFrame transformation
    returns a NEW frame, so an attribute handle is lost exactly when
    users chain, which they always do.)
    """
    if not match_targets:
        raise ValueError("async_get_or_create requires match_targets")

    built = pipeline.create_multiple(model, df)
    model_schema = built.schema
    key_fields = [model_schema[t] for t in match_targets]
    found_t = T.StructType(list(model_schema.fields))
    fetch_schema = T.StructType(
        list(key_fields) + [T.StructField("_found", found_t, True)])
    field_names = [f.name for f in model_schema.fields]

    def _fetch(batches):
        for pdf in batches:
            records = pdf.to_dict("records")
            results = gather_bounded(
                [lookup(model, dict(r)) for r in records], max_concurrency)
            pdf = pdf.copy()
            pdf["_found"] = [
                None if r is None else {n: r.get(n) for n in field_names}
                for r in results
            ]
            yield pdf

    fetched = (built.select(*match_targets).distinct()
               .mapInPandas(_fetch, schema=fetch_schema)
               .persist())

    joined = built.join(fetched, on=list(match_targets), how="left")
    hit = F.col("_found").isNotNull()
    out_cols = []
    for name in field_names:
        if name in match_targets:
            out_cols.append(F.col(name))
        else:
            out_cols.append(
                F.when(hit, F.col(f"_found.{name}"))
                .otherwise(F.col(name)).alias(name))
    out = joined.select(*out_cols, (~hit).alias(created_col))
    if cache_registry is not None:
        cache_registry.append(fetched)  # cleanup handle (see docstring)
    return out
