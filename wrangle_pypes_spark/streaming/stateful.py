"""Custom stateful streaming operators (``applyInPandasWithState``).

This is the engine's escape hatch for streaming semantics that windowed
aggregation cannot express (per-key running state machines, custom
eviction).  The reference's closest analog is the async lookup loop
(``async/pipeline.py`` — IO concurrency, no state); here state is
Spark-managed: partitioned by key, checkpointed, restored on failure.

Scale notes: state lives in the state store partition-local to each
key's shuffle partition — the operator scales with keys/executors, but
unbounded keys need a timeout (GroupStateTimeout) so idle state is
evicted; ``stateful_running_counts`` exposes that knob.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_COUNTS_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def stateful_running_counts(events: DataFrame, *,
                            key_col: str = "user_id",
                            value_col: str = "value",
                            timeout: str = GroupStateTimeout.NoTimeout,
                            timeout_duration_ms: int = 3_600_000
                            ) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches.

    The windowed-agg operators cover time-bucketed rollups; this one is
    the template for arbitrary per-key accumulators (dedup-by-key,
    rate limiting, session machines with custom close rules).

    With ``timeout=GroupStateTimeout.ProcessingTimeTimeout`` a key idle
    for ``timeout_duration_ms`` is EVICTED (state removed, no row
    emitted) — the knob that bounds state for unbounded key spaces;
    the default NoTimeout keeps state forever.
    """

    def update(key: Tuple, pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if timeout != GroupStateTimeout.NoTimeout:
            state.setTimeoutDuration(timeout_duration_ms)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    return (events.groupBy(key_col)
            .applyInPandasWithState(update,
                                    outputStructType=RUNNING_COUNTS_SCHEMA,
                                    stateStructType=_STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=timeout))


_WELFORD_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("mean", T.DoubleType()),
    T.StructField("m2", T.DoubleType()),
])


def stateful_zscore(events: DataFrame, *, key_col: str = "user_id",
                    ts_col: str = "ts", value_col: str = "value",
                    min_periods: int = 5, threshold: float = 3.0,
                    tiebreak_cols: tuple = (),
                    timeout: str = GroupStateTimeout.NoTimeout,
                    timeout_duration_ms: int = 3_600_000
                    ) -> DataFrame:
    """Streaming per-key anomaly scoring — the streaming twin of
    ``operators.timeseries.rolling_zscore`` with an UNBOUNDED baseline:
    per key, a Welford accumulator (n, mean, M2) persists across
    micro-batches; each event is scored against the state BEFORE it is
    folded in (a spike never deflates its own baseline), emitting z and
    an ``is_anomaly`` flag, NULL until ``min_periods`` priors exist.

    Within a micro-batch events are processed in (``ts_col``,
    *tiebreak_cols) order ACROSS the whole batch — the group's Arrow
    chunks are concatenated before sorting, since the state store
    hands a large group to the update function as multiple chunks in
    arbitrary order and a per-chunk sort would fold events out of time
    order.  Pass a unique tiebreak (an event id) when timestamps can
    collide, or the fold order at a tie is input-order dependent.
    Replaying the same batches yields identical scores (per-key
    in-order delivery is the same contract as the SCD2 maintainer).
    State is three scalars per key — constant-size, spill-free; with
    ``timeout=GroupStateTimeout.ProcessingTimeTimeout`` a key idle for
    ``timeout_duration_ms`` is evicted (state removed, baseline resets
    on the key's next appearance).  Output schema derives from the
    input (key/ts/value keep their dtypes and names).
    """
    out_schema = T.StructType([
        events.schema[key_col], events.schema[ts_col],
        T.StructField(value_col, T.DoubleType()),
        T.StructField("n_prior", T.LongType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ])

    def update(key: Tuple, pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterable[pd.DataFrame]:
        import math

        if state.hasTimedOut:
            state.remove()
            return
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        out_ts, out_v, out_np, out_z, out_flag = [], [], [], [], []
        order = [ts_col, *tiebreak_cols]
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            whole = (pd.concat(chunks, ignore_index=True)
                     if len(chunks) > 1 else chunks[0])
            whole = whole.sort_values(order, kind="mergesort")
        else:
            whole = pd.DataFrame({ts_col: [], value_col: []})
        for ts, v in zip(whole[ts_col], whole[value_col]):
            if pd.isna(v):
                # match the batch twin: NULL values are scored as
                # unknown and NEVER folded into the baseline (one
                # NaN would poison mean/M2 for the key forever)
                out_ts.append(ts)
                out_v.append(None)
                out_np.append(n)
                out_z.append(None)
                out_flag.append(None)
                continue
            z = None
            if n >= min_periods and m2 > 0:
                std = math.sqrt(m2 / (n - 1))
                if std > 0:
                    z = (float(v) - mean) / std
            out_ts.append(ts)
            out_v.append(float(v))
            out_np.append(n)
            out_z.append(z)
            out_flag.append(None if z is None
                            else abs(z) > threshold)
            n += 1
            delta = float(v) - mean
            mean += delta / n
            m2 += delta * (float(v) - mean)
        state.update((n, mean, m2))
        if timeout != GroupStateTimeout.NoTimeout:
            state.setTimeoutDuration(timeout_duration_ms)
        yield pd.DataFrame({
            key_col: [key[0]] * len(out_v), ts_col: out_ts,
            value_col: out_v, "n_prior": out_np, "zscore": out_z,
            "is_anomaly": out_flag,
        })

    return (events.select(key_col, ts_col, value_col, *tiebreak_cols)
            .groupBy(key_col)
            .applyInPandasWithState(update,
                                    outputStructType=out_schema,
                                    stateStructType=_WELFORD_SCHEMA,
                                    outputMode="append",
                                    timeoutConf=timeout))
