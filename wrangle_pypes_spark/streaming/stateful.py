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
                            timeout: str = GroupStateTimeout.NoTimeout
                            ) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches.

    The windowed-agg operators cover time-bucketed rollups; this one is
    the template for arbitrary per-key accumulators (dedup-by-key,
    rate limiting, session machines with custom close rules).
    """

    def update(key: Tuple, pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterable[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    return (events.groupBy(key_col)
            .applyInPandasWithState(update,
                                    outputStructType=RUNNING_COUNTS_SCHEMA,
                                    stateStructType=_STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=timeout))
