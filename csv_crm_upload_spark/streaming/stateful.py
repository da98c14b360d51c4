"""Custom stateful streaming operator via applyInPandasWithState —
the extension point for semantics Spark's built-in windows can't express.

Implemented operator: per-user running upload budget / anomaly flagging.
For each user_id, maintain (total_value, n_events) across micro-batches
and emit rows whose cumulative value crosses integer multiples of a
threshold — a "checkpointed accumulator" pattern the reference's
`uploaded` flag is a degenerate (boolean) case of.

State is per-key and explicitly timeout-managed; at 100 TB keys shard
across executors by hash — the operator is shuffle-once per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("total_value", DoubleType()),
        StructField("n_events", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("milestones_crossed", LongType()),
    ]
)


def make_budget_tracker(threshold: float = 100.0):
    """Returns the (key, pdfs, state) -> iterator function for
    applyInPandasWithState, tracking cumulative value per user."""

    def track(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            total, n = state.get
        else:
            total, n = 0.0, 0
        before = int(total // threshold)
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            n += len(pdf)
        state.update((total, n))
        after = int(total // threshold)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "milestones_crossed": [after - before],
            }
        )

    return track


def user_budget_stream(events: DataFrame, threshold: float = 100.0) -> DataFrame:
    """Wire the stateful tracker over a (streaming) events DataFrame."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_budget_tracker(threshold),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
