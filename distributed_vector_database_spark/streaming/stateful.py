"""Custom stateful streaming operator via applyInPandasWithState —
arbitrary per-key state beyond what windowed aggregation expresses
(the Structured Streaming analog of the reference's per-key mutable
node state, src/datanode/handler.py:26-54, kept in Spark-managed
per-group state instead of LevelDB).

`running_user_stats` maintains (count, total, last_ts) per user across
micro-batches; state survives restarts through the checkpoint — the
same recovery contract as the store's snapshot+log (SURVEY §3.4), but
managed by the streaming engine.

Scale: state is partitioned by the grouping key across executors;
each micro-batch touches only the groups present in the batch. At
100 TB/day event volume this is the standard shape for running
aggregates, dedup-within-stream, or per-entity ML feature state.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n_events long, total_value double"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last event time) over a stream.
    Emits one updated row per user per micro-batch (update mode).

    The update function is NESTED so cloudpickle ships it by value —
    executors never import this package (required when the session was
    built without the repo on executor PYTHONPATH)."""

    def update_user_stats(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd

        (user_id,) = key
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        state.update((n, round(total, 6)))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "last_ts": [last_ts],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
