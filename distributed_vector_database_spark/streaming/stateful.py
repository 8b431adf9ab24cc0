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
from pyspark.sql import functions as F
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


FUNNEL_OUTPUT_SCHEMA = "user_id long, steps_completed int"
FUNNEL_STATE_SCHEMA = "step int, last_ts timestamp"


def streaming_funnel(events: DataFrame, steps: list[str]) -> DataFrame:
    """The live dual of operators/relational.funnel: per-user funnel
    progress maintained ACROSS micro-batches with two fields of state
    (current step, timestamp of its match) — bounded per user no
    matter how long the stream runs. Each batch sorts only its own
    rows; the strictly-increasing rule matches the batch operator, so
    (with in-order delivery) the final emitted step per user equals
    the batch funnel over the full history.

    Caveat stated, not hidden: a funnel step arriving LATE (after a
    later step was already consumed in a previous batch) cannot
    rewind state — the batch operator is the replay/repair path,
    exactly like compaction repairs the streaming store."""
    step_list = list(steps)

    def walk(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd

        (user_id,) = key
        if state.exists:
            step, last_ts = state.get
        else:
            step, last_ts = 0, None
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_type"])
        for _, r in rows.iterrows():
            if step < len(step_list) and r["event_type"] == step_list[step]:
                if last_ts is None or r["ts"] > last_ts:
                    step += 1
                    last_ts = r["ts"]
        state.update((step, last_ts))
        yield pd.DataFrame(
            {"user_id": [user_id], "steps_completed": [step]}
        )

    return events.filter(
        F.col("event_type").isin(step_list)
    ).groupBy("user_id").applyInPandasWithState(
        walk,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
