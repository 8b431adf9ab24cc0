"""Stream-stream interval join — correlating two live event streams
within a time bound, with bounded state on both sides.

The last Structured-Streaming operator family next to windows
(streaming/windows.py), arbitrary state (stateful.py) and bounded-state
dedup (dedup.py): joining two unbounded streams requires BOTH sides to
buffer state and an event-time constraint so Spark can evict rows once
the watermark passes the join window — without the interval condition a
stream-stream join would hold unbounded state.

Dual-mode like the rest of the package: applied to batch DataFrames the
same spec is the deterministic oracle; applied to readStream inputs it
is the live pipeline (compared in tests/test_streaming_live.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    interval: str = "30 minutes",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Pairs of (left, right) events for the same `by` key where the
    right event falls within [left_ts, left_ts + interval] — e.g.
    "views followed by a click within 30 minutes".

    Streaming mode watermarks BOTH sides (state eviction needs late
    bounds on each buffer) and expresses the bound as an event-time
    range condition, the shape Spark requires to prune join state.
    Batch mode is the same join condition without watermarks — the
    oracle.

    Right-side payload columns whose names collide with a left-side
    payload column come back prefixed `r_` (homogeneous event streams
    share most column names; duplicate output names would make every
    name-based downstream select ambiguous)."""
    left_payload = [c for c in left.columns if c not in (by, left_ts)]
    right_payload = [c for c in right.columns if c not in (by, right_ts)]
    taken = set(left_payload) | {by, "l_ts", "r_ts"}
    l_ = left.select(
        F.col(by).alias("__k"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c) for c in left_payload],
    )
    r_ = right.select(
        F.col(by).alias("__rk"),
        F.col(right_ts).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}") if c in taken else F.col(c)
            for c in right_payload
        ],
    )
    if streaming:
        l_ = l_.withWatermark("l_ts", watermark)
        r_ = r_.withWatermark("r_ts", watermark)
    cond = (
        (F.col("__k") == F.col("__rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {interval}"))
    )
    return (
        l_.join(r_, cond)
        .drop("__rk")
        .withColumnRenamed("__k", by)
    )
