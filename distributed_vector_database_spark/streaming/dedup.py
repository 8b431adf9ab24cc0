"""Streaming deduplication — exactly-once-per-key delivery over an
unbounded event stream, with bounded state.

The reference dedups only at the search merge (first-seen key wins,
src/coordinator/handler.py:183,201-206) because its WAL replay is
batch. In a live pipeline the same guarantee needs streaming state:
Spark's `dropDuplicatesWithinWatermark` keeps one state row per key
and EVICTS it once the watermark passes the key's event time, so state
is bounded by (keys per watermark horizon), not by stream length —
the only formulation that survives an unbounded 100 TB/day stream.

Dual-mode like streaming/windows.py: applied to a batch DataFrame the
same spec is the deterministic oracle (first occurrence per key by
event time); applied to a readStream it is the live pipeline, compared
against the oracle in tests/test_streaming_live.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    streaming: bool = False,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per key: streaming mode keeps the first arrival within
    the watermark horizon (state evicted after `watermark`); batch mode
    is the event-time-ordered oracle (first occurrence per key,
    deterministic via (ts, struct-of-key) ordering).

    Duplicates separated by more than the watermark horizon are NOT
    collapsed in streaming mode — that is the documented contract of
    bounded-state dedup (re-delivery storms are near-duplicates in
    time; a full-history dedup is the batch compaction path,
    operators/changelog.py)."""
    if key_cols is None:
        key_cols = ["event_id"]
    if streaming:
        # first ARRIVAL wins — among same-ts duplicates the kept row is
        # arrival-order-dependent by design; tiebreak_col applies only
        # to the batch oracle, which has no arrival order
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
