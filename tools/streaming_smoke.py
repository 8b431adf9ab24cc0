"""Streaming scale smoke: drive the live Structured-Streaming paths
(stateful per-key aggregate, bounded-state dedup, stream-stream
interval join) over ~1M events delivered as real micro-batches, and
assert the property that matters at 100 TB/day: STATE STAYS BOUNDED —
the state store's row count must track (keys in horizon), not stream
length.

Feeds each query from a parquet file source (one file per micro-batch,
maxFilesPerTrigger=1) with event time advancing one hour per batch, so
watermarks actually move and evict. Reads per-batch state rows from
StreamingQueryProgress.stateOperators.

Usage: python tools/streaming_smoke.py [n_events]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from distributed_vector_database_spark.session import get_spark

N_BATCHES = 10
N_USERS = 10_000
BASE_TS = 1_704_067_200  # 2024-01-01 00:00:00 UTC


def write_event_batches(spark, path, n, dup_pairs=False):
    """n events split into N_BATCHES single-file parquet batches; event
    time advances one hour per batch (so a 90-minute watermark spans
    ~1.5 batches). dup_pairs=True delivers every event_id twice within
    its batch (the re-delivery-storm shape for dedup)."""
    per = n // N_BATCHES
    for b in range(N_BATCHES):
        ids = spark.range(b * per, (b + 1) * per)
        df = ids.select(
            (
                F.floor(F.col("id") / 2).cast("long") if dup_pairs else F.col("id")
            ).alias("event_id"),
            F.pmod(F.col("id") * 2654435761, N_USERS).alias("user_id"),
            F.timestamp_seconds(
                F.lit(BASE_TS + b * 3600) + F.pmod(F.col("id"), 3600)
            ).alias("ts"),
            (F.col("id") % 100).cast("double").alias("value"),
        )
        df.coalesce(1).write.mode("append").parquet(path)


def state_rows(progresses):
    out = []
    for p in progresses:
        d = json.loads(p.json) if hasattr(p, "json") else p
        ops = d.get("stateOperators") or []
        if ops:
            out.append(sum(o.get("numRowsTotal", 0) for o in ops))
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="dvds-streaming-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="stream_smoke_")
    schema = "event_id long, user_id long, ts timestamp, value double"
    results = {}

    # -- 1. stateful per-key aggregate (applyInPandasWithState) ------------
    from distributed_vector_database_spark.streaming.stateful import (
        running_user_stats,
    )

    src = f"{tmp}/stateful_src"
    write_event_batches(spark, src, n)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    t0 = time.time()
    q = (
        running_user_stats(stream)
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", f"{tmp}/stateful_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(900)
    sr = state_rows(q.recentProgress)
    results["stateful_1m"] = dict(
        wall_s=round(time.time() - t0, 2), state_rows_per_batch=sr
    )
    # state = one row per distinct user: saturates at N_USERS and stays
    # FLAT — it must not track stream length
    assert sr and sr[-1] == N_USERS and max(sr) == N_USERS, sr

    # -- 2. bounded-state streaming dedup ----------------------------------
    from distributed_vector_database_spark.streaming.dedup import dedup_stream

    src = f"{tmp}/dedup_src"
    write_event_batches(spark, src, n, dup_pairs=True)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    t0 = time.time()
    q = (
        dedup_stream(stream, key_cols=["event_id"], streaming=True, watermark="90 minutes")
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/dedup_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(900)
    sr = state_rows(q.recentProgress)
    results["dedup_1m"] = dict(
        wall_s=round(time.time() - t0, 2), state_rows_per_batch=sr
    )
    # distinct keys total n/2; dropDuplicatesWithinWatermark holds a key
    # until the watermark passes ITS event time + the 90-min delay, so
    # steady state ≈ (delay + watermark lag ≈ 3h ≈ 3 batches + in-batch
    # spread) of keys — must plateau there and stay far under the full
    # key count (eviction is working, state does not track stream length)
    per_batch_keys = n // N_BATCHES // 2
    assert sr and max(sr) <= 5 * per_batch_keys, sr
    assert sr[-1] <= max(sr[:5]), f"state still growing at end: {sr}"

    # -- 3. stream-stream interval join ------------------------------------
    from distributed_vector_database_spark.streaming.joins import (
        stream_interval_join,
    )

    vsrc, csrc = f"{tmp}/views_src", f"{tmp}/clicks_src"
    write_event_batches(spark, vsrc, n // 2)
    write_event_batches(spark, csrc, n // 2)
    vstream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(vsrc)
        .select("user_id", "ts", F.col("event_id").alias("view_id"))
    )
    cstream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(csrc)
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    )
    t0 = time.time()
    q = (
        stream_interval_join(
            vstream, cstream, interval="10 minutes", watermark="1 hour", streaming=True
        )
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/join_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(900)
    sr = state_rows(q.recentProgress)
    results["interval_join_1m"] = dict(
        wall_s=round(time.time() - t0, 2), state_rows_per_batch=sr
    )
    # both sides buffer ~watermark+interval of rows: steady state must be
    # a small multiple of one batch per side, far under total stream size
    per_batch = n // N_BATCHES // 2
    assert sr and max(sr[4:]) <= 6 * per_batch, sr

    for k, v in results.items():
        print(f"{k}: {v['wall_s']}s state_rows={v['state_rows_per_batch']}")
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
