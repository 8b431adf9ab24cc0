"""Live Structured Streaming: the same window spec run as a readStream
(with watermark) must reproduce the batch oracle, and late events
beyond the watermark must be dropped (SURVEY §5.5)."""

import json

from distributed_vector_database_spark.streaming.windows import tumbling_counts


def _write_events(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


EVENTS_SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def test_stream_tumbling_matches_batch(spark, tmp_path):
    rows = [
        {"event_id": 1, "ts": "2024-01-01 00:10:00", "event_type": "click", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 00:20:00", "event_type": "click", "value": 2.0},
        {"event_id": 3, "ts": "2024-01-01 01:10:00", "event_type": "view", "value": 3.0},
        {"event_id": 4, "ts": "2024-01-01 02:05:00", "event_type": "click", "value": 4.0},
    ]
    src = tmp_path / "stream_in"
    src.mkdir()
    _write_events(src / "batch0.json", rows)

    stream = spark.readStream.schema(EVENTS_SCHEMA).json(str(src))
    agg = tumbling_counts(stream, streaming=True)
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_live")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling_live").collect()
    }
    from pyspark.sql import functions as F

    batch = spark.createDataFrame(
        [(r["event_id"], r["ts"], r["event_type"], r["value"]) for r in rows],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_counts(batch).collect()
    }
    assert got == want and len(got) == 3


def test_watermark_drops_late_events(spark, tmp_path):
    src = tmp_path / "late_in"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(EVENTS_SCHEMA).json(str(src))
        agg = tumbling_counts(stream, streaming=True, watermark="2 hours")
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1 advances event time to 05:50 → watermark (2h) = 03:50
    _write_events(
        src / "b0.json",
        [
            {"event_id": 1, "ts": "2024-01-01 05:50:00", "event_type": "click", "value": 1.0},
        ],
    )
    run_once()
    # batch 2: an event far behind the watermark (dropped) + one at
    # 09:00 that pushes the watermark to 07:00, finalizing the 05:00
    # window so append mode emits it
    _write_events(
        src / "b1.json",
        [
            {"event_id": 2, "ts": "2024-01-01 00:30:00", "event_type": "stale", "value": 9.0},
            {"event_id": 3, "ts": "2024-01-01 09:00:00", "event_type": "click", "value": 1.0},
        ],
    )
    run_once()

    rows = spark.read.parquet(out).collect()
    types = {r["event_type"] for r in rows}
    # the on-time 05:00 click window finalized and was emitted...
    assert "click" in types
    # ...the behind-watermark stale event's window never materialized
    assert "stale" not in types


def test_stream_dedup_drops_redelivered_keys(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a key re-delivered in a later
    micro-batch inside the watermark horizon is emitted exactly once;
    distinct keys all pass."""
    from distributed_vector_database_spark.streaming.dedup import dedup_stream

    src = tmp_path / "dedup_in"
    src.mkdir()
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")

    def run_once():
        stream = spark.readStream.schema(EVENTS_SCHEMA).json(str(src))
        deduped = dedup_stream(
            stream, key_cols=["event_id"], streaming=True, watermark="2 hours"
        )
        q = (
            deduped.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_events(
        src / "b0.json",
        [
            {"event_id": 1, "ts": "2024-01-01 00:10:00", "event_type": "click", "value": 1.0},
            {"event_id": 1, "ts": "2024-01-01 00:10:00", "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01 00:20:00", "event_type": "view", "value": 2.0},
        ],
    )
    run_once()
    # second delivery of key 1 in a later micro-batch, still in horizon
    _write_events(
        src / "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01 00:40:00", "event_type": "click", "value": 9.0},
            {"event_id": 3, "ts": "2024-01-01 01:00:00", "event_type": "click", "value": 3.0},
        ],
    )
    run_once()

    rows = spark.read.parquet(out).collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3], f"expected one row per key, got {ids}"


def test_dedup_stream_batch_oracle_first_occurrence(spark):
    from distributed_vector_database_spark.streaming.dedup import dedup_stream
    from pyspark.sql import functions as F

    batch = spark.createDataFrame(
        [
            (1, "2024-01-01 00:40:00", "late-dup", 9.0),
            (1, "2024-01-01 00:10:00", "first", 1.0),
            (2, "2024-01-01 00:20:00", "only", 2.0),
        ],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["event_id"]: r["event_type"]
        for r in dedup_stream(batch, key_cols=["event_id"]).collect()
    }
    assert got == {1: "first", 2: "only"}


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Two live streams joined within a 30-minute interval reproduce
    the batch oracle; a right event outside the interval never pairs."""
    from distributed_vector_database_spark.streaming.joins import (
        stream_interval_join,
    )
    from pyspark.sql import functions as F

    views = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "event_type": "view", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 01:00:00", "event_type": "view", "value": 2.0},
    ]
    clicks = [
        # pairs with view 1 (10 min later)
        {"event_id": 11, "ts": "2024-01-01 00:10:00", "event_type": "click", "value": 0.0},
        # pairs with nothing: 50 min after view 2
        {"event_id": 12, "ts": "2024-01-01 01:50:00", "event_type": "click", "value": 0.0},
    ]
    vdir, cdir = tmp_path / "views", tmp_path / "clicks"
    vdir.mkdir(), cdir.mkdir()
    # both streams share one user: reuse event_type as payload, add user
    for d, rows in ((vdir, views), (cdir, clicks)):
        _write_events(d / "b0.json", [dict(r, value=7.0) for r in rows])

    schema = EVENTS_SCHEMA

    def with_user(df):
        return df.withColumn("user_id", F.lit(7).cast("long"))

    lstream = with_user(spark.readStream.schema(schema).json(str(vdir)))
    rstream = with_user(spark.readStream.schema(schema).json(str(cdir)))
    joined = stream_interval_join(
        lstream.select("user_id", "ts", F.col("event_id").alias("view_id")),
        rstream.select("user_id", "ts", F.col("event_id").alias("click_id")),
        streaming=True,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin_live")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["view_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM ssjoin_live").collect()
    }

    def batch_df(rows, idcol):
        return with_user(
            spark.createDataFrame(
                [(r["event_id"], r["ts"]) for r in rows], "event_id long, ts string"
            ).withColumn("ts", F.col("ts").cast("timestamp"))
        ).select("user_id", "ts", F.col("event_id").alias(idcol))

    want = {
        (r["view_id"], r["click_id"])
        for r in stream_interval_join(
            batch_df(views, "view_id"), batch_df(clicks, "click_id")
        ).collect()
    }
    assert got == want == {(1, 11)}
