"""applyInPandasWithState: per-key state accumulates across
micro-batches AND across query restarts (checkpoint recovery)."""

import json

from pyspark.sql import functions as F

from distributed_vector_database_spark.streaming.stateful import running_user_stats

SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _write(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_state_accumulates_across_restarts(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(out)

    def run_once():
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = (
            running_user_stats(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write(
        src / "b0.json",
        [
            {"event_id": 1, "ts": "2024-01-01 00:00:01", "user_id": 1, "value": 10.0},
            {"event_id": 2, "ts": "2024-01-01 00:00:02", "user_id": 1, "value": 5.0},
            {"event_id": 3, "ts": "2024-01-01 00:00:03", "user_id": 2, "value": 1.0},
        ],
    )
    run_once()
    # restart with new data: user 1's state must carry the previous 15.0
    _write(
        src / "b1.json",
        [
            {"event_id": 4, "ts": "2024-01-01 00:10:00", "user_id": 1, "value": 2.5},
            {"event_id": 5, "ts": "2024-01-01 00:10:01", "user_id": 3, "value": 7.0},
        ],
    )
    run_once()

    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:  # keep the row with the max n_events per user
        cur = latest.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            latest[r["user_id"]] = r
    assert latest[1]["n_events"] == 3 and latest[1]["total_value"] == 17.5
    assert latest[2]["n_events"] == 1 and latest[2]["total_value"] == 1.0
    assert latest[3]["n_events"] == 1 and latest[3]["total_value"] == 7.0
    assert str(latest[1]["last_ts"]).startswith("2024-01-01 00:10:00")


def test_streaming_funnel_matches_batch_operator(spark, tmp_path):
    """Two micro-batches of in-order events: the final per-user step
    equals the batch funnel over the union; state carries progress
    across batches (user 1 completes the funnel only in batch 2)."""
    from distributed_vector_database_spark.operators.relational import funnel
    from distributed_vector_database_spark.streaming.stateful import (
        streaming_funnel,
    )

    EV = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = tmp_path / "in"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    b1 = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "event_type": "view", "value": 0.0},
        {"event_id": 2, "ts": "2024-01-01 00:05:00", "user_id": 1, "event_type": "click", "value": 0.0},
        {"event_id": 3, "ts": "2024-01-01 00:00:00", "user_id": 2, "event_type": "purchase", "value": 0.0},
    ]
    b2 = [
        {"event_id": 4, "ts": "2024-01-01 00:09:00", "user_id": 1, "event_type": "purchase", "value": 0.0},
        {"event_id": 5, "ts": "2024-01-01 00:10:00", "user_id": 2, "event_type": "view", "value": 0.0},
    ]
    _write(src / "a.json", b1)
    _write(src / "b.json", b2)

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(out)

    stream = spark.readStream.schema(EV).option("maxFilesPerTrigger", "1").json(str(src))
    q = (
        streaming_funnel(stream, ["view", "click", "purchase"])
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    import pandas as pd

    res = spark.read.parquet(out).toPandas()
    final = res.groupby("user_id")["steps_completed"].max().to_dict()
    all_events = spark.createDataFrame(
        [(r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"])
         for r in b1 + b2],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = {
        r["user_id"]: r["steps_completed"]
        for r in funnel(all_events, ["view", "click", "purchase"]).collect()
    }
    assert final == want == {1: 3, 2: 1}
