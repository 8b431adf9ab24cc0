"""Maintained transition matrix: folded snapshots equal the one-shot
event_transitions; boundary transitions cross batch edges; replay-safe."""

import datetime
import os

from distributed_vector_database_spark.operators.mining import event_transitions
from distributed_vector_database_spark.streaming.transitions import (
    build_transitions_fold,
    read_transition_matrix,
)

EV = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _events(spark, n=240):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + datetime.timedelta(minutes=3 * i),
            i % 7,
            ("a", "b", "c", "a", "b")[i % 5],
            float(i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, EV)


def _snap(df):
    return sorted(
        (r["prev_type"], r["next_type"], r["transitions"], r["prob"])
        for r in df.collect()
    )


def test_fold_equals_oneshot_with_boundaries(spark, tmp_path):
    ev = _events(spark)
    d = str(tmp_path / "t")
    os.makedirs(d)
    fold = build_transitions_fold(d)
    # TIME-split batches (the fold's ordering contract): every user
    # has events in every batch, so each edge creates per-user
    # boundary transitions that only the ledger can recover
    fold(ev.filter("event_id < 80"), 0)
    fold(ev.filter("event_id >= 80 and event_id < 160"), 1)
    fold(ev.filter("event_id >= 160"), 2)
    got = _snap(read_transition_matrix(spark, d))
    assert got == _snap(event_transitions(ev))
    # total steps = n - users (first event of each user has no prev);
    # dropping boundaries would lose 2 edges x 7 users = 14 steps
    assert sum(r[2] for r in got) == 240 - 7


def test_fold_replay_safe(spark, tmp_path):
    ev = _events(spark, 100)
    d = str(tmp_path / "t")
    os.makedirs(d)
    fold = build_transitions_fold(d)
    fold(ev.filter("event_id < 50"), 0)
    fold(ev.filter("event_id >= 50"), 1)
    got = _snap(read_transition_matrix(spark, d))
    fold(ev.filter("event_id >= 50"), 1)  # at-least-once redelivery
    assert _snap(read_transition_matrix(spark, d)) == got


def test_user_absent_from_middle_batch_bridges_gap(spark, tmp_path):
    # user 1's events only in batches 0 and 2 — the ledger must carry
    # their tail across the empty middle batch
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0), 1, "a", 0.0),
        (2, datetime.datetime(2024, 1, 1, 0, 1), 2, "b", 0.0),
        (3, datetime.datetime(2024, 1, 1, 0, 2), 2, "c", 0.0),
        (4, datetime.datetime(2024, 1, 1, 0, 3), 1, "c", 0.0),
    ]
    spark_df = spark.createDataFrame(rows, EV)
    d = str(tmp_path / "t")
    os.makedirs(d)
    fold = build_transitions_fold(d)
    fold(spark_df.filter("event_id = 1"), 0)
    fold(spark_df.filter("event_id in (2, 3)"), 1)
    fold(spark_df.filter("event_id = 4"), 2)
    got = _snap(read_transition_matrix(spark, d))
    assert got == _snap(event_transitions(spark_df))
    assert ("a", "c", 1, 1.0) in got  # user 1's bridged transition


def test_crash_between_ledger_and_counts_write_recovers(spark, tmp_path):
    # simulate a fold that died AFTER writing ledger v=2 but BEFORE
    # counts v=2 + marker: the orphan ledger version must be
    # overwritten by the retried batch, not consumed
    ev = _events(spark, 60)
    d = str(tmp_path / "t")
    os.makedirs(d)
    fold = build_transitions_fold(d)
    fold(ev.filter("event_id < 30"), 0)
    # orphan ledger v=2 with garbage (the crash artifact)
    spark.createDataFrame(
        [(99, None, 99, "zz")],
        "user_id long, ts timestamp, event_id long, event_type string",
    ).write.mode("overwrite").parquet(f"{d}/ledger/v=2")
    fold(ev.filter("event_id >= 30"), 1)  # retry of the crashed batch
    got = _snap(read_transition_matrix(spark, d))
    assert got == _snap(event_transitions(ev))


def test_live_transitions_stream(spark, tmp_path):
    import json

    from distributed_vector_database_spark.streaming.transitions import (
        run_transitions_stream,
    )

    ev = _events(spark, 90)
    rows = sorted(ev.collect(), key=lambda r: (r["ts"], r["event_id"]))
    ev_dir = str(tmp_path / "ev")
    os.makedirs(ev_dir)
    # time-ordered files: the fold's per-user ordering contract
    for name, chunk in (("a.json", rows[:45]), ("b.json", rows[45:])):
        with open(os.path.join(ev_dir, name), "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {
                            "event_id": r["event_id"],
                            "ts": r["ts"].isoformat(sep=" "),
                            "user_id": r["user_id"],
                            "event_type": r["event_type"],
                            "value": r["value"],
                        }
                    )
                    + "\n"
                )
    q = run_transitions_stream(
        spark,
        ev_dir,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    got = _snap(read_transition_matrix(spark, str(tmp_path / "state")))
    assert got == _snap(event_transitions(ev))
