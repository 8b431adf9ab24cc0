"""As-of join semantics: latest prior-or-equal right row per key."""

from distributed_vector_database_spark.operators.asof import asof_join


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3")],
        "user_id long, ts long, ev string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 50, 500.0)],
        "user_id long, ts long, v double",
    )
    rows = {
        (r["user_id"], r["ts"]): r["right_v"]
        for r in asof_join(left, right).collect()
    }
    # inclusive at equality; no prior right row → null
    assert rows == {(1, 10): 100.0, (1, 20): 150.0, (2, 5): None}


def test_asof_left_rows_preserved(tables):
    from pyspark.sql import functions as F

    ev = tables["events"]
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    right = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_id")
    )
    out = asof_join(left, right)
    assert out.count() == left.count()
    # every matched signup precedes (or equals) its purchase
    joined = out.filter(F.col("right_signup_id").isNotNull())
    ev_ts = ev.select(F.col("event_id").alias("right_signup_id"), F.col("ts").alias("signup_ts"))
    bad = joined.join(ev_ts, "right_signup_id").filter(F.col("signup_ts") > F.col("ts"))
    assert bad.count() == 0


def test_asof_equal_ts_left_rows_share_match(spark):
    """Pins the tie-break contract (r2 VERDICT #7): the union-window sort
    key is exactly (ts, side) — right-before-left at equal ts — and no
    further tiebreak is needed because (by, on) is unique on the right.
    Multiple LEFT rows at the same ts must all see the same right row."""
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "b"), (1, 10, "c")],
        "user_id long, ts long, ev string",
    )
    right = spark.createDataFrame(
        [(1, 5, 50.0), (1, 10, 100.0)], "user_id long, ts long, v double"
    )
    rows = asof_join(left, right).collect()
    assert len(rows) == 3
    # inclusive semantics: the ts=10 right row, for every equal-ts left row
    assert {r["right_v"] for r in rows} == {100.0}
