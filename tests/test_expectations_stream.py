"""Maintained data-quality report: folded snapshots equal the one-shot
audit; cross-batch duplicates caught; replay-safe."""

import os

from pyspark.sql import functions as F

from distributed_vector_database_spark.streaming.expectations import (
    build_dq_fold,
    read_dq_report,
)

RULES_SQL = "k long, v double"


def _snap(df):
    return sorted((r.rule, r.violations, r.passed) for r in df.collect())


def _rules():
    return {"v_positive": F.col("v") > 0}


def test_fold_equals_oneshot_and_cross_batch_duplicates(spark, tmp_path):
    from distributed_vector_database_spark.operators.evaluation import (
        data_quality_report,
        expect_columns,
        expect_foreign_key,
        expect_unique,
    )

    parent = spark.createDataFrame([(i,) for i in range(8)], "k long")
    # key 5 appears in batches 0 AND 1 — only stateful uniqueness sees it;
    # key 9 is an orphan; one negative value violates the column rule
    b0 = spark.createDataFrame([(1, 1.0), (5, 2.0), (9, 3.0)], RULES_SQL)
    b1 = spark.createDataFrame([(5, -1.0), (6, 4.0)], RULES_SQL)
    d = str(tmp_path / "dq")
    os.makedirs(d)
    fold = build_dq_fold(
        d,
        _rules(),
        unique_cols=["k"],
        fk=("k", parent, "k", "fk_parent"),
    )
    fold(b0, 0)
    fold(b1, 1)
    got = _snap(read_dq_report(spark, d, unique_cols=["k"], unique_rule="k_unique"))
    union = b0.unionByName(b1)
    expect = _snap(
        data_quality_report(
            [
                expect_columns(union, _rules()),
                expect_foreign_key(union, "k", parent, "k", "fk_parent"),
                expect_unique(union, ["k"], "k_unique"),
            ]
        )
    )
    assert got == expect
    assert ("k_unique", 1, False) in got  # the straddling duplicate


def test_fold_replay_safe(spark, tmp_path):
    parent = spark.createDataFrame([(1,), (2,)], "k long")
    b0 = spark.createDataFrame([(1, 1.0)], RULES_SQL)
    b1 = spark.createDataFrame([(2, -2.0)], RULES_SQL)
    d = str(tmp_path / "dq")
    os.makedirs(d)
    fold = build_dq_fold(d, _rules(), unique_cols=["k"], fk=("k", parent, "k", "fk"))
    fold(b0, 0)
    fold(b1, 1)
    got = _snap(read_dq_report(spark, d, unique_cols=["k"]))
    fold(b1, 1)  # at-least-once redelivery must be a no-op
    assert _snap(read_dq_report(spark, d, unique_cols=["k"])) == got
    assert ("v_positive", 1, False) in got


def test_crash_between_keys_and_counts_write_recovers(spark, tmp_path):
    # a fold that died after writing keys v=2 but before counts v=2 +
    # marker leaves an orphan keys version; the retried batch must
    # overwrite it and the served report must equal the one-shot
    parent = spark.createDataFrame([(i,) for i in range(10)], "k long")
    b0 = spark.createDataFrame([(1, 1.0), (2, 2.0)], RULES_SQL)
    b1 = spark.createDataFrame([(2, -3.0), (3, 4.0)], RULES_SQL)
    d = str(tmp_path / "dq")
    os.makedirs(d)
    fold = build_dq_fold(d, _rules(), unique_cols=["k"], fk=("k", parent, "k", "fk"))
    fold(b0, 0)
    spark.createDataFrame([(777, 999)], "k long, kn long").write.mode(
        "overwrite"
    ).parquet(f"{d}/keys/v=2")  # crash artifact
    fold(b1, 1)  # retry
    got = {r.rule: r.violations for r in
           read_dq_report(spark, d, unique_cols=["k"], unique_rule="u").collect()}
    assert got == {"v_positive": 1, "fk": 0, "u": 1}
