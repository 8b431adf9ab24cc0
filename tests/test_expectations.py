"""Data-quality expectations and the volume anomaly monitor."""

import datetime

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.evaluation import (
    data_quality_report,
    expect_columns,
    expect_foreign_key,
    expect_unique,
    volume_anomalies,
)


def test_expect_columns_one_pass_counts_nulls_as_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "id long, v double"
    )
    got = {
        r.rule: (r.violations, r.passed)
        for r in expect_columns(
            df,
            {
                "v_positive": F.col("v") > 0,       # -5 and NULL violate
                "id_not_null": F.col("id").isNotNull(),
            },
        ).collect()
    }
    assert got == {"v_positive": (2, False), "id_not_null": (0, True)}


def test_expect_unique_counts_rows_beyond_first(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k long")
    row = expect_unique(df, ["k"], "k_unique").collect()[0]
    assert (row.violations, row.passed) == (2, False)
    ok = expect_unique(df.distinct(), ["k"], "k_unique").collect()[0]
    assert (ok.violations, ok.passed) == (0, True)


def test_expect_foreign_key_orphans_and_null_keys(spark):
    child = spark.createDataFrame([(1,), (2,), (None,)], "fk long")
    parent = spark.createDataFrame([(1,)], "pk long")
    row = expect_foreign_key(child, "fk", parent, "pk", "fk_ok").collect()[0]
    # 2 is an orphan; NULL child key cannot match -> also a violation
    assert (row.violations, row.passed) == (2, False)


def test_data_quality_report_unions_all_kinds(spark, tables):
    orders = tables["orders"]
    customer = tables["customer"]
    rep = data_quality_report(
        [
            expect_columns(
                orders, {"total_pos": F.col("o_totalprice") > 0}
            ),
            expect_unique(orders, ["o_orderkey"], "orderkey_unique"),
            expect_foreign_key(
                orders, "o_custkey", customer, "c_custkey", "custkey_fk"
            ),
        ]
    ).collect()
    got = {r.rule: r.passed for r in rep}
    assert got == {
        "total_pos": True,
        "orderkey_unique": True,
        "custkey_fk": True,
    }


def test_volume_anomalies_flags_planted_spike(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(30):
        n = 500 if h == 28 else 10  # hour 28 spikes 50x
        for i in range(n):
            rows.append(
                (eid, base + datetime.timedelta(hours=h, seconds=i), 1, "t", 0.0)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {r.bucket.hour + 24 * (r.bucket.day - 1): r for r in
           volume_anomalies(df).collect()}
    # zero-variance baseline + deviation: NULL z (infinite) but FLAGGED
    assert out[28].anomaly and out[28].n == 500 and out[28].z is None
    # steady hours on the flat baseline: n == mean, never flagged
    assert not out[20].anomaly and out[20].z is None
    # first hour has no trailing window at all
    assert out[0].z is None and not out[0].anomaly


def test_volume_anomalies_excludes_current_hour_from_baseline(spark):
    # two hours: 10 then 100 events; the spike's baseline must be the
    # first hour alone (mean 10), not contaminated by itself
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(seconds=i), 1, "t", 0.0) for i in range(10)]
    rows += [
        (100 + i, base + datetime.timedelta(hours=1, seconds=i), 1, "t", 0.0)
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {r.bucket.hour: r for r in volume_anomalies(df).collect()}
    assert got[1].trailing_mean == 10.0
    assert got[1].z is None  # single-point baseline has no sample stddev


def test_grouped_trend_matches_numpy_polyfit(spark):
    import numpy as np

    from distributed_vector_database_spark.operators.evaluation import (
        grouped_trend,
    )

    xs = [0.0, 1.0, 2.0, 3.0, 4.0]
    ys_a = [1.0, 3.1, 4.9, 7.2, 8.8]      # ~ 2x + 1
    ys_b = [5.0, 5.0, 5.0, 5.0, 5.0]      # flat: slope 0, r2 NULL (corr NULL)
    rows = [("a", x, y) for x, y in zip(xs, ys_a)]
    rows += [("b", x, y) for x, y in zip(xs, ys_b)]
    rows += [("c", 1.0, 9.0)]              # single point: NULL slope
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in grouped_trend(df, "g", F.col("x"), "y").collect()}
    slope, intercept = np.polyfit(xs, ys_a, 1)
    assert got["a"].slope == round(float(slope), 6)
    assert got["a"].intercept == round(float(intercept), 6)
    r = np.corrcoef(xs, ys_a)[0, 1]
    assert got["a"].r2 == round(float(r * r), 6)
    assert got["b"].slope == 0.0 and got["b"].r2 is None
    assert got["c"].slope is None and got["c"].n == 1
