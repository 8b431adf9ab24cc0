"""Skew-safe aggregation correctness + bucketed co-located joins
(shuffle elimination — the 100 TB join strategy)."""

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.skew import (
    explode_salt,
    salted_aggregate,
    with_salt,
)
from distributed_vector_database_spark.plans.explain import formatted_plan


def test_salted_aggregate_matches_plain(spark):
    # heavily skewed: 90% of rows share one key
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.col("id").cast("string")).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    got = {
        r["k"]: (r["total"], r["n"], r["mx"])
        for r in salted_aggregate(
            df, ["k"], {"total": "sum(v)", "n": "count(1)", "mx": "max(v)"}
        ).collect()
    }
    want = {
        r["k"]: (r["total"], r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_salted_aggregate_rejects_nonalgebraic(spark):
    df = spark.range(10).select(F.lit("k").alias("k"), F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        salted_aggregate(df, ["k"], {"a": "avg(v)"})


def test_salted_join_matches_plain(spark):
    big = spark.range(5_000).select(
        F.when(F.col("id") % 5 < 4, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 2).alias("dim"))
    n_salts = 8
    bs = with_salt(big, n_salts)
    ss = explode_salt(small, n_salts)
    salted = bs.join(ss, ["k", "__salt"]).select("k", "payload", "dim")
    plain = big.join(small, "k").select("k", "payload", "dim")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    orders = spark.range(1_000).select(
        F.col("id").alias("o_key"), (F.col("id") % 100).alias("cust")
    )
    items = spark.range(5_000).select(
        (F.col("id") % 1_000).alias("o_key"), F.col("id").alias("item")
    )
    for name, df in [("b_orders", orders), ("b_items", items)]:
        (
            df.write.mode("overwrite")
            .bucketBy(8, "o_key")
            .sortBy("o_key")
            .option("path", str(tmp_path / name))  # external: keep out of cwd
            .saveAsTable(name)
        )
    # disable broadcast so the join strategy itself is under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(spark.table("b_items"), "o_key")
        plan = formatted_plan(j)
        # co-located bucketed join: no Exchange feeds the SortMergeJoin
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_skew_report_flags_hot_keys(spark):
    from distributed_vector_database_spark.operators.skew import skew_report

    rows = [(i, "hot" if i % 2 == 0 else f"k{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, key string")
    top = skew_report(df, "key", top_n=3).collect()
    assert top[0]["key"] == "hot" and top[0]["n"] == 50
    assert top[0]["share"] == 0.5
    # 51 distinct keys, hot holds half the mass -> ratio 25.5
    assert top[0]["skew_ratio"] == 25.5
    assert all(r["n"] == 1 for r in top[1:])


def test_salted_join_operator_parity_and_left(spark):
    """salted_join == plain join on a skewed corpus (inner and left,
    including unmatched-left rows and a duplicated small-side key)."""
    from distributed_vector_database_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 0), (3, 9)],
        "k long, payload long",
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (2, "cold2")], "k long, dim string"
    )
    inner = salted_join(big, small, "k", n_salts=8)
    plain = big.join(small, "k").select("k", "payload", "dim")
    assert sorted(map(tuple, inner.collect())) == sorted(
        map(tuple, plain.collect())
    )
    left = salted_join(big, small, "k", n_salts=8, how="left")
    plain_l = big.join(small, "k", "left").select("k", "payload", "dim")
    assert sorted(map(tuple, left.collect()), key=str) == sorted(
        map(tuple, plain_l.collect()), key=str
    )

    import pytest as _pt

    with _pt.raises(ValueError):
        salted_join(big, small, "k", how="full")


def test_heavy_hitters_exact_vs_plain_groupby(spark):
    """Two-pass heavy hitters must equal the plain GROUP BY/HAVING
    answer exactly — the candidate pass is a guaranteed superset, so
    no distribution (uniform, power-law, keys split across many
    partitions) may change the result."""
    from distributed_vector_database_spark.operators.skew import heavy_hitters

    rows = (
        [(i, "hot") for i in range(300)]
        + [(i, "warm") for i in range(40)]
        + [(i, f"cold{i}") for i in range(200)]
        + [(i, "split") for i in range(25)]
    )
    df = spark.createDataFrame(rows, "i long, k string").repartition(16)

    for s in (1, 2, 25, 41, 300, 301):
        got = [(r["k"], r["n"]) for r in heavy_hitters(df, "k", s).collect()]
        want = sorted(
            (
                (r["k"], r["n"])
                for r in df.groupBy("k")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") >= s)
                .collect()
            ),
            key=lambda t: (-t[1], t[0]),
        )
        assert got == want, (s, got, want)

    import pytest as _pt

    with _pt.raises(ValueError):
        heavy_hitters(df, "k", 0)


def test_heavy_hitters_superset_bar_survives_partition_spread(spark):
    """A key exactly at min_count spread 1-per-partition must still be
    found: the local bar is ceil(s/P), and with s <= P the bar is 1 —
    complete by construction."""
    from distributed_vector_database_spark.operators.skew import heavy_hitters

    df = spark.createDataFrame(
        [(i, "edge") for i in range(16)], "i long, k string"
    ).repartition(16, "i")
    got = heavy_hitters(df, "k", 16).collect()
    assert [(r["k"], r["n"]) for r in got] == [("edge", 16)]
