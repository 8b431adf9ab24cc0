"""Z-order / clustered layout: row-group pruning must actually work,
measured from the written parquet footers."""

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.layout import (
    cluster_write,
    rowgroup_prune_fraction,
    zorder_write,
)


@pytest.fixture(scope="module")
def grid(spark):
    # 100k rows over an uncorrelated 2-d grid: the adversarial case
    # for linear clustering (sorting by x leaves y unsorted)
    return spark.range(100_000).select(
        (F.col("id") % 317).cast("double").alias("x"),
        (F.pmod(F.col("id") * 7919, 311)).cast("double").alias("y"),
        F.col("id").alias("payload"),
    )


def test_zorder_prunes_on_both_columns(grid, tmp_path):
    p = str(tmp_path / "z")
    zorder_write(grid, p, "x", "y", partitions=64)
    fx = rowgroup_prune_fraction(p, "x", 10.0, 20.0)
    fy = rowgroup_prune_fraction(p, "y", 10.0, 20.0)
    # a ~3% range on either axis must skip most groups: a thin slice
    # through a 2-d z-curve intersects ~sqrt(P) of the P tiles
    assert fx > 0.7, fx
    assert fy > 0.7, fy


def test_linear_clustering_prunes_leading_column_only(grid, tmp_path):
    p = str(tmp_path / "c")
    cluster_write(grid, p, ["x", "y"], partitions=64)
    assert rowgroup_prune_fraction(p, "x", 10.0, 20.0) > 0.9
    # trailing column can't prune an uncorrelated grid
    assert rowgroup_prune_fraction(p, "y", 10.0, 20.0) < 0.2


def test_zorder_write_roundtrips_rows(grid, tmp_path, spark):
    p = str(tmp_path / "rt")
    zorder_write(grid, p, "x", "y", partitions=4)
    back = spark.read.parquet(p)
    assert back.count() == 100_000
    assert set(back.columns) == {"x", "y", "payload"}
    assert back.agg(F.sum("payload")).first()[0] == grid.agg(F.sum("payload")).first()[0]


def test_bucketed_join_no_exchange(spark):
    """Two tables bucketed on the join key with equal bucket counts
    must sort-merge join with ZERO Exchange on either side — the
    write-time shuffle prepayment that makes repeated fact joins
    affordable at scale. Also pins result parity vs the plain join."""
    from distributed_vector_database_spark.operators.layout import (
        bucketed_join,
        bucketed_write,
    )

    orders = spark.range(2000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 7).cast("double").alias("o_total"),
    )
    lines = spark.range(6000).select(
        (F.col("id") % 2000).alias("l_orderkey"),
        (F.col("id") % 13).cast("double").alias("l_qty"),
    )
    bucketed_write(orders, "t_bkt_orders", "o_orderkey", n_buckets=8)
    bucketed_write(lines, "t_bkt_lines", "l_orderkey", n_buckets=8)
    # fixture tables are broadcast-sized, which would hide the bucket
    # layout behind a BroadcastHashJoin; at fact×fact scale (the case
    # bucketing exists for) broadcast is off the table, so pin that
    # regime explicitly
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(
            spark, "t_bkt_orders", "t_bkt_lines", "o_orderkey", "l_orderkey"
        )
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # parity vs the un-bucketed join
        expect = orders.join(
            lines, F.col("o_orderkey") == F.col("l_orderkey")
        ).count()
        assert j.count() == expect == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
        spark.sql("DROP TABLE IF EXISTS t_bkt_lines")


def test_bucketed_group_by_no_exchange(spark):
    """A groupBy on the bucket key over a bucketed table aggregates
    with no Exchange — bucketing prepays aggregation shuffles too."""
    from distributed_vector_database_spark.operators.layout import (
        bucketed_write,
    )

    df = spark.range(5000).select(
        (F.col("id") % 500).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    bucketed_write(df, "t_bkt_agg", "k", n_buckets=8)
    try:
        g = spark.table("t_bkt_agg").groupBy("k").agg(F.sum("v").alias("s"))
        plan = g._sc._jvm.PythonSQLUtils.explainString(
            g._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        assert g.count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_agg")


def test_with_zorder_key_matches_local_interleave(grid, spark):
    """with_zorder_key == a local numpy replication of the fixed-point
    scale + bit interleave, row for row — the oracle surface the
    zorder_curve contract query rests on."""
    from distributed_vector_database_spark.operators.layout import (
        with_zorder_key,
    )

    rows = grid.select("x", "y").collect()
    xs = [r["x"] for r in rows]
    ys = [r["y"] for r in rows]
    alo, ahi = float(min(xs)), float(max(xs))
    blo, bhi = float(min(ys)), float(max(ys))

    def scale(v, lo, hi):
        span = hi - lo if hi > lo else 1.0
        return min(int((float(v) - lo) / span * 65535), 65535)

    def interleave(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    want = {
        (r["x"], r["y"]): interleave(
            scale(r["x"], alo, ahi), scale(r["y"], blo, bhi)
        )
        for r in rows
    }
    got = with_zorder_key(grid, "x", "y", "zval").collect()
    assert len(got) == len(rows)
    for r in got:
        assert r["zval"] == want[(r["x"], r["y"])], (r["x"], r["y"])
