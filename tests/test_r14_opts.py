"""Focused tests for the r14 optimization round's internal changes:
scale-adaptive iteration partitioning, the graph audit's null-endpoint
check, and local_df's restored type strictness on the Arrow fast path."""

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.localrel import local_df
from distributed_vector_database_spark.operators.graph import (
    _iter_partitions,
    graph_write,
    label_propagation,
    pagerank,
)


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_iter_partitions_coalesces_small_graphs(spark, tmp_path):
    # the serving layout is a parquet scan — a real (small) size
    # estimate must coalesce the iteration exchanges below the default
    _sym(spark, [(1, 2), (2, 3), (3, 4)]).write.parquet(str(tmp_path / "e"))
    edges = spark.read.parquet(str(tmp_path / "e"))
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    derived = _iter_partitions(edges, None)
    assert derived == 1
    assert derived <= default
    # explicit always wins
    assert _iter_partitions(edges, 7) == 7
    # an unknown estimate (RDD-backed local relation: the 8-EB
    # sentinel) must keep the session default — never fewer partitions
    # for an input that might be huge
    unknown = _sym(spark, [(1, 2)])
    assert _iter_partitions(unknown, None) == default


def test_iterative_ops_same_result_any_partitioning(spark):
    edges = _sym(spark, [(1, 2), (2, 3), (4, 5)])
    pr_a = {
        r["node"]: r["rank_rel"]
        for r in pagerank(edges, iterations=3, partitions=1).collect()
    }
    pr_b = {
        r["node"]: r["rank_rel"]
        for r in pagerank(edges, iterations=3, partitions=8).collect()
    }
    assert pr_a == pr_b
    lp_a = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=3, partitions=1).collect()
    }
    lp_b = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=3, partitions=8).collect()
    }
    assert lp_a == lp_b == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_graph_audit_rejects_null_endpoint(spark, tmp_path):
    good = _sym(spark, [(1, 2)])
    nulled = good.union(
        spark.createDataFrame([(7, None), (None, 7)], "src long, dst long")
    )
    with pytest.raises(ValueError, match="null"):
        graph_write(nulled, str(tmp_path / "nullg"))


def test_local_df_arrow_path_keeps_type_strictness(spark):
    # the Arrow fast path must not silently truncate where the plain
    # createDataFrame path raises (ADVICE r13): 1.7 into a long column
    with pytest.raises(Exception):
        local_df(spark, [(1.7,)], "x long")
    # valid rows still go through (and NULLs survive)
    rows = local_df(spark, [(1, None), (2, 3.5)], "a long, b double").collect()
    assert [(r["a"], r["b"]) for r in rows] == [(1, None), (2, 3.5)]
