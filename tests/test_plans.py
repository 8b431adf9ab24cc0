"""Plan-shape assertions: the physical strategies that must survive a
100x scale-up (SURVEY §4). A correctness-green query with the wrong
plan (full sort instead of top-k, shuffle join of a broadcastable dim,
unpushed predicate) FAILS here."""

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators import relational as R
from distributed_vector_database_spark.operators.knn import knn_exact
from distributed_vector_database_spark.plans.explain import (
    has_operator,
    pushed_filters,
    read_schemas,
)


def _qvec(tables):
    return list(tables["embeddings"].filter("vec_id = 0").first()["embedding"])


def test_knn_is_topk_not_full_sort(tables):
    # orderBy(score).limit(k) must compile to TakeOrderedAndProject:
    # per-partition top-k + k-row merge, the reference's top-k pushdown
    # (src/coordinator/handler.py:186-189) done by Catalyst
    df = knn_exact(tables["embeddings"], _qvec(tables), k=5)
    assert has_operator(df, "TakeOrderedAndProject")
    assert not has_operator(df, "GlobalLimit")  # would imply sort+limit


def test_knn_metadata_filter_pushed_to_scan(tables):
    df = knn_exact(
        tables["embeddings"], _qvec(tables), k=5, predicate=F.col("label") == 3
    )
    assert any("EqualTo(label,3)" in f for f in pushed_filters(df))


def test_point_lookup_pushdown(tables):
    df = tables["embeddings"].filter(F.col("vec_id") == 42).select("vec_id", "label")
    assert any("EqualTo(vec_id,42)" in f for f in pushed_filters(df))
    # column pruning: the 64-float embedding column must NOT be read
    assert all("embedding" not in s for s in read_schemas(df))


def test_small_dims_broadcast(tables):
    df = R.regional_revenue(
        tables["region"],
        tables["nation"],
        tables["customer"],
        tables["orders"],
        tables["lineitem"],
    )
    assert has_operator(df, "BroadcastHashJoin")


def test_q3_filter_pushed_and_topk(tables):
    df = R.top_unshipped_orders(
        tables["customer"], tables["orders"], tables["lineitem"]
    )
    assert any("c_mktsegment" in f for f in pushed_filters(df))
    assert has_operator(df, "TakeOrderedAndProject")


def test_pricing_summary_partial_agg(tables):
    # partial (map-side) + final HashAggregate, shipdate filter pushed
    from distributed_vector_database_spark.plans.explain import formatted_plan

    df = R.pricing_summary(tables["lineitem"])
    assert formatted_plan(df).count("HashAggregate") >= 2
    assert any("l_shipdate" in f for f in pushed_filters(df))


def test_doc_fingerprints_zero_shuffle(tables):
    # winnowing is scan -> staged projection -> explode; any Exchange
    # here means an accidental sort/shuffle crept into a map-only op
    from distributed_vector_database_spark.operators.textops import doc_fingerprints

    df = doc_fingerprints(tables["documents"])
    assert not has_operator(df, "Exchange")


def test_sketch_profile_accuracy_vs_exact(spark, tables):
    """HLL distinct within ~2x rsd of exact; approx percentile within
    the rank-error window of the exact interpolated percentile."""
    import pyspark.sql.functions as F

    from distributed_vector_database_spark.operators.relational import (
        sketch_profile,
    )

    events = tables["events"]
    approx = {
        r["event_type"]: r for r in sketch_profile(events, rsd=0.05).collect()
    }
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        ap = approx[et]
        assert abs(ap["approx_users"] / ex["users"] - 1.0) < 0.10
        # exact per-type value spread bounds the acceptable percentile drift
        assert abs(ap["p50_approx"] - ex["p50"]) <= abs(ex["p95"] - ex["p50"]) * 0.25 + 1e-6


def test_sketch_profile_percentile_column_names_round(spark, tables):
    """float p*100 truncates (int(0.29*100) == 28): names must round."""
    from distributed_vector_database_spark.operators.relational import (
        sketch_profile,
    )

    cols = sketch_profile(
        tables["events"], percentiles=(0.29, 0.57, 0.95)
    ).columns
    assert {"p29_approx", "p57_approx", "p95_approx"} <= set(cols)
