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


def test_temperature_sample_scan_is_shuffle_free(tables):
    # the corpus side must never shuffle: one tiny stratum-count agg
    # broadcast back, then a filter scan — exchanges only on the
    # counts leg (rows = number of strata, not corpus rows)
    from distributed_vector_database_spark.operators.sampling import (
        temperature_sample,
    )
    from distributed_vector_database_spark.plans.explain import (
        exchange_nodes,
        formatted_plan,
    )

    df = temperature_sample(tables["documents"], "lang", "doc_id")
    assert has_operator(df, "BroadcastHashJoin")
    # counts agg + the constant-key window hop; rows = |strata|
    shuf, bcast = exchange_nodes(df)
    assert shuf <= 2 and bcast <= 1
    assert "Python" not in formatted_plan(df)


def test_remove_dup_spans_one_gram_shuffle(tables):
    # corpus-sized data crosses the wire once (the md5-gram window /
    # flag aggregation); reconstruction is a map pass, no Python
    from distributed_vector_database_spark.operators.dedup import (
        remove_duplicate_spans,
    )
    from distributed_vector_database_spark.plans.explain import (
        exchange_nodes,
        formatted_plan,
    )

    df = remove_duplicate_spans(tables["documents"], k=8)
    plan = formatted_plan(df)
    assert "Python" not in plan
    # gram count window + rank window share the gram partitioning;
    # flag agg + doc_id join legs are sized by duplicated mass
    shuf, _ = exchange_nodes(df)
    assert shuf <= 3


def test_jl_projection_zero_shuffle(tables):
    from distributed_vector_database_spark.functions.vector import (
        project,
        rademacher_matrix,
    )
    from distributed_vector_database_spark.plans.explain import (
        formatted_plan,
        shuffle_count,
    )

    emb = tables["embeddings"].withColumn(
        "__v", F.col("embedding").cast("array<double>")
    )
    df = emb.select("vec_id", project("__v", rademacher_matrix(64, 8)).alias("p"))
    assert shuffle_count(df) == 0
    assert "Python" not in formatted_plan(df)


def test_snapshot_diff_single_shuffle(spark):
    from distributed_vector_database_spark.operators.changelog import (
        snapshot_diff,
    )
    from distributed_vector_database_spark.plans.explain import exchange_nodes

    log = spark.createDataFrame(
        [("PUT", "a", 1.0, 10, 1)], "op string, key string, value double, ts long, seq long"
    )
    df = snapshot_diff(log, 10, 20, seq_col="seq", value_cols=["value"])
    # ONE hash shuffle on key (partial + final agg share it)
    assert exchange_nodes(df) == (1, 0)



def test_embedding_outliers_zero_shuffle(tables):
    # quality gate must stay a map-only pass (runs before indexing at
    # corpus scale — a shuffle here would double-scan 100 TB)
    from distributed_vector_database_spark.operators.ann import (
        embedding_outliers,
    )

    cents = [[0.0] * 64, [1.0] * 64]
    df = embedding_outliers(tables["embeddings"], cents, max_dist=5.0)
    assert not has_operator(df, "Exchange")
    assert not has_operator(df, "MapInPandas")  # codegen, not Python


def test_leakage_safe_split_adds_no_shuffle(tables):
    # split assignment is one map expression over the clustering
    # output — content-stable hash, no exchange of its own
    from distributed_vector_database_spark.operators.sampling import (
        leakage_safe_split,
    )

    members = tables["embeddings"].select(
        F.col("vec_id").alias("id"), (F.col("vec_id") % 10).alias("rep_id")
    )
    df = leakage_safe_split(members, test_pct=10)
    assert not has_operator(df, "Exchange")


def test_volume_shipping_customer_prunes_before_fact_join(tables):
    # VERDICT r7 #2: customer must meet the broadcast two-nation frame
    # BEFORE the o_custkey fact join, so at 100x only 2/|nations| of
    # customers ship into the shuffle. All joins here broadcast at
    # fixture scale; the load-bearing check is that no shuffle (and no
    # sort-merge path) carries the unpruned customer table.
    df = R.volume_shipping(
        tables["lineitem"],
        tables["orders"],
        tables["customer"],
        tables["supplier"],
        tables["nation"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the customer⋈nation(c_nk) prune must sit on the BUILD side of
    # the o_custkey fact join, i.e. print DEEPER (later) than it; in
    # the pre-fix plan the c_nk join was outermost (applied after the
    # fact join) and printed first
    fact_join = plan.index("BroadcastHashJoin [o_custkey")
    prune_join = plan.index("], [c_nk")
    assert prune_join > fact_join, "customer joins the fact side unpruned"
