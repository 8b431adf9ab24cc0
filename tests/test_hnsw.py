"""Pure-numpy HNSW graph (operators/hnsw.py) — the reference's index
algorithm (hnswlib M=32/ef_construction=128,
/root/reference/src/datanode/handler.py:46,86-88) without the native
dependency."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.hnsw import (
    HnswIndex,
    hnsw_partition_topk,
)
from distributed_vector_database_spark.operators.knn import knn_exact

QUERY = [0.1] * 64


def _brute(mat, q, k):
    d = mat - np.asarray(q, dtype=np.float64)
    return np.argsort(np.einsum("ij,ij->i", d, d), kind="stable")[:k]


def test_index_recall_on_random_data():
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(2000, 32))
    q = rng.normal(size=32)
    idx = HnswIndex(m=16, ef_construction=128, seed=42).build(mat)
    got = {i for _, i in idx.search(q, 10, ef=64)}
    exact = set(_brute(mat, q, 10).tolist())
    assert len(got & exact) >= 9  # recall@10 >= 0.9 (observed 1.0)


def test_index_recall_on_clustered_data():
    # clusters are where the Algorithm-4 selection heuristic earns its
    # keep — greedy nearest-only links strand the search in one cluster
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(10, 32)) * 6
    labels = rng.integers(0, 10, 1500)
    mat = centers[labels] + rng.normal(size=(1500, 32)) * 0.4
    idx = HnswIndex(m=16, ef_construction=128, seed=42).build(mat)
    recalls = []
    for c in range(10):
        q = centers[c] + rng.normal(size=32) * 0.4
        got = {i for _, i in idx.search(q, 10, ef=64)}
        recalls.append(len(got & set(_brute(mat, q, 10).tolist())) / 10)
    assert np.mean(recalls) >= 0.95


def test_index_deterministic():
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(400, 16))
    q = rng.normal(size=16)
    a = HnswIndex(m=8, ef_construction=64, seed=42).build(mat).search(q, 5, ef=32)
    b = HnswIndex(m=8, ef_construction=64, seed=42).build(mat).search(q, 5, ef=32)
    assert a == b


def test_index_edge_cases():
    idx = HnswIndex(m=4)
    assert idx.search([0.0, 0.0], 3) == []  # empty index
    idx.build(np.array([[1.0, 1.0]]))
    hits = idx.search([0.0, 0.0], 5)  # k > n
    assert [i for _, i in hits] == [0]
    with pytest.raises(ValueError):
        HnswIndex(m=1)


def test_partition_topk_exact_anchor_matches_knn_exact(tables):
    """ef >= partition rows → the kernel's exhaustive branch: must equal
    knn_exact row-for-row (the contract anchor's mode)."""
    emb = tables["embeddings"]
    got = hnsw_partition_topk(emb, QUERY, k=10, ef=10**9).collect()
    exact = knn_exact(emb, QUERY, k=10, extra_cols=()).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in exact
    ]


def test_partition_topk_graph_path_recall(tables):
    """The real beam-search path (ef < n) with in-test recall vs exact."""
    emb = tables["embeddings"]
    got = {r["vec_id"] for r in hnsw_partition_topk(emb, QUERY, k=10, ef=64).collect()}
    exact = {r["vec_id"] for r in knn_exact(emb, QUERY, k=10, extra_cols=()).collect()}
    assert len(got & exact) >= 9


def test_partition_topk_deterministic_across_runs(tables):
    emb = tables["embeddings"]
    a = hnsw_partition_topk(emb, QUERY, k=10, ef=64).collect()
    b = hnsw_partition_topk(emb, QUERY, k=10, ef=64).collect()
    assert a == b


def test_partition_topk_predicate_filters_before_kernel(tables):
    emb = tables["embeddings"]
    got = hnsw_partition_topk(
        emb, QUERY, k=5, ef=10**9, predicate=F.col("label") == 1
    ).collect()
    exact = knn_exact(
        emb, QUERY, k=5, predicate=F.col("label") == 1, extra_cols=()
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in exact
    ]


def test_write_then_read_search_round_trip(tables, tmp_path):
    """Persisted graph serving (build once, reload, search — the
    reference's save_index/load_index restart path): the reloaded
    graph's beam search must agree with building in-memory, and its
    exhaustive mode must equal knn_exact."""
    emb = tables["embeddings"]
    path = str(tmp_path / "hnsw_idx")
    from distributed_vector_database_spark.operators.hnsw import hnsw_read_search, hnsw_write

    hnsw_write(emb, path, num_shards=4, m=16)
    spark = emb.sparkSession
    # exhaustive mode == exact oracle
    got = hnsw_read_search(spark, path, QUERY, k=10, ef=10**9).collect()
    exact = knn_exact(emb, QUERY, k=10, extra_cols=()).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in exact
    ]
    # graph mode: high recall + deterministic across reloads
    g1 = hnsw_read_search(spark, path, QUERY, k=10, ef=64).collect()
    g2 = hnsw_read_search(spark, path, QUERY, k=10, ef=64).collect()
    assert g1 == g2
    hits = {r["vec_id"] for r in g1} & {r["vec_id"] for r in exact}
    assert len(hits) >= 9


def test_knn_join_exact_mode_matches_brute_join(tables):
    """ef >= shard rows ⇒ every shard takes the exact GEMM pass:
    hnsw_knn_join must reproduce knn_join bit-for-bit."""
    from distributed_vector_database_spark.operators.hnsw import hnsw_knn_join
    from distributed_vector_database_spark.operators.knn import knn_join

    emb = tables["embeddings"]
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = hnsw_knn_join(queries, emb, k=5, ef=10**9).collect()
    want = knn_join(queries, emb, k=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_knn_join_graph_mode_recall(tables):
    from distributed_vector_database_spark.operators.hnsw import hnsw_knn_join
    from distributed_vector_database_spark.operators.knn import knn_join

    emb = tables["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = hnsw_knn_join(queries, emb, k=5, ef=64).collect()
    want = knn_join(queries, emb, k=5).collect()
    got_pairs = {(r["query_id"], r["vec_id"]) for r in got}
    want_pairs = {(r["query_id"], r["vec_id"]) for r in want}
    assert len(got_pairs & want_pairs) / len(want_pairs) >= 0.9


def test_partition_topk_multi_partition_merge(tables):
    """Graph-per-partition with a many-partition layout still merges to
    the global top-k: exact anchor mode across 8 partitions."""
    emb = tables["embeddings"].repartition(8, "vec_id")
    got = hnsw_partition_topk(emb, QUERY, k=10, ef=10**9).collect()
    exact = knn_exact(tables["embeddings"], QUERY, k=10, extra_cols=()).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in exact
    ]
