"""ANN paths tested by recall against the exact oracle (SURVEY §5.2 —
approximate results can't hash-match; recall@k is the contract)."""

import pytest

from distributed_vector_database_spark.operators.ann import (
    ivf_build,
    ivf_search,
    lsh_ann,
    lsh_model,
)
from distributed_vector_database_spark.operators.knn import knn_exact


@pytest.fixture(scope="module")
def qvec(tables):
    return list(tables["embeddings"].filter("vec_id = 7").first()["embedding"])


@pytest.fixture(scope="module")
def exact_ids(tables, qvec):
    return {
        r["vec_id"] for r in knn_exact(tables["embeddings"], qvec, k=10).collect()
    }


def test_lsh_recall(tables, qvec, exact_ids):
    model, indexed = lsh_model(tables["embeddings"], num_hash_tables=5)
    got = {r["vec_id"] for r in lsh_ann(model, indexed, qvec, k=10).collect()}
    recall = len(got & exact_ids) / len(exact_ids)
    assert recall >= 0.5, f"LSH recall@10 too low: {recall}"


def test_ivf_full_probe_equals_exact(spark, tables, qvec, exact_ids):
    # probing every centroid partition == exact search
    centroids, assigned = ivf_build(tables["embeddings"], n_centroids=4)
    got = {
        r["vec_id"]
        for r in ivf_search(
            spark, centroids, assigned, qvec, k=10, nprobe=4
        ).collect()
    }
    assert got == exact_ids


def test_ivf_partial_probe_recall(spark, tables, qvec, exact_ids):
    centroids, assigned = ivf_build(tables["embeddings"], n_centroids=8)
    got = {
        r["vec_id"]
        for r in ivf_search(
            spark, centroids, assigned, qvec, k=10, nprobe=3
        ).collect()
    }
    recall = len(got & exact_ids) / len(exact_ids)
    assert recall >= 0.5, f"IVF recall@10 too low: {recall}"
