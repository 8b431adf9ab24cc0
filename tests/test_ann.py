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


def test_contract_ann_queries_carry_recall_column(spark):
    """Every ann_*_topk contract query returns an in-plan recall@10
    column vs knn_exact, and the values clear the pinned floors —
    this is what makes the driver's rows-only check meaningful."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em

    floors = {
        "ann_lsh_topk": 0.5,
        "ann_ivf_topk": 0.5,
        "ann_sq_topk": 0.8,
        "ann_pq_topk": 0.3,
        "ann_ivfpq_topk": 0.3,
    }
    qs = em.queries()
    for name, floor in floors.items():
        rows = qs[name](spark, "/root/testdata/sf0.01").collect()
        assert rows, f"{name} returned no rows"
        recalls = {r["recall"] for r in rows}
        assert len(recalls) == 1, f"{name}: recall must be constant per query"
        (recall,) = recalls
        assert recall >= floor, f"{name}: recall {recall} < floor {floor}"
