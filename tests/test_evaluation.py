"""retrieval_metrics: recall@k / MRR / nDCG@k against hand-computed
values, including graded relevance, no-relevant queries, and the
unjudged-docs-are-irrelevant convention."""

import math

from distributed_vector_database_spark.operators.evaluation import (
    retrieval_metrics,
)


def _dcg(rels):
    return sum(r / math.log2(i + 2) for i, r in enumerate(rels))


def test_retrieval_metrics_hand_case(spark):
    # q1: ranked [10, 11, 12]; relevant {10, 12, 13} (13 never
    # retrieved) -> recall 2/3, first hit rank 1, dcg over [1,0,1]
    # q2: ranked [20, 21]; nothing relevant -> all zeros
    # q3: graded rels: retrieved [30(rel1), 31(rel2)]; ideal order
    # puts rel2 first, so ndcg < 1 even though recall is 1
    results = spark.createDataFrame(
        [
            (1, 10, 1), (1, 11, 2), (1, 12, 3),
            (2, 20, 1), (2, 21, 2),
            (3, 30, 1), (3, 31, 2),
        ],
        "query_id long, vec_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [
            (1, 10, 1.0), (1, 12, 1.0), (1, 13, 1.0),
            (3, 30, 1.0), (3, 31, 2.0),
        ],
        "query_id long, vec_id long, rel double",
    )
    got = {r["query_id"]: r for r in retrieval_metrics(results, qrels, k=3).collect()}
    assert set(got) == {1, 2, 3}

    r1 = got[1]
    assert abs(r1["recall_k"] - 2 / 3) < 1e-6
    assert abs(r1["mrr"] - 1.0) < 1e-9
    want_ndcg1 = _dcg([1, 0, 1]) / _dcg([1, 1, 1])
    assert abs(r1["ndcg_k"] - want_ndcg1) < 1e-6

    r2 = got[2]
    assert r2["recall_k"] == 0.0 and r2["mrr"] == 0.0 and r2["ndcg_k"] == 0.0

    r3 = got[3]
    assert abs(r3["recall_k"] - 1.0) < 1e-9
    assert abs(r3["mrr"] - 1.0) < 1e-9  # rank-1 doc IS relevant (rel 1)
    want_ndcg3 = _dcg([1, 2]) / _dcg([2, 1])
    assert abs(r3["ndcg_k"] - want_ndcg3) < 1e-6


def test_retrieval_metrics_cutoff_applies(spark):
    # relevant doc sits at rank 4: with k=3 it contributes nothing
    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4)],
        "query_id long, vec_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 13, 1.0)], "query_id long, vec_id long, rel double"
    )
    r3 = retrieval_metrics(results, qrels, k=3).collect()[0]
    assert r3["recall_k"] == 0.0 and r3["mrr"] == 0.0 and r3["ndcg_k"] == 0.0
    r4 = retrieval_metrics(results, qrels, k=4).collect()[0]
    assert r4["recall_k"] == 1.0 and abs(r4["mrr"] - 0.25) < 1e-9
    assert abs(r4["ndcg_k"] - _dcg([0, 0, 0, 1]) / _dcg([1])) < 1e-6
