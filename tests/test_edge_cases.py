"""Empty-input / no-match regression pins for the round-8 operators:
each of these paths must degrade to an empty (or original-only)
result, never raise."""

from __future__ import annotations


def test_prf_search_no_matching_feedback_docs(spark, tmp_path):
    from distributed_vector_database_spark.operators.lexical import (
        postings_write,
        prf_search,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    )
    path = str(tmp_path / "p")
    postings_write(docs, path, n_buckets=4)
    assert prf_search(spark, path, docs, ["zzz_nomatch"], k=5).count() == 0


def test_record_link_empty_right_catalog(spark):
    from distributed_vector_database_spark.operators.dedup import record_link

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert record_link(docs, empty, threshold=0.5).count() == 0


def test_hard_negatives_no_different_label_exists(spark):
    from distributed_vector_database_spark.operators.knn import hard_negatives

    emb = spark.createDataFrame(
        [(0, [0.0], "A"), (1, [1.0], "A")],
        "vec_id long, embedding array<double>, label string",
    )
    assert hard_negatives(emb, emb.filter("vec_id = 0"), k=3).count() == 0


def test_length_grouped_batches_empty_corpus(spark):
    from distributed_vector_database_spark.operators.textops import (
        length_grouped_batches,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert length_grouped_batches(empty, batch_size=4).count() == 0
