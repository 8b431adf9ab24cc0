"""Text→vector search path (O20/O22): driver and executor embeddings
agree; search composes embed + k-NN + metadata projection."""

import numpy as np

from distributed_vector_database_spark.operators.semantic import (
    embed_text_column,
    text2vec,
    text_search,
)

DIM = 16


def test_text2vec_deterministic_unit():
    a = text2vec("hello world", DIM)
    b = text2vec("hello world", DIM)
    c = text2vec("other", DIM)
    assert a == b != c
    assert len(a) == DIM
    assert abs(np.linalg.norm(a) - 1.0) < 1e-9


def test_executor_embedding_matches_driver(spark):
    df = spark.createDataFrame([(1, "alpha"), (2, "beta")], "doc_id long, text string")
    rows = {r["doc_id"]: list(r["embedding"]) for r in embed_text_column(df, dim=DIM).collect()}
    assert rows[1] == text2vec("alpha", DIM)
    assert rows[2] == text2vec("beta", DIM)


def test_text_search_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i}", f"src{i}") for i in range(20)],
        "doc_id long, text string, source string",
    )
    corpus = embed_text_column(docs, dim=DIM)
    res = text_search(corpus, "document number 7", top_k=3, dim=DIM).collect()
    assert len(res) == 3
    # the exact same text embeds to the exact same vector → score 0 self-hit
    assert res[0]["doc_id"] == 7 and res[0]["score"] == 0.0
    assert res[0]["source"] == "src7"
    scores = [r["score"] for r in res]
    assert scores == sorted(scores)


def test_expr_text_embed_unit_norm_and_deterministic(spark):
    """The pure-Catalyst embedder: fixed dim, unit norm, content-
    addressed (same text → same vector), distinct texts diverge."""
    from pyspark.sql import functions as F

    from distributed_vector_database_spark.operators.semantic import (
        expr_text_embed,
    )

    df = spark.createDataFrame(
        [("alpha beta",), ("alpha beta",), ("gamma delta",)], "text string"
    )
    rows = df.select(expr_text_embed("text", 16).alias("v")).collect()
    import math

    for r in rows:
        assert len(r["v"]) == 16
        assert abs(math.sqrt(sum(x * x for x in r["v"])) - 1.0) < 1e-12
    assert rows[0]["v"] == rows[1]["v"]
    assert rows[0]["v"] != rows[2]["v"]
