"""Deletion propagation: purged artifacts must equal a from-scratch
rebuild over the remaining corpus."""

from pyspark.sql import functions as F

DOCS = "doc_id long, text string"

CORPUS = [
    (1, "spark filter join spark engine runs the query fast"),
    (2, "filter join filter predicate pushdown into the scan"),
    (3, "totally unrelated prose about gardens and weather today"),
    (4, "spark spark spark join join filter engine scan"),
    (5, "another document about query engines and spark scans"),
    (6, "gardens and weather and prose and nothing else at all"),
]
PURGE = [2, 4]


def _top(spark, path, terms):
    from distributed_vector_database_spark.operators.lexical import (
        bm25_postings_search,
    )

    return [
        (r["doc_id"], r["score"])
        for r in bm25_postings_search(spark, path, terms, k=10).collect()
    ]


def test_postings_purge_equals_rebuild(spark, tmp_path):
    from distributed_vector_database_spark.operators.lexical import postings_write
    from distributed_vector_database_spark.operators.purge import (
        purge_from_postings,
    )

    full = spark.createDataFrame(CORPUS, DOCS)
    remaining = full.filter(~F.col("doc_id").isin(PURGE))
    p_purged = str(tmp_path / "a")
    p_rebuilt = str(tmp_path / "b")
    postings_write(full, p_purged, n_buckets=8)
    postings_write(remaining, p_rebuilt, n_buckets=8)

    removed = purge_from_postings(spark, p_purged, PURGE)
    assert removed > 0
    terms = ["spark", "filter", "join"]
    # identical ranking AND identical scores: n_docs/avgdl/df all
    # corrected through the negative-delta marker
    assert _top(spark, p_purged, terms) == _top(spark, p_rebuilt, terms)
    # purging absent ids is a no-op
    assert purge_from_postings(spark, p_purged, [999]) == 0
    assert _top(spark, p_purged, terms) == _top(spark, p_rebuilt, terms)


def test_postings_purge_with_string_doc_ids(spark, tmp_path):
    # doc_col is configurable — string ids must purge natively, with
    # no int() coercion (ADVICE r6)
    from distributed_vector_database_spark.operators.lexical import postings_write
    from distributed_vector_database_spark.operators.purge import (
        purge_from_postings,
    )

    full = spark.createDataFrame(
        [(f"doc-{i}", t) for i, t in CORPUS], "doc_id string, text string"
    )
    purge_ids = [f"doc-{i}" for i in PURGE]
    remaining = full.filter(~F.col("doc_id").isin(purge_ids))
    p_purged = str(tmp_path / "s_a")
    p_rebuilt = str(tmp_path / "s_b")
    postings_write(full, p_purged, n_buckets=8)
    postings_write(remaining, p_rebuilt, n_buckets=8)
    assert purge_from_postings(spark, p_purged, purge_ids) > 0
    terms = ["spark", "filter", "join"]
    assert _top(spark, p_purged, terms) == _top(spark, p_rebuilt, terms)


def test_span_state_purge_equals_rebuild(spark):
    from distributed_vector_database_spark.operators.dedup import span_gram_state
    from distributed_vector_database_spark.operators.purge import span_state_purge

    full = spark.createDataFrame(CORPUS, DOCS)
    purged_docs = full.filter(F.col("doc_id").isin(PURGE))
    remaining = full.filter(~F.col("doc_id").isin(PURGE))

    got = span_state_purge(span_gram_state(full, k=5), purged_docs, k=5)
    want = span_gram_state(remaining, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_purge_clears_fully_victim_buckets(spark, tmp_path):
    """A term occurring ONLY in purged docs can occupy a bucket whose
    every row is a victim; dynamic overwrite alone would leave those
    postings serving the deleted doc."""
    from distributed_vector_database_spark.operators.lexical import (
        bm25_postings_search,
        postings_write,
    )
    from distributed_vector_database_spark.operators.purge import (
        purge_from_postings,
    )

    docs = spark.createDataFrame(
        [(1, "zzzuniqueterm only here"), (2, "normal words live on")], DOCS
    )
    path = str(tmp_path / "p")
    # many buckets -> the victim's terms very likely isolate; assert on
    # behavior either way: the purged doc must be unfindable
    postings_write(docs, path, n_buckets=64)
    purge_from_postings(spark, path, [1])
    hits = bm25_postings_search(spark, path, ["zzzuniqueterm"], k=5).collect()
    assert hits == []
    alive = bm25_postings_search(spark, path, ["normal"], k=5).collect()
    assert [r["doc_id"] for r in alive] == [2]
