"""PII redaction + corpus vocabulary tests (operators/textops.py)."""

from __future__ import annotations

from distributed_vector_database_spark.operators.textops import (
    redact_pii,
    top_terms,
)


def test_redact_pii_all_three_kinds(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail me at alice.smith+x@sub.example.co.uk today"),
            (1, "server at 10.0.42.7 went down"),
            (2, "call +1 555 010 4242 now"),
            (3, "no pii here at all"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["redacted"] for r in redact_pii(docs).collect()}
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "server at <IP> went down"
    assert got[2] == "call <PHONE> now"
    assert got[3] == "no pii here at all"


def test_redact_pii_email_wins_over_phone(spark):
    # the digit-heavy local part must be scrubbed as EMAIL, not chewed
    # into a <PHONE> fragment (pattern order pins this)
    docs = spark.createDataFrame([(0, "x 12345678901@example.com y")], ["doc_id", "text"])
    out = redact_pii(docs).collect()[0]["redacted"]
    assert out == "x <EMAIL> y"


def test_redact_pii_is_shuffle_free_jvm_only(spark, tables):
    df = redact_pii(tables["documents"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_top_terms_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "a a a b"),
            (1, "b c"),
            (2, "a"),
        ],
        ["doc_id", "text"],
    )
    rows = top_terms(docs, n=2).collect()
    assert [(r["term"], r["tf"], r["df"]) for r in rows] == [
        ("a", 4, 2),
        ("b", 2, 2),
    ]


def test_chunk_documents_coverage_and_overlap(spark):
    from distributed_vector_database_spark.operators.textops import chunk_documents

    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10))), (1, "a b")],
        ["doc_id", "text"],
    )
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    )
    assert rows == [
        (0, 0, "t0 t1 t2 t3", 4),
        (0, 1, "t3 t4 t5 t6", 4),  # stride 3: starts at token 3 (overlap 1)
        (0, 2, "t6 t7 t8 t9", 4),
        (1, 0, "a b", 2),  # short doc -> single remainder chunk
    ]
    # every token of doc 0 appears in some chunk (full coverage)
    covered = set()
    for _, _, text, _ in rows[:3]:
        covered |= set(text.split())
    assert covered == {f"t{i}" for i in range(10)}


def test_chunk_documents_rejects_bad_params(spark):
    import pytest as _pytest

    from distributed_vector_database_spark.operators.textops import chunk_documents

    docs = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
