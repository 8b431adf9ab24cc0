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


# -- property-based chunking invariants (hypothesis) -------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_texts = st.lists(
    st.integers(min_value=1, max_value=40).map(
        lambda n: " ".join(f"w{i}" for i in range(n))
    ),
    min_size=1,
    max_size=4,
)
_params = st.tuples(
    st.integers(min_value=2, max_value=8),   # chunk_tokens
    st.integers(min_value=0, max_value=1),   # overlap scale (0 or chunk//2)
)


@given(_texts, _params)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunking_covers_every_token_in_order(spark, texts, params):
    """For ANY doc and any (chunk, overlap): concatenating chunks with
    the overlap removed reconstructs the document exactly — no token
    lost, none duplicated beyond the declared overlap."""
    from distributed_vector_database_spark.operators.textops import chunk_documents

    chunk, ov_flag = params
    overlap = (chunk // 2) * ov_flag
    stride = chunk - overlap
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out = {}
    for r in chunk_documents(docs, chunk_tokens=chunk, overlap=overlap).collect():
        out.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"].split()
    for doc_id, text in enumerate(texts):
        toks = text.split()
        chunks = [out[doc_id][i] for i in sorted(out[doc_id])]
        rebuilt = list(chunks[0])
        for c in chunks[1:]:
            assert c[:overlap] == rebuilt[len(rebuilt) - overlap :][: len(c)] if overlap else True
            rebuilt.extend(c[overlap:] if overlap else c)
        assert rebuilt == toks, (doc_id, chunk, overlap)
        # every chunk except possibly the last is exactly chunk_tokens
        assert all(len(c) == chunk for c in chunks[:-1])


def test_model_quality_scores_monotone_and_bounded(spark):
    from distributed_vector_database_spark.operators.textops import (
        model_quality_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "a clean well formed sentence about spark engines runs here"),
            (2, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    w = {"n_tokens": 0.02, "punct_ratio": -3.0, "quality": 2.0}
    out = {
        r["doc_id"]: r["model_score"]
        for r in model_quality_scores(docs, w, bias=-1.5).collect()
    }
    assert all(0.0 <= v <= 1.0 for v in out.values())
    assert out[1] > out[2]  # punctuation soup scores below clean prose

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown features"):
        model_quality_scores(docs, {"nope": 1.0}).collect()


def test_model_quality_scores_accepts_mllib_coefficients(spark):
    """The claimed workflow: train MLlib logistic regression on the
    same feature vector, ship its coefficients as plan literals —
    expression scores must equal the model's own probabilities."""
    import pytest as _pytest

    _pytest.importorskip("pyspark.ml")
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.sql import functions as F

    from distributed_vector_database_spark.functions.text import (
        punct_ratio,
        quality_score,
        tokenize,
    )
    from distributed_vector_database_spark.operators.textops import (
        model_quality_scores,
    )

    texts = [
        (i, ("good clean prose with many reasonable words here now " * 3)
         if i % 2 else "!!! ### $$$ %% ^^", i % 2)
        for i in range(40)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string, label int")
    feats = docs.select(
        "doc_id",
        "label",
        F.size(tokenize("text")).cast("double").alias("n_tokens"),
        punct_ratio("text").alias("punct_ratio"),
        quality_score("text").alias("quality"),
    )
    asm = VectorAssembler(
        inputCols=["n_tokens", "punct_ratio", "quality"], outputCol="f"
    )
    model = LogisticRegression(featuresCol="f", labelCol="label").fit(
        asm.transform(feats)
    )
    w = dict(zip(["n_tokens", "punct_ratio", "quality"], model.coefficients))
    scored = {
        r["doc_id"]: r["model_score"]
        for r in model_quality_scores(docs, w, float(model.intercept)).collect()
    }
    probs = {
        r["doc_id"]: float(r["probability"][1])
        for r in model.transform(asm.transform(feats)).collect()
    }
    for i in scored:
        assert abs(scored[i] - probs[i]) < 1e-6, (i, scored[i], probs[i])
