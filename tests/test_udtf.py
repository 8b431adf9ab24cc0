"""Python UDTF surface tests (functions/udtfs.py) + the expression
repetition cleaner (functions/text.collapse_runs_from_tokens)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.udtfs import (
    TokenRuns,
    register_udtfs,
)
from distributed_vector_database_spark.operators.textops import (
    collapse_repetitions,
)


def test_token_runs_dataframe_api(spark):
    out = TokenRuns(F.lit("a b b b c c d"), F.lit(2)).collect()
    assert [(r["start_pos"], r["run_len"], r["token"]) for r in out] == [
        (1, 3, "b"),
        (4, 2, "c"),
    ]


def test_token_runs_lateral_sql(spark):
    register_udtfs(spark)
    docs = spark.createDataFrame(
        [(0, "x x y"), (1, "no runs here"), (2, "z z z z")],
        ["doc_id", "text"],
    )
    docs.createOrReplaceTempView("run_docs")
    rows = spark.sql(
        "SELECT d.doc_id, r.start_pos, r.run_len, r.token "
        "FROM run_docs d, LATERAL token_runs(d.text, 2) r "
        "ORDER BY d.doc_id, r.start_pos"
    ).collect()
    assert [tuple(r) for r in rows] == [(0, 0, 2, "x"), (2, 0, 4, "z")]


def test_collapse_matches_udtf_accounting(spark):
    # tokens dropped by the cleaner == sum of (run_len - 1) over runs
    docs = spark.createDataFrame(
        [(0, "a a b c c c"), (1, "u v w"), (2, "m m m m n n")],
        ["doc_id", "text"],
    )
    cleaned = {
        r["doc_id"]: r for r in collapse_repetitions(docs).collect()
    }
    assert cleaned[0]["clean_text"] == "a b c"
    assert cleaned[1]["clean_text"] == "u v w"
    assert cleaned[2]["clean_text"] == "m n"
    runs = TokenRuns(F.lit("m m m m n n"), F.lit(2)).collect()
    dropped = sum(r["run_len"] - 1 for r in runs)
    assert dropped == cleaned[2]["n_collapsed"] == 4


def test_collapse_is_shuffle_free_jvm_only(spark, tables):
    df = collapse_repetitions(tables["documents"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
