"""End-to-end training-data pipeline composition."""

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.pipeline import training_pipeline


def test_pipeline_dedups_and_packs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    docs = spark.createDataFrame(
        [
            (1, base, "en", "s", 70),
            (2, base, "en", "s", 70),                  # exact dup of 1 → dropped
            (3, base + " again", "en", "s", 76),       # near dup of 1 → dropped
            (4, "completely different text about spark engines and data quality tools", "en", "s", 70),
            # long all-punct tokens: len/wordlen/punct all score low → dropped
            (5, "????????????? !!!!!!!!!!!!!!!", "en", "s", 29),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = training_pipeline(docs, min_quality=0.5, token_budget=512)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 4}
    assert all(r["bin_id"] == 0 for r in rows.values())


def test_pipeline_fixture_survivor_rate(tables):
    docs = tables["documents"]
    out = training_pipeline(docs)
    n_in, n_out = docs.count(), out.count()
    assert 0 < n_out <= n_in
    # packing invariant: bins contiguous from 0 per lang
    for lang_row in out.select("lang").distinct().collect():
        bins = sorted(
            r["bin_id"]
            for r in out.filter(F.col("lang") == lang_row["lang"])
            .select("bin_id")
            .distinct()
            .collect()
        )
        assert bins[0] == 0 and bins == list(range(len(bins)))


def test_audited_pipeline_reports_stage_counts(spark, tables):
    from distributed_vector_database_spark.operators.pipeline import (
        training_pipeline_audited,
    )

    packed, obs = training_pipeline_audited(tables["documents"])
    out_rows = packed.count()  # one action drives every observation
    got = {name: o.get["rows"] for name, o in obs.items()}
    assert got["input"] == tables["documents"].count()
    assert got["input"] >= got["quality"] >= got["exact"] >= 1
    assert got["packed"] == out_rows
