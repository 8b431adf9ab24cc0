"""JSONL ingestion + quarantine tests (sources/jsonl.py)."""

from __future__ import annotations

from distributed_vector_database_spark.sources.jsonl import (
    quarantine,
    read_jsonl,
    valid_documents,
    write_jsonl,
)


def _write_lines(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_split_valid_and_quarantine(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    _write_lines(
        p,
        [
            '{"doc_id": 1, "text": "good one", "lang": "en", "source": "s", "n_chars": 8}',
            'this is not json at all',
            '{"doc_id": 2, "text": "also fine"}',  # missing optional cols -> null, still valid
            '{"doc_id": null, "text": "no id"}',  # required null -> quarantine
            '{"doc_id": 3}',  # missing required text -> quarantine
            '{"doc_id": "abc", "text": "bad type"}',  # type mismatch -> corrupt
        ],
    )
    parsed = read_jsonl(spark, str(p))
    good = valid_documents(parsed)
    bad = quarantine(parsed)

    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    assert good.columns == ["doc_id", "text", "lang", "source", "n_chars"]

    qrows = bad.collect()
    assert len(qrows) == 4
    reasons = sorted(r["reason"] for r in qrows)
    assert reasons == ["missing_required"] * 2 + ["unparseable"] * 2
    # unparseable rows keep the raw line for audit/replay
    raws = {r["raw_line"] for r in qrows if r["reason"] == "unparseable"}
    assert "this is not json at all" in raws


def test_roundtrip_through_jsonl_sink(spark, tmp_path, tables):
    docs = tables["documents"]
    out = str(tmp_path / "out")
    write_jsonl(docs, out)
    back = valid_documents(read_jsonl(spark, out))
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.select(*docs.columns).collect()}
    assert a == b
