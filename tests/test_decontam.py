"""Benchmark decontamination + cross-source overlap tests
(operators/decontam.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.decontam import (
    contamination_report,
    decontaminate,
    source_overlap,
)


def _corpora(spark):
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "pack my box with five dozen liquor jugs"),
            (2, "sphinx of black quartz judge my vow"),
            (3, "the quick brown cat sits still"),  # shares 'the quick brown'
            (4, "tiny doc"),  # < n tokens -> no grams, never contaminated
        ],
        ["doc_id", "text"],
    )
    evals = spark.createDataFrame(
        [
            (100, "we ask the quick brown fox a question"),
            (101, "judge my vow carefully please"),
        ],
        ["doc_id", "text"],
    )
    return corpus, evals


def test_contamination_report_counts(spark):
    corpus, evals = _corpora(spark)
    rep = {
        r["doc_id"]: r
        for r in contamination_report(corpus, evals, n=3).collect()
    }
    assert len(rep) == 5  # every corpus doc gets a row
    # doc 0 shares 'the quick brown' + 'quick brown fox'; doc 2 shares
    # 'judge my vow'; doc 3 shares 'the quick brown'
    assert rep[0]["n_overlap"] == 2 and rep[0]["contaminated"]
    assert rep[2]["n_overlap"] == 1 and rep[2]["contaminated"]
    assert rep[3]["n_overlap"] == 1 and rep[3]["contaminated"]
    assert rep[1]["n_overlap"] == 0 and not rep[1]["contaminated"]
    # short doc: zero grams, zero overlap
    assert rep[4]["n_ngrams"] == 0 and rep[4]["n_overlap"] == 0


def test_decontaminate_strict_and_threshold(spark):
    corpus, evals = _corpora(spark)
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, evals, n=3).collect()
    )
    assert kept == [1, 4]
    # min_overlap=2 tolerates single-gram collisions: only doc 0 dies
    kept2 = sorted(
        r["doc_id"]
        for r in decontaminate(corpus, evals, n=3, min_overlap=2).collect()
    )
    assert kept2 == [1, 2, 3, 4]
    # surviving rows keep the full schema
    assert decontaminate(corpus, evals, n=3).columns == corpus.columns


def test_decontaminate_matches_report(spark, tables):
    docs = tables["documents"]
    evals = docs.filter(F.col("doc_id") % 41 == 0)
    corpus = docs.filter(F.col("doc_id") % 41 != 0)
    rep = contamination_report(corpus, evals, n=3)
    clean_per_report = {
        r["doc_id"] for r in rep.filter(~F.col("contaminated")).collect()
    }
    kept = {r["doc_id"] for r in decontaminate(corpus, evals, n=3).collect()}
    assert kept == clean_per_report


def test_eval_side_is_broadcast(spark, tables):
    docs = tables["documents"]
    evals = docs.filter(F.col("doc_id") % 41 == 0)
    corpus = docs.filter(F.col("doc_id") % 41 != 0)
    plan = (
        decontaminate(corpus, evals, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the contamination probe must reach the corpus scan as a broadcast
    # semi-join — a sort-merge join here means a corpus-wide shuffle
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "Python" not in plan


def test_streaming_decontam_matches_batch(spark, tmp_path):
    import json

    from distributed_vector_database_spark.streaming.decontam import (
        decontaminate_stream,
        read_clean_documents,
        read_document_stream,
    )

    corpus, evals = _corpora(spark)
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    # two files -> (up to) two micro-batches under availableNow
    rows = corpus.collect()
    for i, chunk in enumerate((rows[:3], rows[3:])):
        with open(docs_dir / f"part{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")

    out = str(tmp_path / "clean")
    qy = decontaminate_stream(
        read_document_stream(spark, str(docs_dir)),
        evals,
        out,
        str(tmp_path / "ckpt"),
        n=3,
    )
    qy.awaitTermination(120)
    got = sorted(
        r["doc_id"] for r in read_clean_documents(spark, out).collect()
    )
    want = sorted(
        r["doc_id"] for r in decontaminate(corpus, evals, n=3).collect()
    )
    assert got == want == [1, 4]


def test_document_stream_drops_corrupt_lines(spark, tmp_path):
    from distributed_vector_database_spark.streaming.decontam import (
        read_document_stream,
    )

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    (docs_dir / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "fine"}\n'
        "not json at all\n"
        '{"doc_id": null, "text": "no id"}\n'
        '{"doc_id": 2, "text": "also fine"}\n'
    )
    q = (
        read_document_stream(spark, str(docs_dir))
        .writeStream.format("memory")
        .queryName("clean_docs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["doc_id"] for r in spark.sql("select * from clean_docs").collect()
    )
    assert got == [1, 2]


def test_source_overlap_sketch_tracks_exact(spark, tables):
    from distributed_vector_database_spark.operators.decontam import (
        source_overlap,
        source_overlap_sketch,
    )

    docs = tables["documents"]
    exact = {
        (r["source_a"], r["source_b"]): r["containment"]
        for r in source_overlap(docs, n=3).collect()
    }
    est = {
        (r["source_a"], r["source_b"]): r["containment_est"]
        for r in source_overlap_sketch(docs, n=3).collect()
    }
    # sketch emits the full cross (absence in exact means containment 0)
    n_sources = docs.select("source").distinct().count()
    assert len(est) == n_sources * n_sources
    for pair, c in exact.items():
        assert abs(est[pair] - c) < 0.08, (pair, c, est[pair])
    # diagonal near 1.0
    for s in {a for a, _ in est}:
        assert abs(est[(s, s)] - 1.0) < 0.05


def test_source_overlap_matrix(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta", "s1"),
            (1, "alpha beta gamma epsilon", "s2"),  # shares 'alpha beta gamma'
            (2, "zeta eta theta iota", "s3"),  # disjoint
        ],
        ["doc_id", "text", "source"],
    )
    m = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap(docs, n=3).collect()
    }
    # diagonal anchors
    for s in ("s1", "s2", "s3"):
        assert m[(s, s)]["containment"] == 1.0
    # s1 has grams {abc, bcd}; shares only 'alpha beta gamma' with s2
    assert m[("s1", "s2")]["n_shared"] == 1
    assert abs(m[("s1", "s2")]["containment"] - 0.5) < 1e-9
    # disjoint slices produce NO row (inner join) — absence is the signal
    assert ("s1", "s3") not in m and ("s3", "s1") not in m


def test_semantic_decontam_flags_paraphrase_shaped_neighbors(spark):
    """Hand-built geometry: a corpus vector nearly parallel to an eval
    vector is flagged with the right best-match; orthogonal ones are
    not; zero vectors never flag (cosine defined 0); ties go to the
    smaller eval id."""
    from distributed_vector_database_spark.operators.decontam import (
        semantic_decontam,
    )

    ev = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (10, [0.99, 0.01]),   # ~eval 0
            (11, [0.0, 5.0]),     # exactly eval 1 direction (scale-free)
            (12, [1.0, -1.0]),    # 45 deg off both: cos ~0.707 < 0.95
            (13, [0.0, 0.0]),     # zero vector: cosine 0, never flags
            (14, [1.0, 1.0]),     # cos ~0.7071 to BOTH: tie -> eval 0
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["eval_id"], r["cosine"])
        for r in semantic_decontam(corpus, ev, threshold=0.95).collect()
    }
    assert set(got) == {10, 11}
    assert got[10][0] == 0 and got[10][1] > 0.99
    assert got[11] == (1, 1.0)

    low = {
        r["vec_id"]: r["eval_id"]
        for r in semantic_decontam(corpus, ev, threshold=0.7).collect()
    }
    assert low[14] == 0  # equal cosine to both evals -> smaller id wins
    assert 13 not in low


def test_decontaminate_spans_excises_only_contaminated_windows(spark):
    """Span decontam removes exactly the tokens covered by eval-gram
    windows and keeps everything else: a train doc quoting an eval
    k-gram loses that span (not the doc), a doc with no eval overlap
    is untouched, and a train-train duplicate span never triggers
    (this is CROSS-corpus, unlike remove_duplicate_spans)."""
    from distributed_vector_database_spark.operators.decontam import (
        decontaminate_spans,
    )

    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # quotes the 5-gram mid-doc: those 5 tokens go
            (1, "intro words the quick brown fox jumps outro words"),
            # shares 4 tokens only (sub-k): survives intact
            (2, "the quick brown fox sleeps all day long"),
            # no overlap at all
            (3, "completely unrelated text about spark plans here"),
            # train-train duplicate of doc 3: must NOT be stripped
            (4, "completely unrelated text about spark plans here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in decontaminate_spans(train, ev, k=5).collect()
    }
    assert got[1]["clean_text"] == "intro words outro words"
    assert got[1]["n_removed_tokens"] == 5
    for d in (2, 3, 4):
        assert got[d]["n_removed_tokens"] == 0, d
        assert got[d]["clean_text"] == train.collect()[d - 1]["text"]

    # overlapping contaminated windows strip the union of their cover
    ev2 = spark.createDataFrame(
        [(0, "a b c d e f")], "doc_id long, text string"
    )
    t2 = spark.createDataFrame(
        [(9, "x a b c d e f y")], "doc_id long, text string"
    )
    r = decontaminate_spans(t2, ev2, k=5).collect()[0]
    assert r["clean_text"] == "x y" and r["n_removed_tokens"] == 6
