

def test_length_grouped_batches_minimizes_padding(spark):
    """Similar lengths share batches: short docs and long docs never
    mix, the remainder batch is short, and total pad_waste is strictly
    below the everything-padded-to-global-max worst case."""
    from distributed_vector_database_spark.operators.textops import (
        length_grouped_batches,
    )

    docs = spark.createDataFrame(
        [(i, "w " * (3 if i < 6 else 50)) for i in range(10)],
        "doc_id long, text string",
    )
    rows = length_grouped_batches(docs, batch_size=4).collect()
    assert [r["batch_id"] for r in rows] == [0, 1, 2]
    assert [r["n_docs"] for r in rows] == [4, 4, 2]
    # batch 0 all-short; batch 2 all-long; only batch 1 mixes (the cut)
    assert rows[0]["max_tokens"] == 3 and rows[0]["pad_waste"] == 0
    assert rows[2]["max_tokens"] == 50 and rows[2]["pad_waste"] == 0
    assert rows[0]["members"] == [0, 1, 2, 3]
    total_waste = sum(r["pad_waste"] for r in rows)
    worst = 10 * 50 - (6 * 3 + 4 * 50)  # everything padded to 50
    assert total_waste < worst

    with __import__("pytest").raises(ValueError):
        length_grouped_batches(docs, batch_size=0)


def test_topic_keywords_discriminative_terms_win(spark):
    """A term concentrated in one topic outranks corpus-wide terms
    there; terms from other topics never leak in; ranks are dense."""
    from distributed_vector_database_spark.operators.textops import (
        topic_keywords,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle partition common"),
            (2, "spark shuffle exchange common"),
            (3, "tennis racket court common"),
            (4, "tennis serve court common"),
        ],
        "doc_id long, text string",
    )
    assign = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "doc_id long, topic int"
    )
    rows = topic_keywords(docs, assign, n_terms=3).collect()
    by_topic = {}
    for r in rows:
        by_topic.setdefault(r["topic"], []).append(r["term"])
    # 'common' appears in both topics -> idf-dampened below the
    # equal-tf exclusive terms (ln(1+2/2) < ln(1+2/1)), never rank 1
    assert by_topic[0][:2] == ["shuffle", "spark"]
    assert by_topic[0][2] == "common"  # beats tf=1 exclusives, trails tf=2
    assert by_topic[1][0] in ("court", "tennis")
    assert "tennis" not in by_topic[0] and "spark" not in by_topic[1]
    assert [r["rank"] for r in rows if r["topic"] == 0] == [1, 2, 3]
