

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


def test_gopher_rules_per_rule_outcomes(spark):
    """Each Gopher rule fires independently on a crafted corpus, the
    composite keep is their conjunction, and degenerate inputs (empty
    text) fail closed."""
    from distributed_vector_database_spark.operators.textops import (
        gopher_rules,
    )

    good = "the quick brown fox jumps over and over with energy " * 6
    rows = [
        (0, good),                                  # passes everything
        (1, "the and with that have be of to"),     # too short
        (2, ("a b c d " * 20) + "the and"),         # mean wordlen < 3
        (3, ("####" + " word" * 60) + " the and"),  # high symbol ratio?
        (4, " ".join(["123"] * 60) + " the and"),   # non-alpha words
        (5, "word " * 60),                          # no stopwords
        (6, ""),                                    # empty: fail closed
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(
        df, min_words=20
    ).collect()}

    assert got[0]["keep"] is True
    assert got[1]["rule_word_count"] is False and got[1]["keep"] is False
    assert got[2]["rule_mean_wordlen"] is False
    assert got[4]["rule_alpha_words"] is False
    assert got[5]["rule_stopwords"] is False and got[5]["keep"] is False
    assert got[6]["keep"] is False
    # symbol ratio: 4 '#' chars over 62 words ≈ 0.065 <= 0.1 passes;
    # tighten the threshold and it fails
    from distributed_vector_database_spark.operators.textops import (
        gopher_rules as gr,
    )

    strict = {r["doc_id"]: r["rule_symbol_ratio"] for r in gr(
        df, min_words=20, max_symbol_ratio=0.01
    ).collect()}
    assert strict[3] is False and strict[0] is True
