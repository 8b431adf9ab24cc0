

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
