"""Real BPE: deterministic training on the word-frequency table,
memoized distributed encode."""

from distributed_vector_database_spark.functions.bpe import (
    END,
    bpe_encode,
    encode_word,
    train_bpe,
)

DOCS = "doc_id long, text string"


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "low low low low low"),
            (2, "lower lower newest newest"),
            (3, "newest newest newest newest"),
            (4, "widest widest widest"),
        ],
        DOCS,
    )


def test_train_learns_frequent_pairs(spark):
    merges = train_bpe(_corpus(spark), num_merges=10)
    # 'newest' (x6) dominates: its pairs should be merged early, and
    # training is deterministic -> retraining gives identical rules
    assert merges == train_bpe(_corpus(spark), num_merges=10)
    assert ("e", "s") in merges or ("es", "t" + END) in merges or ("s", "t" + END) in merges
    flat = ["".join(p) for p in merges]
    assert any("est" in m for m in flat)


def test_encode_word_applies_rank_order():
    ranks = {("l", "o"): 0, ("lo", "w" + END): 1}
    assert encode_word("low", ranks) == ["low" + END]
    # unknown word falls back to characters
    assert encode_word("xyz", ranks) == ["x", "y", "z" + END]


def test_bpe_encode_roundtrip(spark):
    docs = _corpus(spark)
    merges = train_bpe(docs, num_merges=50)
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    # with enough merges every training word collapses to one token
    assert out[1]["bpe_tokens"] == ["low" + END] * 5
    assert out[1]["n_bpe"] == 5
    # detokenization invariant: concatenating pieces reconstructs the
    # lowercased words for every doc
    for r in out.values():
        words = "".join(r["bpe_tokens"]).replace(END, " ").split()
        doc_id = r["doc_id"]
        orig = [w for w in dict((x["doc_id"], x["text"]) for x in docs.collect())[doc_id].lower().split()]
        assert words == orig


def test_bpe_encode_partition_invariant(spark):
    docs = _corpus(spark)
    merges = train_bpe(docs, num_merges=20)
    one = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(docs.coalesce(1), merges).collect()}
    many = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(docs.repartition(8), merges).collect()}
    assert one == many
