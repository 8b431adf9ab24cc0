"""Hash/shard/sketch + text expression semantics."""

import hashlib

from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.hashing import (
    MINHASH_PERMS,
    MINHASH_PRIME,
    hamming64,
    hash32,
    minhash_signature,
    shard_id,
    simhash,
)
from distributed_vector_database_spark.functions.text import (
    detect_lang,
    fingerprint,
    quality_score,
    token_count,
    tokenize,
    word_shingles,
)


def _vals(spark, data, col):
    df = spark.createDataFrame([(d,) for d in data], "key string")
    return [r[0] for r in df.select(col).collect()]


def test_shard_id_matches_reference_formula(spark):
    # int(md5(key),16) % 4, exactly (src/utils/shared_utils.py:4-7)
    keys = ["0", "42", "hello", "vec-123", "☃"]
    got = _vals(spark, keys, shard_id("key", 4))
    want = [int(hashlib.md5(k.encode()).hexdigest(), 16) % 4 for k in keys]
    assert got == want


def test_shard_id_non_power_of_two(spark):
    keys = ["a", "b", "c"]
    got = _vals(spark, keys, shard_id("key", 7))
    want = [int(hashlib.md5(k.encode()).hexdigest(), 16) % 7 for k in keys]
    assert got == want


def test_hash32_matches_md5_prefix(spark):
    got = _vals(spark, ["x"], hash32("key"))
    assert got == [int(hashlib.md5(b"x").hexdigest()[:8], 16)]


def test_minhash_signature_matches_python(spark):
    shingles = ["a b c", "b c d", "c d e"]
    df = spark.createDataFrame([(shingles,)], "sh array<string>")
    got = df.select(minhash_signature("sh", 4).alias("sig")).first()["sig"]
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in shingles]
    want = [
        min((a * h + b) % MINHASH_PRIME for h in hs) for a, b in MINHASH_PERMS[:4]
    ]
    assert got == want


def test_simhash_identical_inputs_equal(spark):
    df = spark.createDataFrame(
        [(["spark", "fast", "engine"],), (["spark", "fast", "engine"],)],
        "t array<string>",
    )
    a, b = [r[0] for r in df.select(simhash("t").alias("s")).collect()]
    assert a == b


def test_hamming64(spark):
    df = spark.range(1).select(
        hamming64(F.lit(0b1011).cast("long"), F.lit(0b0010).cast("long")).alias("h")
    )
    assert df.first()["h"] == 2


def test_tokenize_and_count(spark):
    df = spark.createDataFrame([("  The quick  brown Fox ",)], "text string")
    toks = df.select(tokenize("text").alias("t")).first()["t"]
    assert toks == ["the", "quick", "brown", "fox"]
    assert df.select(token_count("text").alias("n")).first()["n"] == 4


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([("one two",)], "text string")
    assert df.select(word_shingles("text", 3).alias("s")).first()["s"] == ["one two"]


def test_word_shingles_n3(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    assert df.select(word_shingles("text", 3).alias("s")).first()["s"] == [
        "a b c",
        "b c d",
    ]


def test_fingerprint_normalizes_whitespace_case(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",)], "text string"
    )
    fps = [r[0] for r in df.select(fingerprint("text")).collect()]
    assert fps[0] == fps[1]


def test_detect_lang(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog went to the park",),
            ("el perro y la casa de la playa que bonita",),
            ("zzz qqq xxx",),
        ],
        "text string",
    )
    langs = [r[0] for r in df.select(detect_lang("text")).collect()]
    assert langs == ["en", "es", "und"]


def test_quality_score_bounds(tables):
    rows = tables["documents"].select(quality_score("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def _fps(spark, texts, k=5, window=4):
    from distributed_vector_database_spark.operators.textops import doc_fingerprints

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {}
    for r in doc_fingerprints(df, k=k, window=window).collect():
        out.setdefault(r["id"], set()).add(r["fp"])
    return out


def test_winnow_identical_docs_share_all_fingerprints(spark):
    t = "the quick brown fox jumps over the lazy dog"
    fps = _fps(spark, [t, t])
    assert fps[0] and fps[0] == fps[1]


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing guarantee: a shared substring of length >= window+k-1
    (here 8) produces at least one shared fingerprint, while disjoint
    texts share none."""
    shared = "unmistakable common fragment of text"
    a = "left document prefix " + shared + " and a left suffix"
    b = "totally different beginning " + shared + " other ending here"
    c = "zq wv xj kp fh unrelated material entirely elsewhere"
    fps = _fps(spark, [a, b, c])
    assert fps[0] & fps[1], "shared substring must yield a shared fingerprint"
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])


def test_winnow_short_text_yields_no_rows(spark):
    fps = _fps(spark, ["abc"])  # shorter than k=5 after normalization
    assert fps == {}


def test_winnow_density(spark):
    """Fingerprint count tracks ~2/(window+1) per char — winnowing
    samples the hash sequence, it does not keep every k-gram."""
    t = " ".join(f"token{i}" for i in range(200))
    fps = _fps(spark, [t])
    n_chars = len(" ".join(f"token{i}" for i in range(200)))
    assert 0 < len(fps[0]) < n_chars // 2
