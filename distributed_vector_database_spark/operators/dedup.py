"""Deduplication operators for training-data pipelines (SURVEY §2.3).

Five tiers, cheapest to richest; every one is a pure DataFrame plan:

1. exact_dedup          — fingerprint (md5 of normalized text) groupBy
2. ngram_jaccard_pairs  — exact Jaccard over word-shingle sets
3. minhash_lsh_pairs    — MinHash signatures + LSH banding (the scale
                          path: candidates come from an equi-join on
                          band keys, never an all-pairs comparison)
4. simhash_pairs        — 32-bit SimHash + Hamming-distance radius
5. embedding_near_dup   — cosine similarity over the embedding column

The reference's only dedup is first-seen-wins by key at the search
merge (src/coordinator/handler.py:183,201-206) — covered by
`dedup_by_key` here; the rest is the north-star extension surface.

Scale notes: exact/minhash/simhash dedup are each ONE shuffle on a
derived key (fingerprint / band key / simhash prefix) — at 100 TB the
all-pairs variants (ngram_jaccard_pairs, embedding all-pairs) are
correctness oracles for small slices, while LSH banding and bucketed
cosine are the production paths. Representative picking is min-id per
cluster, a plain aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_vector_database_spark.functions.hashing import (
    hamming64,
    minhash_bands,
    minhash_signature,
    simhash,
)
from distributed_vector_database_spark.functions.text import (
    fingerprint,
    tokenize,
    word_shingles,
)
from distributed_vector_database_spark.functions.vector import cosine_similarity


def dedup_by_key(df: DataFrame, key_col: str, order_col: str) -> DataFrame:
    """First-wins dedup by key with a deterministic order (the
    reference's seen_keys guard, src/coordinator/handler.py:201-206,
    made deterministic via an explicit ordering column)."""
    w = Window.partitionBy(key_col).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup via content fingerprint: one row per distinct
    normalized text, keeping the min id as representative and the
    duplicate count. One hash shuffle on the fingerprint."""
    return (
        docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (id_a < id_b, jaccard ≥ t).

    Plan: explode distinct shingles → self-equi-join on shingle (so only
    docs sharing ≥1 shingle ever meet — no cross join) → per-pair
    intersection count → Jaccard from per-doc set sizes. This is the
    exact oracle; minhash_lsh_pairs is its approximation at scale."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(text_col, n)).alias("shingles"),
    )
    sizes = sh.select("id", F.size("shingles").alias("set_size"))
    exploded = sh.select("id", F.explode("shingles").alias("shingle"))
    pairs = (
        exploded.alias("a")
        .join(exploded.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("set_size", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("set_size", "size_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash + LSH banding.

    sig = minhash_signature(shingles); split into `bands` bands of
    num_perm/bands rows; docs sharing any full band collide. The join is
    an equi-join on (band, band_key) — the only shuffle — so cost is
    O(collisions), not O(n²). Returns distinct candidate pairs with the
    fraction of matching signature positions as `sig_match`."""
    rows_per_band = num_perm // bands
    sigd = docs.select(
        F.col(id_col).alias("id"),
        minhash_signature(
            F.array_distinct(word_shingles(text_col, shingle_n)), num_perm
        ).alias("sig"),
    )
    banded = sigd.select(
        "id", "sig", F.explode(minhash_bands("sig", bands, rows_per_band)).alias("bk")
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "band_key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    match_frac = F.round(
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(float(num_perm)),
        6,
    )
    return cand.select("id_a", "id_b", match_frac.alias("sig_match"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs within a Hamming radius.

    Candidate generation uses the standard bit-block trick: split the
    32-bit simhash into (max_hamming+1) blocks; by pigeonhole, any pair
    within the radius shares at least one exact block → equi-join on
    (block_idx, block_value), then exact Hamming verify. One shuffle."""
    nblocks = max_hamming + 1
    block_bits = 32 // nblocks
    sh = docs.select(
        F.col(id_col).alias("id"), simhash(tokenize(text_col)).alias("sh")
    )
    blocks = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("sh"), i * block_bits)
                        .bitwiseAND(F.lit((1 << block_bits) - 1))
                        .alias("blk_val"),
                    )
                    for i in range(nblocks)
                ]
            )
        ).alias("b"),
    ).select("id", "sh", F.col("b.blk").alias("blk"), F.col("b.blk_val").alias("blk_val"))
    return (
        blocks.alias("a")
        .join(blocks.alias("b"), ["blk", "blk_val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ t).

    Exact all-pairs — the small-slice oracle. The production path at
    scale is LSH bucketing (operators/ann.py) feeding the same verify
    expression; keep this as the ground truth."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity("v_a", "v_b"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
