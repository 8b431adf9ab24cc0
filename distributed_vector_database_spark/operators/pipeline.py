"""The north-star composition: an end-to-end LLM training-data pipeline
as one declarative DataFrame plan (SURVEY §2.3 — all four extension
families chained):

    documents
      → quality gate            (textops.quality_score ≥ threshold)
      → exact dedup             (keep min doc_id per fingerprint)
      → near-dup cluster pick   (MinHash LSH pairs → connected
                                 components → keep min-id reps)
      → sequence packing        (per-language token-budget bins)

Every stage is itself oracle-matched; the composition is too (the
DuckDB oracle chains the same fragments). This is the query a data
engineer actually runs at 100 TB — the stages share one scan of the
corpus up to the sketch shuffle, and nothing here is driver-side
except the label-propagation convergence loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.text import fingerprint, quality_score
from distributed_vector_database_spark.operators.dedup import (
    dedup_clusters,
    minhash_lsh_pairs,
)
from distributed_vector_database_spark.operators.textops import pack_documents


def training_pipeline(
    docs: DataFrame,
    min_quality: float = 0.5,
    token_budget: int = 512,
) -> DataFrame:
    """Returns the surviving documents with their training-bin
    assignment: (doc_id, lang, n_tokens, bin_id)."""
    # 1. quality gate
    gated = docs.filter(quality_score("text") >= min_quality)

    # 2. exact dedup: keep the min doc_id per normalized-content
    #    fingerprint. r14 (guide §2.3/§2.4): min_by on the full row in
    #    ONE fp-keyed aggregate replaces the old min-id-per-fp aggregate
    #    + semi join back — which scanned the gated corpus TWICE
    #    (evaluating the quality gate twice) and paid a second exchange.
    #    doc_id is unique, so argmin-by-doc_id per fp selects exactly
    #    the rows the semi join kept; partial aggregation keeps at most
    #    one row per fp per map partition before the shuffle.
    exact_unique = (
        gated.groupBy(fingerprint("text").alias("__fp"))
        .agg(F.min_by(F.struct(*gated.columns), "doc_id").alias("__r"))
        .select("__r.*")
    )
    # cached: the survivors' subtree feeds the sketch, the cluster ids,
    # AND the final semi-join — without this it re-executes per consumer
    exact_unique = exact_unique.cache()

    # 3. near-dup removal: MinHash-LSH candidates over the survivors,
    #    connected components, keep only cluster representatives
    pairs = minhash_lsh_pairs(exact_unique)
    clusters = dedup_clusters(
        exact_unique.select(F.col("doc_id").alias("id")), pairs
    )
    # keepers is tiny (one id column) but its lineage embeds the whole
    # sketch + CC-loop plan; localCheckpoint cuts that out of the final
    # composed plan (~210 exchanges -> a handful), so plan compile time
    # and driver memory stay flat as the composition grows
    keepers = (
        clusters.filter(F.col("id") == F.col("rep_id"))
        .select(F.col("id").alias("doc_id"))
        .localCheckpoint()
    )
    survivors = exact_unique.join(keepers, "doc_id", "left_semi")

    # 4. pack into fixed token budgets per language
    return pack_documents(survivors, token_budget=token_budget).select(
        "doc_id", "lang", "n_tokens", "bin_id"
    )


def training_pipeline_spans(
    docs: DataFrame,
    min_quality: float = 0.5,
    k: int = 8,
    alpha: float = 0.5,
    token_budget: int = 512,
) -> DataFrame:
    """The round-6 composition: the sub-document / mixture half of the
    pipeline story —

        documents
          → quality gate           (textops.quality_score ≥ threshold)
          → duplicate-SPAN removal (ExactSubstr at k tokens: repeated
                                    boilerplate stripped, docs survive)
          → temperature mixing     (share^alpha per language, rates
                                    derived from the cleaned corpus)
          → sequence packing       (per-language bins over the CLEANED
                                    token counts)

    Differs from training_pipeline in kind, not just stages: that one
    drops whole documents; this one rewrites their contents and then
    re-derives every downstream statistic (mixture rates, packing
    budgets) from the rewritten text — the order a real pretraining
    pipeline needs, because packing on pre-dedup token counts
    overstates bins wherever boilerplate was stripped. One gram
    shuffle + one tiny rate aggregate on top of the packing windows;
    fully oracle-matched."""
    from distributed_vector_database_spark.operators.dedup import (
        remove_duplicate_spans,
    )
    from distributed_vector_database_spark.operators.sampling import (
        temperature_sample,
    )

    gated = docs.filter(quality_score("text") >= min_quality)
    cleaned = (
        remove_duplicate_spans(gated, k=k)
        .join(gated.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", F.col("clean_text").alias("text"))
    )
    sampled = temperature_sample(cleaned, "lang", "doc_id", alpha=alpha)
    return pack_documents(sampled, token_budget=token_budget).select(
        "doc_id", "lang", "n_tokens", "bin_id"
    )


def training_pipeline_audited(
    docs: DataFrame,
    min_quality: float = 0.5,
    token_budget: int = 512,
):
    """training_pipeline plus in-plan stage accounting: returns
    (packed_df, observations) where observations maps stage name ->
    pyspark Observation. After ONE action on the result, each
    observation yields its stage's row count — Spark's observe() rides
    the existing plan (metrics accumulate during the normal pass), so
    the audit costs zero extra scans and zero extra shuffles. At
    100 TB "how many documents did each gate drop" must come from the
    run itself, not from re-counting four intermediate tables."""
    from pyspark.sql import Observation

    obs = {
        "input": Observation("input"),
        "quality": Observation("quality"),
        "exact": Observation("exact"),
        "packed": Observation("packed"),
    }
    gated = docs.observe(obs["input"], F.count(F.lit(1)).alias("rows")).filter(
        quality_score("text") >= min_quality
    )
    gated = gated.observe(obs["quality"], F.count(F.lit(1)).alias("rows"))
    reps = (
        gated.select(F.col("doc_id"), fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact_unique = gated.join(reps, "doc_id", "left_semi").observe(
        obs["exact"], F.count(F.lit(1)).alias("rows")
    )
    packed = pack_documents(exact_unique, token_budget=token_budget).select(
        "doc_id", "lang", "n_tokens", "bin_id"
    )
    return packed.observe(obs["packed"], F.count(F.lit(1)).alias("rows")), obs
