"""Benchmark decontamination + cross-corpus overlap over the
`documents` table.

The reference engine has no text-overlap tooling (its only text path is
the CLIP text2vec embed, clip/embedding.py:70-93); these are north-star
LLM-data-pipeline extensions (SURVEY §2.3): before training, remove any
corpus document that shares a token n-gram with an evaluation/benchmark
set — the GPT-3 appendix-C / PaLM 13-gram procedure, with n
parameterized — and report cross-slice n-gram containment so dataset
cards can quantify leakage between sources.

100 TB shape:
- The eval/benchmark side is small by construction (thousands of eval
  documents -> at most a few million distinct gram hashes), so it is
  BROADCAST and the corpus-side scan stays shuffle-free through the
  contamination probe: explode distinct gram hashes -> broadcast
  semi-join. The only shuffles are a groupBy over the *matched* grams
  (bounded by actual contamination, not corpus size) and the final
  id-keyed join/anti-join.
- Join keys are 8-byte gram hashes (functions/text.token_ngram_hashes),
  never gram strings, so shuffle rows stay narrow even for large n.
- `source_overlap` shuffles on gram hash once; fan-out per gram is
  bounded by the number of corpus slices (sources), never by document
  count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.text import (
    ngram_hashes_from_tokens,
    tokenize_strict,
)
from distributed_vector_database_spark.operators.dedup import (
    ensure_parallelism,
)


def _gram_set(df: DataFrame, n: int, text_col: str) -> Column:
    """Distinct-gram-hash array with the tokens STAGED first (the
    no-CSE rule: an inline tokenize re-splits once per gram position,
    O(n²) per document). Usable only right after _stage_tokens."""
    return F.array_distinct(ngram_hashes_from_tokens("__toks", n))


def _stage_tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("__toks", tokenize_strict(text_col))


def _doc_grams(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, g): one row per DISTINCT token-n-gram hash per document.
    The corpus side is the compute-heavy leg (an md5 per gram), so a
    narrow single-file input is spread first (no-op on well-partitioned
    input — see ensure_parallelism)."""
    docs = _stage_tokens(ensure_parallelism(docs, id_col), text_col)
    return docs.select(
        F.col(id_col),
        F.explode(_gram_set(docs, n, text_col)).alias("g"),
    )


def _eval_grams(
    eval_docs: DataFrame, n: int, text_col: str, broadcast_eval: bool
) -> DataFrame:
    """Distinct gram hashes of the eval/benchmark set — the
    contamination probe. Broadcast by default: benchmark suites are
    small by construction. Pass broadcast_eval=False only when the
    'eval' side is itself corpus-scale (then the semi-join shuffles on
    the 8-byte hash, still never on text)."""
    staged = _stage_tokens(eval_docs, text_col)
    ev = (
        staged.select(F.explode(_gram_set(staged, n, text_col)).alias("g"))
        .distinct()
    )
    return F.broadcast(ev) if broadcast_eval else ev


def contamination_report(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document contamination accounting vs an eval set: (id_col,
    n_ngrams, n_overlap, contaminated) where n_overlap counts the
    document's distinct token n-grams that also occur anywhere in
    eval_docs. Every corpus document gets a row (n_overlap = 0 when
    clean), so the output is a drop-in annotation table."""
    hits = (
        _doc_grams(docs, n, id_col, text_col)
        .join(_eval_grams(eval_docs, n, text_col, broadcast_eval), "g", "semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    staged = _stage_tokens(ensure_parallelism(docs, id_col), text_col)
    base = staged.select(
        id_col,
        F.size(_gram_set(staged, n, text_col)).alias("n_ngrams"),
    )
    return (
        base.join(hits, id_col, "left")
        .select(
            id_col,
            "n_ngrams",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        )
        .withColumn("contaminated", F.col("n_overlap") > 0)
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """The pipeline gate: drop every document whose distinct-n-gram
    overlap with eval_docs reaches min_overlap; keep full rows
    otherwise. min_overlap=1 is the strict GPT-3-style rule; raise it
    to tolerate incidental single-gram collisions in small-vocabulary
    corpora."""
    if min_overlap < 1:
        raise ValueError("min_overlap must be >= 1")
    grams = _doc_grams(docs, n, id_col, text_col).join(
        _eval_grams(eval_docs, n, text_col, broadcast_eval), "g", "semi"
    )
    if min_overlap == 1:
        bad = grams.select(id_col).distinct()
    else:
        bad = (
            grams.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_overlap"))
            .filter(F.col("n_overlap") >= min_overlap)
            .select(id_col)
        )
    return docs.join(bad, id_col, "left_anti")


def decontaminate_spans(
    docs: DataFrame,
    eval_docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """SPAN-level decontamination: remove from each training document
    exactly the k-token windows whose gram also occurs anywhere in the
    eval corpus, keeping the rest of the document — the surgical
    variant of `decontaminate`'s whole-doc drop (the procedure the
    published pipelines apply when dropping whole documents would cost
    too much data: excise the contaminated span, keep the document).

    Mechanics are the ExactSubstr span machinery pointed across
    corpora: strict k-token windows -> md5 grams (the ONE shared gram
    expression, operators/dedup._window_grams, so this op can never
    hash-drift from remove_duplicate_spans) -> flag train windows
    whose gram hits the eval gram set -> drop every token covered by
    a flagged window (dedup._strip_flagged). Returns
    (id_col, clean_text, n_removed_tokens); clean_text is rebuilt
    from the tokenizer's lowercased tokens, same contract as
    remove_duplicate_spans.

    100 TB: the eval side is small by construction — its distinct
    gram set BROADCASTS, so the corpus-sized pass is one scan +
    map-side semi join; the only shuffles are the per-doc flagged
    aggregation (bounded by contaminated mass) and the final id join.
    A corpus-sized eval side (broadcast_eval=False) degrades to one
    gram-keyed shuffle, the remove_duplicate_spans cost shape."""
    from distributed_vector_database_spark.operators.dedup import (
        _strip_flagged,
        _window_grams,
    )

    eval_grams = (
        _window_grams(
            eval_docs.select(F.col(eval_text_col).alias("text")),
            k,
            None,
            "text",
        )
        .select("gram")
        .distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    flagged = (
        _window_grams(docs, k, id_col, text_col)
        .join(eval_grams, "gram", "left_semi")
        .select(id_col, "pos")
    )
    return _strip_flagged(docs, flagged, k, id_col, text_col)


def source_overlap_sketch(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    group_col: str = "source",
    lg_k: int = 14,
) -> DataFrame:
    """Sketch estimate of source_overlap for when even the distinct
    (slice, gram) table is too big to self-join: ONE corpus scan folds
    each slice's grams into a Datasketches HLL (hll_sketch_agg,
    associative/mergeable map-side), then the |slices|-row result
    cross-pairs driver-free and estimates
    |A ∩ B| = max(|A| + |B| - |A ∪ B|, 0) via hll_union —
    inclusion-exclusion over three sketch estimates.

    Shuffle is |slices| sketch blobs (~2^lg_k bytes each), independent
    of corpus size. Estimates inherit HLL error (~1.6%/sqrt(2^lg_k),
    ~1.3% at lg_k=14) AND the subtraction amplifies it for
    small intersections — treat containment near 0 as 'disjoint-ish',
    and use the exact source_overlap when slices fit a gram join."""
    staged = _stage_tokens(ensure_parallelism(docs, text_col), text_col)
    sketches = (
        staged.select(
            F.col(group_col).alias("grp"),
            F.explode(_gram_set(staged, n, text_col)).alias("g"),
        )
        .groupBy("grp")
        .agg(F.hll_sketch_agg("g", F.lit(lg_k)).alias("sk"))
    )
    a = sketches.select(
        F.col("grp").alias("source_a"), F.col("sk").alias("__ska")
    )
    b = sketches.select(
        F.col("grp").alias("source_b"), F.col("sk").alias("__skb")
    )
    est_a = F.hll_sketch_estimate("__ska")
    est_b = F.hll_sketch_estimate("__skb")
    est_union = F.hll_sketch_estimate(F.hll_union("__ska", "__skb"))
    inter = F.greatest(est_a + est_b - est_union, F.lit(0))
    return a.crossJoin(b).select(
        "source_a",
        "source_b",
        inter.cast("long").alias("n_shared_est"),
        F.round(inter / est_a.cast("double"), 6).alias("containment_est"),
    )


def source_overlap(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Cross-slice n-gram containment matrix: for every ordered pair of
    corpus slices (source_a, source_b), the fraction of source_a's
    distinct token n-grams that also occur in source_b —
    containment(a, b) = |grams(a) ∩ grams(b)| / |grams(a)|. The
    diagonal is 1.0 by construction (kept as a sanity anchor). Output
    is |slices|² rows regardless of corpus size."""
    staged = _stage_tokens(ensure_parallelism(docs, text_col), text_col)
    grams = staged.select(
        F.col(group_col).alias("grp"),
        F.explode(_gram_set(staged, n, text_col)).alias("g"),
    ).distinct()
    # the distinct (slice, gram) table feeds THREE consumers (both
    # self-join sides + the totals agg); without staging, Catalyst
    # replans the scan+explode+distinct subtree into each one — 20
    # exchanges measured. Materialize it once (at 100 TB this is a
    # warehouse write; locally an eager checkpoint) and the plan drops
    # to the self-join's own shuffles.
    grams = grams.localCheckpoint(eager=True)
    totals = grams.groupBy("grp").agg(F.count(F.lit(1)).alias("n_grams"))
    shared = (
        grams.alias("a")
        .join(grams.alias("b"), "g")
        .groupBy(
            F.col("a.grp").alias("source_a"), F.col("b.grp").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return shared.join(
        F.broadcast(totals.withColumnRenamed("grp", "source_a")), "source_a"
    ).select(
        "source_a",
        "source_b",
        "n_shared",
        F.round(
            F.col("n_shared") / F.col("n_grams").cast("double"), 6
        ).alias("containment"),
    )


def semantic_decontam(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "eval_id",
) -> DataFrame:
    """SEMANTIC decontamination: flag corpus items whose embedding is
    within cosine `threshold` of ANY eval/benchmark item — the
    embedding-space complement of the n-gram procedures above, which
    miss paraphrased or translated eval leakage entirely (the
    n-gram-decontaminated-but-semantically-contaminated gap documented
    by Yang et al. 2023, "Rethinking Benchmark and Contamination").

    Returns (id_col, eval_id_col, cosine) — one row per flagged corpus
    item with its BEST-matching eval item (ties to the smaller eval
    id), cosine rounded 6dp. Anti-join the ids against the corpus to
    clean it, mirroring `decontaminate`.

    100 TB shape: the eval side is small by construction and
    BROADCASTS (same standing as the gram broadcast above); the corpus
    scans once with no shuffle — cosine per (row × eval) is a codegen
    zip_with/aggregate fold, the per-item argmax is a partial-agg-able
    max_by-style window confined to the flagged rows. Corpus-side cost
    is n_eval cosines per row; for eval sets past ~10⁴ switch the
    inner product to the blocked-GEMM kernel family (maxsim_join's
    shape) — the contract here stays the declarative, oracle-exact
    path."""
    from pyspark.sql.window import Window

    from distributed_vector_database_spark.functions.vector import (
        cosine_similarity,
    )

    ev = eval_emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias(eval_id_col), F.col(vec_col).alias("__ev")
    )
    corp = corpus_emb.filter(F.col(vec_col).isNotNull()).select(
        id_col, vec_col
    )
    scored = corp.join(F.broadcast(ev)).select(
        id_col,
        eval_id_col,
        F.round(
            cosine_similarity(F.col(vec_col), F.col("__ev")), 6
        ).alias("cosine"),
    )
    flagged = scored.filter(F.col("cosine") >= float(threshold))
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine").desc(), F.col(eval_id_col).asc()
    )
    return (
        flagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy(id_col)
    )
