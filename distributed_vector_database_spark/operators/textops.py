"""Document-level text analysis over the `documents` table — the
training-data-pipeline operators (SURVEY §2.3): per-doc stats, quality
scoring, language ID, fingerprints, per-language aggregates.

Everything compiles to one codegen'd scan + (for the aggregates) one
hash shuffle — the 100 TB shape of 'annotate every document, then
summarize by language'.
"""

from __future__ import annotations

from distributed_vector_database_spark.functions.localrel import local_df
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.text import (
    bpe_ish_token_count,
    detect_lang,
    fingerprint,
    punct_ratio,
    quality_score,
    token_count,
    tokenize,
)


def doc_stats(docs: DataFrame) -> DataFrame:
    """Per-document annotation: token counts, punctuation ratio, quality
    score, detected language, fingerprint. The map-side pass every
    downstream pipeline filter keys on."""
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_tokens"),
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        quality_score("text").alias("quality"),
        detect_lang("text").alias("detected_lang"),
        fingerprint("text").alias("fp"),
    )


def lang_profile(docs: DataFrame) -> DataFrame:
    """Per-language corpus profile: doc count, token mass, mean quality
    — the dataset-card numbers. groupBy benefits from partial agg."""
    return (
        doc_stats(docs)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


def quality_filter(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """The pipeline gate: keep documents above a quality floor."""
    return docs.filter(quality_score("text") >= min_quality)


def collapse_repetitions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The cleaning counterpart to repetition_scores: collapse each run
    of consecutive identical tokens to one occurrence and report how
    many tokens were dropped. Zero-shuffle codegen'd map pass (tokens
    staged once; see collapse_runs_from_tokens' no-CSE note)."""
    from distributed_vector_database_spark.functions.text import (
        collapse_runs_from_tokens,
        tokenize,
    )

    staged = docs.withColumn("__toks", tokenize(text_col)).withColumn(
        "__kept", collapse_runs_from_tokens("__toks")
    )
    return staged.select(
        id_col,
        F.concat_ws(" ", F.col("__kept")).alias("clean_text"),
        (F.size("__toks") - F.size("__kept")).cast("int").alias("n_collapsed"),
    )


def repetition_scores(docs: DataFrame, n: int = 3) -> DataFrame:
    """Gopher-style repetition signal: the fraction of a document's
    word n-grams taken by its single most frequent n-gram (1.0 = the
    doc is one phrase repeated). Plan: explode shingles → per-(doc,
    shingle) counts → per-doc max/total — two partial-agg shuffles,
    linear in corpus size."""
    from distributed_vector_database_spark.functions.text import (
        shingles_from_tokens,
        tokenize,
    )

    sh = docs.withColumn("__toks", tokenize("text")).select(
        F.col("doc_id"),
        F.explode(shingles_from_tokens("__toks", n)).alias("s"),
    )
    counts = sh.groupBy("doc_id", "s").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.max("c").alias("max_rep"),
            F.sum("c").alias("n_shingles"),
        )
        .select(
            "doc_id",
            F.col("max_rep").cast("long").alias("max_rep"),
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.round(F.col("max_rep") / F.col("n_shingles"), 6).alias("rep_ratio"),
        )
    )


def pack_documents(
    docs: DataFrame,
    token_budget: int = 512,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins: within each
    stratum (deterministic doc order), bin_id = floor(running token
    count BEFORE this doc / budget) — cumulative-sum packing, the
    standard approximation of sequence packing that stays a pure window
    expression (no sequential state).

    Scale shape: one window per stratum partition — parallel across
    strata, never a global single-partition sort. Returns
    (id, stratum, n_tokens, bin_id, bin_offset)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_tokens = docs.select(
        F.col(id_col),
        F.col(stratum_col),
        token_count("text").alias("n_tokens"),
    )
    cum = with_tokens.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    prev = (F.col("cum_tokens") - F.col("n_tokens")).cast("long")
    return cum.select(
        id_col,
        stratum_col,
        "n_tokens",
        F.floor(prev / token_budget).cast("long").alias("bin_id"),
        (prev % token_budget).cast("long").alias("bin_offset"),
    )


def doc_fingerprints(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprints per document, exploded to
    (id, fp) rows — the rolling-hash document-fingerprinting tier
    (MOSS; see functions.text.winnow_from_grams). Overlap/containment
    detection is then a plain equi-join on fp: candidate pairs share a
    bucket, never an all-pairs scan.

    Two staged projections so the O(len) k-gram hash pass runs once
    per document (Catalyst does not CSE subexpressions across lambda
    bodies)."""
    from distributed_vector_database_spark.functions.text import (
        kgram_hashes_from_norm,
        normalize_text,
        winnow_from_grams,
    )

    staged = docs.withColumn("__norm", normalize_text(text_col)).select(
        F.col(id_col).alias("id"),
        kgram_hashes_from_norm("__norm", k).alias("__grams"),
    )
    # no orderBy: the whole operator is scan → project → explode, zero
    # shuffles (asserted in tests/test_plans.py) — a global sort here
    # would be the only exchange and buys nothing
    return staged.select(
        "id", F.explode(winnow_from_grams("__grams", window)).alias("fp")
    )


PII_PATTERNS: list[tuple[str, str]] = [
    # order matters: emails contain digit runs, so scrub them first
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def redact_pii(
    docs: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Scrub email / IPv4 / phone-shaped spans from a text column —
    the standard pre-training privacy pass. Pure chained regexp_replace
    (Catalyst, codegen'd), so a 100 TB corpus pass is a single
    map-side scan with zero shuffles and no Python workers; the regexes
    are ANSI-SQL-portable for the oracle gate."""
    col = F.col(text_col)
    for pat, token in PII_PATTERNS:
        col = F.regexp_replace(col, pat, token)
    return docs.withColumn(out_col, col)


def top_terms(
    docs: DataFrame,
    n: int = 20,
    text_col: str = "text",
    min_len: int = 1,
) -> DataFrame:
    """Corpus vocabulary head: the n most frequent tokens with term and
    document frequency — the dataset-card table and the input to
    stopword-list induction.

    Shape at scale: explode -> hash-aggregate benefits from map-side
    partial aggregation (term cardinality << token count), then the
    global top-n is a TakeOrderedAndProject. One shuffle keyed on term,
    sized by vocabulary, not corpus."""
    toks = docs.select(
        F.col("doc_id"), F.explode(tokenize(text_col)).alias("term")
    ).filter(F.length("term") >= min_len)
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), "term")
        .limit(n)
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-budget chunks — the
    RAG-ingest / pretraining-prep counterpart of pack_documents (which
    concatenates SHORT docs up to a budget; this splits LONG ones).

    Output: (doc_id, chunk_id, chunk_text, n_tokens) with stride
    chunk_tokens - overlap; the final chunk is the possibly-short
    remainder, and a document shorter than one budget yields exactly
    one chunk. All array expressions (sequence + posexplode + slice) —
    zero shuffles, codegen'd end to end, embarrassingly parallel at
    any corpus size."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = docs.select(
        F.col(id_col), tokenize(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    # number of chunks = 1 + ceil(max(n - chunk, 0) / stride)
    n_chunks = 1 + F.ceil(
        F.greatest(F.col("__n") - chunk_tokens, F.lit(0)) / F.lit(stride)
    ).cast("int")
    return (
        toks.select(
            id_col,
            "__toks",
            "__n",
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
                "chunk_id", "__start_idx"
            ),
        )
        .select(
            id_col,
            "chunk_id",
            F.slice(
                "__toks", F.col("__start_idx") * stride + 1, chunk_tokens
            ).alias("__chunk_toks"),
        )
        .select(
            id_col,
            "chunk_id",
            F.concat_ws(" ", "__chunk_toks").alias("chunk_text"),
            F.size("__chunk_toks").alias("n_tokens"),
        )
    )


def model_quality_scores(
    docs: DataFrame,
    weights: dict[str, float],
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Model-based quality scoring: sigmoid(w · features + b) over
    in-plan document features — the fasttext-classifier-shaped gate
    (quality filtering by a TRAINED linear model rather than the fixed
    heuristic), with the model living entirely in the plan as
    literals: no model server, no UDF, no per-executor state. Swap the
    weight dict for coefficients from any trainer (MLlib logistic
    regression fits the same feature vector).

    Features (each mirrorable in SQL, so a scored corpus is
    hash-verifiable): n_tokens, punct_ratio, quality (the heuristic),
    mean_token_len. Zero shuffles — one codegen'd map pass."""
    from distributed_vector_database_spark.functions.text import (
        punct_ratio,
        quality_score,
        tokenize,
    )

    staged = docs.withColumn("__toks", tokenize(text_col))
    n = F.size("__toks").cast("double")
    feats = {
        "n_tokens": n,
        "punct_ratio": punct_ratio(text_col),
        "quality": quality_score(text_col),
        "mean_token_len": F.when(n == 0, 0.0).otherwise(
            F.aggregate(
                F.col("__toks"), F.lit(0).cast("long"), lambda a, t: a + F.length(t)
            ).cast("double")
            / n
        ),
    }
    unknown = set(weights) - set(feats)
    if unknown:
        raise ValueError(f"unknown features: {sorted(unknown)}")
    z = F.lit(float(bias))
    for name, w in weights.items():
        z = z + F.lit(float(w)) * feats[name]
    return staged.select(
        id_col, F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("model_score")
    )


def materialize_bins(
    docs: DataFrame,
    token_budget: int = 512,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    eos: str = "</s>",
) -> DataFrame:
    """Turn pack_documents' bin ASSIGNMENTS into the actual training
    sequences: one row per (stratum, bin) with the member documents'
    lowercased tokens concatenated in pack order, EOS-joined — the
    artifact a dataloader memory-maps. Output: (stratum, bin_id,
    packed_text, n_docs, n_tokens).

    Plan: the packing windows (parallel per stratum) + ONE groupBy on
    (stratum, bin) whose groups are bounded by the token budget —
    collect order pinned by (bin_offset, id), so the sequence is
    deterministic, not collect_list-arbitrary."""
    assigned = pack_documents(docs, token_budget, stratum_col, id_col)
    joined = assigned.join(
        docs.select(id_col, F.concat_ws(" ", tokenize("text")).alias("__norm")),
        id_col,
    )
    return (
        joined.groupBy(stratum_col, "bin_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("bin_offset", id_col, "__norm"))
            ).alias("__members"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(
            stratum_col,
            "bin_id",
            F.concat_ws(
                f" {eos} ", F.transform("__members", lambda m: m["__norm"])
            ).alias("packed_text"),
            "n_docs",
            "n_tokens",
        )
    )


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, __toks) staged token arrays — tokenize exactly once per the
    no-CSE-across-lambdas rule."""
    from distributed_vector_database_spark.functions.text import tokenize_strict

    return docs.select(id_col, tokenize_strict(text_col).alias("__toks"))


def _bigrams_from_tokens(toks: DataFrame, id_col: str) -> DataFrame:
    """(id, w1, w2) adjacent-token pairs from a staged token frame;
    docs with < 2 tokens emit nothing."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - 1),
        lambda i: F.struct(
            F.element_at("__toks", i).alias("w1"),
            F.element_at("__toks", i + F.lit(1)).alias("w2"),
        ),
    )
    return (
        toks.filter(F.size("__toks") >= 2)
        .select(id_col, F.explode(pairs).alias("__bg"))
        .select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    )


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return _bigrams_from_tokens(_doc_tokens(docs, text_col, id_col), id_col)


def bigram_lm_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train a bigram language model from the corpus: returns
    (unigram counts [w, c1], bigram counts [w1, w2, c2], and a 1-row
    vocab frame [vocab_size]). The whole train pass is two token-scale
    partial-agg shuffles (unigrams, bigrams) — the KenLM-count shape
    without the native dep; counts tables are Zipf-bounded (vocabulary-
    sized, not corpus-sized), so at 100 TB they broadcast or bucket
    cheaply while the corpus is scanned once."""
    from distributed_vector_database_spark.functions.text import tokenize_strict

    toks = docs.select(tokenize_strict(text_col).alias("__toks"))
    uni = (
        toks.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = (
        _doc_bigrams(docs, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("vocab_size"))
    return uni, bi, vocab


def lm_cross_entropy(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    vocab: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram cross-entropy under an add-k-smoothed LM —
    the CCNet-style perplexity quality signal (Wenzek et al. 2020):
    score each doc by -avg ln p(w_i | w_{i-1}) with
    p = (c(w1,w2) + k) / (c(w1) + k*V). Low cross-entropy = fluent
    under the corpus LM; high = noise/outlier text (the tail a quality
    gate drops). Estimator note: the context count is the TOTAL
    unigram count of w1 (including doc-final occurrences) — the
    smoothing absorbs the off-by-boundary mass and the oracle mirrors
    the same estimator exactly, keeping scores hash-verifiable.

    Plan: explode doc bigrams once, two equi-joins against the
    vocabulary-sized count tables (broadcast when small — Catalyst/AQE
    decide), one per-doc agg. Docs with < 2 tokens emit no row."""
    pairs = _doc_bigrams(docs, text_col, id_col)
    joined = (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(uni.withColumnRenamed("w", "w1"), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    logp = F.log(
        (F.coalesce("c2", F.lit(0)) + F.lit(k))
        / (F.coalesce("c1", F.lit(0)) + F.lit(k) * F.col("vocab_size"))
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.avg(logp)).alias("cross_entropy"),
    ).withColumn("perplexity", F.exp("cross_entropy"))


def lm_perplexity_scores(
    docs: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train + score in one call with STAGED TOKENS: the corpus is
    tokenized exactly once and materialized (eager localCheckpoint);
    the unigram counts, bigram counts, vocab size, and the scoring
    bigram stream are all derived from that one token frame inside a
    SINGLE job, so Spark shares the materialized tokens across the
    four subtrees instead of re-running the tokenize+scan per
    consumer. (The r7 shape checkpointed the two COUNT tables instead:
    that serialized two blocking corpus-tokenizing jobs before a third
    tokenize in the score leg — 3 tokenize passes and ~1 s of
    materialization barriers at sf0.1; token staging measured 0.81 s
    vs 1.96 s, BENCH_BASELINE drift note in SCALE.md.) At 100 TB the
    token frame is corpus-scale: localCheckpoint spills it to
    executor-local disk like a shuffle write — one extra write of the
    token column buys back two full tokenize scans, the same trade a
    warehouse pipeline makes by persisting a tokenized silver table.
    The count tables stay vocabulary-bounded (Zipf), so they are
    broadcast into the scoring joins explicitly — the score leg is
    then a map-side pass over the bigram stream with no scoring-side
    shuffle at any corpus size."""
    toks = _doc_tokens(docs, text_col, id_col).localCheckpoint(eager=True)
    uni = (
        toks.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    pairs = _bigrams_from_tokens(toks, id_col)
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    vocab = uni.agg(F.count(F.lit(1)).alias("vocab_size"))
    joined = (
        pairs.join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(F.broadcast(uni.withColumnRenamed("w", "w1")), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    logp = F.log(
        (F.coalesce("c2", F.lit(0)) + F.lit(k))
        / (F.coalesce("c1", F.lit(0)) + F.lit(k) * F.col("vocab_size"))
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.avg(logp)).alias("cross_entropy"),
    ).withColumn("perplexity", F.exp("cross_entropy"))


def quality_deciles(docs: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Rank-based quality binning per language: ntile buckets,
    percent_rank, and cume_dist over (quality, doc_id) — the
    "keep the top-X% per language" selection primitive, and the
    coverage row for the rank-window family (ntile/percent_rank/
    cume_dist) the other window queries don't touch.

    Partitioned by lang, never a global window: each language ranks
    independently inside its own partition (the same reason
    temperature_sample rates are per-stratum), so no single-partition
    bottleneck at corpus scale. Ordering includes doc_id, so ranks are
    total and deterministic — ties on the 6-dp quality score cannot
    reshuffle buckets between runs."""
    from pyspark.sql.window import Window

    from distributed_vector_database_spark.functions.text import quality_score

    staged = docs.select("doc_id", "lang", quality_score("text").alias("quality"))
    w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    return staged.select(
        "doc_id",
        "lang",
        "quality",
        F.ntile(n_buckets).over(w).cast("long").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


def build_training_examples(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "0",
    eod: str = "<eod>",
    partitions: int | None = None,
) -> DataFrame:
    """The pretraining EXAMPLE BUILDER: concatenate every document (in
    a content-stable shuffled order, EOD marker appended to each) into
    one global token stream and slice it into consecutive `seq_len`-
    token examples that CROSS document boundaries — the GPT-style
    packing step that turns a cleaned corpus into the fixed-shape rows
    a trainer consumes. pack_documents bins whole documents (no doc
    ever split); this is the complementary discipline where every
    example is exactly seq_len tokens and documents are split wherever
    the grid falls. The trailing partial example is dropped (standard
    practice — it would need padding).

    Scale shape (no global window, no driver data):
    1. token arrays staged once per doc (withColumn — Catalyst will
       not CSE a tokenize into per-gram lambdas);
    2. the global order is md5(id‖seed) — content-stable, identical on
       any cluster and in the SQL oracle (deterministic_shuffle's
       idiom), and each doc's STARTING OFFSET in the token stream
       comes from the distributed prefix-sum (range partition on the
       hash, O(P) driver offsets, partition-local cumsum windows in
       parallel);
    3. a doc overlapping examples [start/L .. (start+n-1)/L] EXPLODES
       to one row per overlapped example (fan-out ≤ n/L + 1 — total
       explode volume ≈ corpus tokens / L, not corpus × examples);
    4. one example_id shuffle groups the pieces; codegen slice() cuts
       each doc's contribution, sort_array orders pieces by offset,
       flatten + array_join assembles the example text.

    Returns (example_id, n_docs, text) with exactly total_tokens/L
    rows, hash-matchable against a windowed SQL oracle."""
    from pyspark.sql.window import Window

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    spark = docs.sparkSession
    p = partitions or spark.sparkContext.defaultParallelism
    L = int(seq_len)
    staged = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            id_col,
            F.concat(
                F.split(F.col(text_col), " "), F.array(F.lit(eod))
            ).alias("__toks"),
            F.md5(
                F.concat(F.col(id_col).cast("string"), F.lit(str(seed)))
            ).alias("__h"),
        )
        .withColumn("__n", F.size("__toks").cast("long"))
    )
    ranged = (
        staged.repartitionByRange(p, F.asc("__h"), F.asc(id_col))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    try:
        totals = ranged.groupBy("__pid").agg(
            F.sum("__n").alias("__t")
        ).collect()
        offset = 0
        live = []
        for r in sorted(totals, key=lambda r: r["__pid"]):
            live.append((r["__pid"], offset))
            offset += int(r["__t"] or 0)
        n_examples = offset // L
        if not live or n_examples == 0:
            return spark.createDataFrame(
                [], "example_id long, n_docs int, text string"
            )
        off_df = F.broadcast(
            local_df(spark, live, ["__pid", "__offset"])
        )
        w = Window.partitionBy("__pid").orderBy(F.asc("__h"), F.asc(id_col))
        with_start = (
            ranged.join(off_df, "__pid")
            .withColumn(
                "__end", (F.col("__offset") + F.sum("__n").over(w))
            )
            .withColumn("__start", F.col("__end") - F.col("__n"))
        )
        ex = (
            with_start.withColumn(
                "__ex",
                F.explode(
                    F.sequence(
                        F.floor(F.col("__start") / L),
                        F.floor((F.col("__start") + F.col("__n") - 1) / L),
                    )
                ),
            )
            .filter(F.col("__ex") < n_examples)
            .withColumn(
                "__s", F.greatest(F.col("__start"), F.col("__ex") * L)
            )
            .withColumn(
                "__e",
                F.least(
                    F.col("__start") + F.col("__n"), F.col("__ex") * L + L
                ),
            )
            .withColumn(
                "__piece",
                F.slice(
                    "__toks",
                    (F.col("__s") - F.col("__start") + 1).cast("int"),
                    (F.col("__e") - F.col("__s")).cast("int"),
                ),
            )
        )
        out = (
            ex.groupBy(F.col("__ex").alias("example_id"))
            .agg(
                F.count(F.lit(1)).cast("int").alias("n_docs"),
                F.array_join(
                    F.flatten(
                        F.transform(
                            F.sort_array(
                                F.collect_list(
                                    F.struct(
                                        F.col("__s").alias("s"),
                                        F.col("__piece").alias("p"),
                                    )
                                )
                            ),
                            lambda x: x["p"],
                        )
                    ),
                    " ",
                ).alias("text"),
            )
            .orderBy("example_id")
        )
        return out.localCheckpoint(eager=True)
    finally:
        ranged.unpersist()


def length_grouped_batches(
    docs: DataFrame,
    batch_size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Length-grouped ('sorted') batching: order documents by token
    length and cut consecutive groups of `batch_size` — the
    padding-minimizing batch assignment every finetuning/inference
    loader uses (HF's LengthGroupedSampler shape). A batch pads every
    member to its max length, so grouping similar lengths shrinks
    Σ(batch_max − len); random batching pads everything toward the
    global max.

    Per batch: members, max/sum token length, and pad_waste =
    size·max − Σlen — the tokens a padded forward pass burns on
    nothing. Deterministic: (n_tokens, id) ordering both for grouping
    and the in-batch member list.

    100 TB shape: global rank over (n_tokens, id) uses the same
    distributed prefix-sum enumeration as deterministic_shuffle /
    select_by_token_budget — range-repartition, O(P) driver offsets
    from per-partition counts, partition-local row_number — NEVER a
    single-partition global window; batch stats are one
    floor(rank/size) groupBy with partial aggs."""
    from pyspark.sql.window import Window

    from distributed_vector_database_spark.functions.text import token_count

    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    spark = docs.sparkSession
    p = spark.sparkContext.defaultParallelism
    sized = docs.select(
        F.col(id_col), token_count(text_col).alias("n_tokens")
    )
    ranged = (
        sized.repartitionByRange(p, F.asc("n_tokens"), F.asc(id_col))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    try:
        counts = ranged.groupBy("__pid").agg(
            F.count(F.lit(1)).alias("__c")
        ).collect()
        offset, live = 0, []
        for r in sorted(counts, key=lambda r: r["__pid"]):
            live.append((r["__pid"], offset))
            offset += int(r["__c"])
        if not live:
            id_type = dict(docs.dtypes)[id_col]
            return spark.createDataFrame(
                [],
                "batch_id long, n_docs long, max_tokens long, "
                f"sum_tokens long, members array<{id_type}>, pad_waste long",
            )
        off_df = F.broadcast(local_df(spark, live, ["__pid", "__offset"]))
        w = Window.partitionBy("__pid").orderBy(
            F.asc("n_tokens"), F.asc(id_col)
        )
        batched = (
            ranged.join(off_df, "__pid")
            .withColumn(
                "batch_id",
                (
                    (F.col("__offset") + F.row_number().over(w) - 1)
                    / F.lit(batch_size)
                ).cast("long"),
            )
        )
        return (
            batched.groupBy("batch_id")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.max("n_tokens").alias("max_tokens"),
                F.sum("n_tokens").alias("sum_tokens"),
                F.sort_array(F.collect_list(id_col)).alias("members"),
            )
            .withColumn(
                "pad_waste",
                F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens"),
            )
            .orderBy("batch_id")
            .localCheckpoint(eager=True)
        )
    finally:
        ranged.unpersist()


def topic_keywords(
    docs: DataFrame,
    assignments: DataFrame,
    n_terms: int = 5,
    id_col: str = "doc_id",
    topic_col: str = "topic",
    text_col: str = "text",
) -> DataFrame:
    """Class-based TF-IDF topic labeling (the BERTopic c-TF-IDF shape):
    given a doc→topic assignment (e.g. ann.centroid_assign_expr over
    embeddings), score each term per topic by
    (tf_topic / tokens_topic) · ln(1 + n_topics / topics_with_term)
    and keep the n_terms best per topic — the human-readable label for
    an embedding cluster, turning 'centroid 7' into 'spark, shuffle,
    partition'.

    Deterministic: score rounds 6 dp, ties break on the term.

    100 TB shape: one tokenize+explode, ONE (topic, term) partial-agg
    shuffle (vocab×topics-bounded, not corpus-bounded); topic totals
    reaggregate that frame; document frequency across topics is a
    window over the same frame; the global topic count broadcasts as
    one row. The doc→topic join is id-keyed (broadcast when the
    assignment side is dim-sized, shuffle otherwise — either way the
    corpus shuffles at most once)."""
    from pyspark.sql.window import Window

    from distributed_vector_database_spark.functions.text import tokenize

    tt = (
        docs.join(assignments.select(id_col, topic_col), id_col)
        .withColumn("__toks", tokenize(text_col))  # staged: no-CSE rule
        .select(F.col(topic_col), F.explode("__toks").alias("term"))
        .groupBy(topic_col, "term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    w_topic = Window.partitionBy(topic_col)
    w_term = Window.partitionBy("term")
    # topic count from the aggregated frame (topics that contributed
    # tokens), NOT a .distinct() over assignments — that would
    # re-evaluate the whole corpus-sized assignment a second time;
    # this is one 1-row agg over the vocab-bounded frame, broadcast in
    ntop = tt.agg(F.countDistinct(topic_col).alias("__nt"))
    scored = (
        tt.crossJoin(F.broadcast(ntop))
        .withColumn("__total", F.sum("__tf").over(w_topic))
        .withColumn("__df", F.count(F.lit(1)).over(w_term))
        .select(
            topic_col,
            "term",
            F.round(
                (F.col("__tf") / F.col("__total"))
                * F.log(1.0 + F.col("__nt") / F.col("__df")),
                6,
            ).alias("score"),
        )
    )
    w_rank = Window.partitionBy(topic_col).orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("__rn", F.row_number().over(w_rank))
        .filter(F.col("__rn") <= n_terms)
        .select(topic_col, "term", "score", F.col("__rn").alias("rank"))
        .orderBy(topic_col, "rank")
    )


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The Gopher/MassiveText RULE-BASED quality gate (Rae et al.
    2021, §A1.1) as individual auditable rule columns plus the
    composite keep flag — the standard pre-filter every LLM curation
    pipeline applies before model-based scoring. Distinct from
    quality_score (a weighted heuristic): these are hard pass/fail
    rules, and pipelines need the per-rule breakdown to audit WHY a
    document fell.

    Rules (each a boolean column):
    - rule_word_count:   word count in [min_words, max_words]
    - rule_mean_wordlen: mean word length in [3, 10]
    - rule_symbol_ratio: '#'/'…'-to-word ratio <= max_symbol_ratio
    - rule_alpha_words:  >= min_alpha_word_frac of words contain an
                         alphabetic character
    - rule_stopwords:    >= min_stopword_hits hits on a tiny English
                         stopword list (the 'natural language, not a
                         listing' test)
    keep = every rule passes.

    One zero-shuffle codegen'd map pass: tokens staged once (Catalyst
    does not CSE into higher-order-function lambdas), every rule a
    pure expression over the staged array; no UDFs, no aggregation.
    At 100 TB this is scan-bound and embarrassingly parallel."""
    from distributed_vector_database_spark.functions.text import tokenize

    stop = ["the", "be", "to", "of", "and", "that", "have", "with"]
    staged = docs.withColumn("__toks", tokenize(text_col)).withColumn(
        "__n", F.size("__toks").cast("double")
    )
    n = F.col("__n")
    mean_wl = F.when(n == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            F.col("__toks"),
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.length(t),
        ).cast("double")
        / n
    )
    symbols = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"[#…]", ""))
    ).cast("double")
    alpha_words = F.size(
        F.filter(F.col("__toks"), lambda t: t.rlike("[a-z]"))
    ).cast("double")
    stop_hits = F.size(
        F.filter(F.col("__toks"), lambda t: t.isin(stop))
    ).cast("double")
    rules = {
        "rule_word_count": (n >= min_words) & (n <= max_words),
        "rule_mean_wordlen": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "rule_symbol_ratio": F.when(n == 0, F.lit(False)).otherwise(
            symbols / n <= max_symbol_ratio
        ),
        "rule_alpha_words": F.when(n == 0, F.lit(False)).otherwise(
            alpha_words / n >= min_alpha_word_frac
        ),
        "rule_stopwords": stop_hits >= min_stopword_hits,
    }
    out = staged.select(
        id_col,
        n.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_wordlen"),
        *[expr.alias(name) for name, expr in rules.items()],
    )
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)
