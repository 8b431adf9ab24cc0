"""Byte-pair-encoding tokenizer, Spark-shaped.

Real BPE (Sennrich et al. 2016) trains on the WORD-FREQUENCY table,
not the corpus: the only corpus-sized work is one word-count
aggregation (shuffle sized by the vocabulary) and one encode pass.
Training itself folds a bounded (distinct-word, count) table
driver-side — O(vocab * merges), no cluster round-trips per merge —
then the merge ranks broadcast into an Arrow-batched mapInPandas
encoder that memoizes per distinct word, so a batch of 10k rows with
2k distinct words pays 2k merge loops, not 10k.

The stand-in estimator (functions/text.py::bpe_ish_token_count) stays
for SQL-mirrorable counting; this module is the real, trainable
tokenizer a pretraining pipeline ships."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_vector_database_spark.functions.text import tokenize_strict

END = "</w>"  # end-of-word sentinel so merges can learn suffixes


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + END,)


def train_bpe(
    docs: DataFrame, text_col: str = "text", num_merges: int = 200
) -> list[tuple[str, str]]:
    """Learn merge rules from the corpus. Distributed part: ONE
    groupBy on lowercased whitespace words (partial-agg, shuffle =
    vocabulary size). Driver part: the classic highest-count-pair
    fold over the collected frequency table — deterministic (count
    desc, pair lexicographic tiebreak), so any two clusters training
    on the same corpus learn identical merges."""
    rows = (
        docs.select(F.explode(tokenize_strict(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    vocab = {_word_symbols(r["w"]): int(r["c"]) for r in rows if r["w"]}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            i, acc = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    acc.append(merged)
                    i += 2
                else:
                    acc.append(syms[i])
                    i += 1
            t = tuple(acc)
            out[t] = out.get(t, 0) + c
        vocab = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, lowest-rank-first (the standard BPE
    encode loop)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Tokenize every document with the learned merges:
    (id, *keep_cols, bpe_tokens array<string>, n_bpe) — the exact token
    counts a token-budget selection or packing pass wants.
    Arrow-batched mapInPandas; the per-batch word cache bounds
    merge-loop work by DISTINCT words per batch. Merges ship once per
    executor via broadcast, not per task. keep_cols pass source columns
    through the encoder untouched (e.g. the text itself, so a
    detokenization audit can run JVM-side next to the tokens)."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast({p: i for i, p in enumerate(merges)})
    src = docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.col(text_col).alias("__text"),
    )
    id_type = docs.schema[id_col].dataType.simpleString()
    keep_schema = "".join(
        f", {c} {docs.schema[c].dataType.simpleString()}" for c in keep_cols
    )

    def run(batches):
        import pandas as pd

        ranks = bc.value
        cache: dict[str, list[str]] = {}

        def enc(text):
            out = []
            for w in (text or "").lower().split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        for pdf in batches:
            toks = pdf["__text"].map(enc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    **{c: pdf[c] for c in keep_cols},
                    "bpe_tokens": toks,
                    "n_bpe": toks.map(len),
                }
            )

    return src.mapInPandas(
        run,
        schema=(
            f"{id_col} {id_type}{keep_schema},"
            " bpe_tokens array<string>, n_bpe long"
        ),
    )
