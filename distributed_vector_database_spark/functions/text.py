"""Text-analysis column expressions for the LLM-data-pipeline surface
(SURVEY §2.3): tokenization, shingling, language-ID heuristic, quality
scoring, token counting, document fingerprinting.

The reference's only text path is CLIP text2vec (clip/embedding.py:70-93)
plus a GBK corpus transcode (Scripts/trasfer_gbk.py:1-4); these operators
are the north-star extensions built over the `documents` fixture.

All native Catalyst expressions (regexp / array higher-order functions),
so a 100 TB corpus pass is a single codegen'd scan — no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_SPLIT = r"\s+"
PUNCT_RE = r"[^\w\s]"

# tiny per-language stopword lists for the n-gram/stopword lang-id
# heuristic; deterministic and mirrored in the SQL oracle.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "das", "und", "zu"],
    "fr": ["le", "la", "et", "les", "des"],
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokenize(text: Column | str) -> Column:
    """Lowercased whitespace tokenization (array<string>)."""
    return F.split(F.lower(F.trim(_col(text))), WORD_SPLIT)


def token_count(text: Column | str) -> Column:
    """Whitespace token count — the cheap token-budget estimator."""
    return F.size(tokenize(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """A BPE-flavored token estimate: count of word pieces after
    splitting words longer than 6 chars into ceil(len/4) pieces —
    deterministic, SQL-mirrorable stand-in for a real tokenizer."""
    toks = tokenize(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.when(F.length(t) <= 6, 1).otherwise(F.ceil(F.length(t) / 4.0)),
    )


def char_ngrams_from_norm(norm: Column | str, n: int = 3) -> Column:
    """Character n-grams of a pre-staged normalized string
    (array<string>). `norm` MUST be a materialized column — the
    no-CSE-across-lambdas rule: an inline lower(trim(text)) here would
    re-normalize the whole string once per gram position, O(len²)."""
    g = _col(norm)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(g) - (n - 1), F.lit(1))),
        lambda i: g.substr(i, F.lit(n)),
    )


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Convenience form over raw text — fine for short documents;
    operators stage the normalized string first (see
    char_ngrams_from_norm's O(len²) caveat)."""
    return char_ngrams_from_norm(F.lower(F.trim(_col(text))), n)


def shingles_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles from a pre-staged token array: shingle i =
    tokens[i..i+n-1] joined by space; fewer than n tokens yields the
    whole doc as one shingle. `toks` MUST be a materialized column
    (tokenize staged via withColumn) — an inline split would re-run
    once per shingle position, O(tokens²) per document."""
    g = _col(toks)
    return F.when(
        F.size(g) < n, F.array(F.concat_ws(" ", g))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(g) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(g, i, n)),
        )
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Convenience form over raw text — fine for short documents;
    operators that shingle corpus-wide stage the tokens first (see
    shingles_from_tokens' O(tokens²) caveat)."""
    return shingles_from_tokens(tokenize(text), n)


def tokenize_strict(text: Column | str) -> Column:
    """tokenize, except empty/whitespace-only text yields [] — plain
    tokenize's split returns a phantom [''] there (1 'token' for a
    blank doc), which overlap semantics must not count."""
    return F.when(
        F.length(F.trim(_col(text))) == 0, F.array().cast("array<string>")
    ).otherwise(tokenize(text))


def ngram_hashes_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """32-bit hashes of the token n-grams of a pre-staged token array
    (array<long>). Fewer than n tokens yields an EMPTY array —
    decontamination semantics: a doc too short to contain an n-gram
    cannot overlap one. Hash = first 8 md5 hex chars of the
    space-joined gram -> long, bit-identical in DuckDB as
    CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT), so join keys
    are 8-byte longs at shuffle time, never full gram strings.

    `toks` MUST be a materialized column (tokenize_strict staged via
    withColumn) — same no-CSE-across-lambdas rule as winnow_from_grams:
    an inline tokenize would re-split the text once per gram position,
    O(n²) per document."""
    if n < 1:
        raise ValueError("n must be >= 1")
    g = _col(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(g) - (n - 1)),
        lambda i: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice(g, i, n))), 1, 8),
            16,
            10,
        ).cast("long"),
    )
    return F.when(F.size(g) >= n, grams).otherwise(
        F.array().cast("array<long>")
    )


def token_ngram_hashes(text: Column | str, n: int = 3) -> Column:
    """Convenience form of ngram_hashes_from_tokens over raw text.
    Fine in single-column selects over short documents; operators that
    explode grams corpus-wide stage the tokens first (see
    operators/decontam.py) to stay O(tokens) per doc."""
    return ngram_hashes_from_tokens(tokenize_strict(text), n)


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    t = _col(text)
    return F.when(F.length(t) == 0, 0.0).otherwise(
        F.regexp_count(t, F.lit(PUNCT_RE)) / F.length(t).cast("double")
    )


def stopword_ratio(text: Column | str, stopwords: list[str]) -> Column:
    """Fraction of tokens that are stopwords."""
    toks = tokenize(text)
    hits = F.size(
        F.filter(toks, lambda t: t.isin(stopwords))
    )
    return F.when(F.size(toks) == 0, 0.0).otherwise(
        hits / F.size(toks).cast("double")
    )


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic combining length, mean word
    length, and punctuation density — the 'is this worth training on'
    score. score = clamp(0.25*len_score + 0.5*wordlen_score +
    0.25*(1-punct_ratio)) with len_score = min(n_tokens/50, 1) and
    wordlen_score = 1 when mean word length in [3,10] else 0.5."""
    toks = tokenize(text)
    n = F.size(toks).cast("double")
    len_score = F.least(n / 50.0, F.lit(1.0))
    mean_wl = F.when(n == 0, 0.0).otherwise(
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).cast("double")
        / n
    )
    wordlen_score = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), 1.0).otherwise(0.5)
    score = 0.25 * len_score + 0.5 * wordlen_score + 0.25 * (1.0 - punct_ratio(text))
    return F.round(score, 6)


def detect_lang(text: Column | str) -> Column:
    """Stopword-hit language-ID heuristic: the language whose stopword
    list matches the most tokens; 'und' (undetermined) when no list gets
    ≥1 hit. Ties broken by language code order (deterministic)."""
    toks = tokenize(text)

    def is_stopword(sw: list[str]):
        return lambda t: t.isin(sw)

    scores = {
        lang: F.size(F.filter(toks, is_stopword(sw)))
        for lang, sw in LANG_STOPWORDS.items()
    }
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # fold in reverse code order with '>=' so that on ties the
    # alphabetically-first language (applied last) wins deterministically
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        s = scores[lang]
        best_lang = F.when((s > 0) & (s >= best_score), F.lit(lang)).otherwise(
            best_lang
        )
        best_score = F.greatest(s, best_score)
    return best_lang


# tiny per-language character-trigram profiles for the n-gram lang-id
# variant; deterministic and mirrored in the SQL oracle.
LANG_TRIGRAMS: dict[str, list[str]] = {
    "en": ["the", "and", "ing", "ion", "ent"],
    "es": ["que", "de ", "la ", "ent", "os "],
    "de": ["der", "die", "und", "sch", "ein"],
    "fr": ["les", "ent", "de ", "ion", "que"],
}


def detect_lang_ngram_from_grams(grams: Column | str) -> Column:
    """Character-n-gram language ID from a pre-staged char-gram array
    (see char_ngrams_from_norm): the language whose trigram profile
    matches the most grams; 'und' when nothing hits. Ties →
    alphabetically-first (same fold as detect_lang)."""
    grams = _col(grams)

    def hits(profile: list[str]):
        return lambda g: g.isin(profile)

    scores = {
        lang: F.size(F.filter(grams, hits(prof)))
        for lang, prof in LANG_TRIGRAMS.items()
    }
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_TRIGRAMS, reverse=True):
        s = scores[lang]
        best_lang = F.when((s > 0) & (s >= best_score), F.lit(lang)).otherwise(
            best_lang
        )
        best_score = F.greatest(s, best_score)
    return best_lang


def detect_lang_ngram(text: Column | str, n: int = 3) -> Column:
    """Convenience form over raw text — fine for short documents;
    operators stage norm + grams first (see char_ngrams_from_norm)."""
    return detect_lang_ngram_from_grams(char_ngrams(text, n))


def collapse_runs_from_tokens(toks: Column | str) -> Column:
    """Keep token i iff i == 0 or it differs from its predecessor —
    collapses each run of consecutive identical tokens to one
    occurrence (array<string> in, array<string> out). F.get is 0-based
    and null-safe, so the i == 0 branch never faults under ANSI.

    `toks` MUST be a materialized column (tokenize staged via
    withColumn), not an inline expression — same no-CSE-across-lambdas
    rule as winnow_from_grams: an inline tokenize would re-split the
    text once per element, O(n²)."""
    g = _col(toks)
    return F.filter(
        g,
        lambda t, i: (i == F.lit(0)) | (t != F.get(g, i - 1)),
    )


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    strip."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (exact-dup key)."""
    return F.md5(normalize_text(text))


def kgram_hashes_from_norm(norm: Column | str, k: int = 5) -> Column:
    """32-bit rolling-hash family over the char k-grams of a
    pre-staged normalized string (array<long>, one hash per k-gram
    position). Empty array when shorter than k. Hash = first 8 md5 hex
    chars -> long, bit-identical in DuckDB as
    CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT).

    `norm` MUST be a materialized column (normalize_text staged via
    withColumn) — an inline normalize would re-run its regex pass once
    per gram position, O(len²) per document."""
    if k < 1:
        raise ValueError("k must be >= 1")
    t = _col(norm)
    n = F.length(t)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.conv(
            F.substring(F.md5(t.substr(i, F.lit(k))), 1, 8), 16, 10
        ).cast("long"),
    )
    return F.when(n >= k, grams).otherwise(F.array().cast("array<long>"))


def kgram_hashes(text: Column | str, k: int = 5) -> Column:
    """Convenience form over raw text — fine for short documents;
    operators stage the normalized string first (see
    kgram_hashes_from_norm's O(len²) caveat)."""
    return kgram_hashes_from_norm(normalize_text(text), k)


def winnow_from_grams(grams: Column | str, window: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    2003 — the MOSS algorithm) from a pre-staged k-gram hash column:
    slide a window of `window` consecutive hashes, keep each window's
    MINIMUM, return the sorted distinct minima as the fingerprint set.

    Guarantee: any shared substring of length >= window + k - 1
    between two documents yields at least one shared fingerprint, so
    overlap detection needs only an equi-join on (fingerprint) — no
    all-pairs comparison at any scale. Fingerprint density is
    ~2/(window+1) per character, independent of corpus size.

    `grams` MUST be a materialized column (kgram_hashes staged via
    withColumn), not an inline expression: Catalyst does not CSE
    across lambda bodies, so an inline gram expression would
    re-evaluate its O(n) md5 work once per window — O(n²) total."""
    if window < 1:
        raise ValueError("window must be >= 1")
    g = _col(grams)
    m = F.size(g)
    mins = F.transform(
        # fewer grams than one window -> a single (short) window
        F.sequence(F.lit(1), F.greatest(m - (window - 1), F.lit(1))),
        lambda j: F.array_min(F.slice(g, j, window)),
    )
    return F.when(m > 0, F.array_sort(F.array_distinct(mins))).otherwise(
        F.array().cast("array<long>")
    )
