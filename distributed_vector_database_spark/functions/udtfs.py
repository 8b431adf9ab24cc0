"""Python UDTF surface (SURVEY §2.2 UDF/UDAF/UDTF) — the table-function
extension point, exercised by an operator that is genuinely awkward as
pure SQL: maximal-run extraction over a token stream.

UDTFs are the slow path (per-row Python, even Arrow-optimized) — the
production repetition CLEANER is the zero-shuffle expression
`functions/text.collapse_runs_from_tokens`; this module exists so a
user with imperative per-document logic has a typed, lateral-join-able
escape hatch that composes with the rest of the engine. At 100 TB the
plan shape is still a single map pass (BatchEvalPython / ArrowEvalPython
over the scan) — no shuffle, parallelism = input partitions.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="start_pos int, run_len int, token string", useArrow=True)
class TokenRuns:
    """One output row per maximal run (length >= min_len, default 2) of
    consecutive identical tokens: (0-based start position, run length,
    the token). 'a b b b c c' -> (1, 3, 'b'), (4, 2, 'c')."""

    def eval(self, text: str, min_len: int = 2):
        if text is None:
            return
        toks = text.lower().split()
        i = 0
        n = len(toks)
        while i < n:
            j = i
            while j < n and toks[j] == toks[i]:
                j += 1
            if j - i >= (min_len if min_len is not None else 2):
                yield i, j - i, toks[i]
            i = j


def register_udtfs(spark) -> None:
    """Make the table functions SQL-callable:
    SELECT d.doc_id, r.* FROM documents d,
      LATERAL token_runs(d.text) r"""
    spark.udtf.register("token_runs", TokenRuns)
