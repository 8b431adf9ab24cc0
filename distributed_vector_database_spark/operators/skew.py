"""Skew-handling primitives (SURVEY §4 / SCALE.md doctrine).

AQE's skew-join splitting handles join skew automatically (enabled in
session.py); these helpers cover the cases AQE doesn't:

- salted_aggregate: two-phase aggregation for power-law key
  distributions — phase 1 aggregates on (key, salt) so one hot key
  spreads over `n_salts` reducers, phase 2 combines the partials.
  Correct for any algebraic aggregate (sum/count/min/max here).
- with_salt / explode_salt: the building blocks for manual salted
  joins (replicate the small side per salt) when a broadcast is too
  big and AQE's split granularity isn't enough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Random-but-deterministic salt derived from the row content is
    wrong for joins — use a uniform salt from a stable row id."""
    return df.withColumn(
        salt_col,
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )


def explode_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Replicate every row once per salt value (the small side of a
    salted join)."""
    return df.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: groupBy(key, salt) partial →
    groupBy(key) final. `agg_exprs` maps output column → 'sum(col)' /
    'count(1)' / 'min(col)' / 'max(col)' (algebraic aggs only — they
    re-combine with the same function; avg must be expressed as
    sum+count by the caller)."""
    allowed = {"sum", "count", "min", "max"}
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        *[
            F.expr(expr).alias(out)
            for out, expr in agg_exprs.items()
        ]
    )
    final_aggs = []
    for out, expr in agg_exprs.items():
        fn = expr.split("(", 1)[0].strip().lower()
        if fn not in allowed:
            raise ValueError(f"non-algebraic aggregate {fn!r}; use sum/count/min/max")
        refn = "sum" if fn == "count" else fn  # counts combine by summing
        final_aggs.append(getattr(F, refn)(out).alias(out))
    return phase1.groupBy(*key_cols).agg(*final_aggs)


def skew_report(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Key-skew diagnostics BEFORE a join/agg commits to a partition
    strategy: the top keys by row count with their corpus share and
    the ratio to a perfectly uniform key (share x distinct_keys —
    values >> 1 mean salting / AQE skew handling will matter). One
    partial-agg shuffle sized by distinct keys; the global totals ride
    along via a 1-row broadcast cross join, never a second scan of the
    counts."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("__total"), F.count(F.lit(1)).alias("__keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            key_col,
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("n") * F.col("__keys") / F.col("__total"), 6
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("n"), F.asc(key_col))
        .limit(top_n)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_big: str,
    key_small: str | None = None,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Composed skew-safe join: the big side takes a uniform salt from
    its stable row id, the small side replicates once per salt, and
    the join runs on (key, salt) — one hot key spreads over `n_salts`
    reducers instead of melting one task. The manual fallback for the
    gap AQE's skew splitting leaves: a replicated-but-not-broadcastable
    small side, or a skewed key feeding a non-splittable downstream
    exchange.

    Cost model (why this is not free): the small side shuffles
    n_salts× its size — worth it exactly when the hot key's single
    task dominates the stage (skew_report's skew_ratio >> n_salts is
    the trigger). Inner and left joins only: the salt replication
    preserves their multiplicities exactly."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    kb, ks = key_big, key_small if key_small is not None else key_big
    b = with_salt(big, n_salts)
    s = explode_salt(small, n_salts)
    cond = (b[kb] == s[ks]) & (b["__salt"] == s["__salt"])
    out_cols = [b[c] for c in big.columns] + [
        s[c] for c in small.columns if c not in (ks, "__salt")
    ]
    return b.join(s, cond, how).select(*out_cols)


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_count: int,
) -> DataFrame:
    """All keys with global count >= min_count, found with the
    two-pass candidate/verify discipline instead of a full
    distinct-key shuffle.

    Pass 1 (candidates, one scan, NO shuffle): each partition runs a
    vectorized local frequency count (pandas value_counts inside
    mapInPandas) and emits only keys whose LOCAL count reaches
    ceil(min_count / n_partitions). Any global heavy hitter must
    clear that bar in at least one partition — if every partition
    held fewer copies, the global total could not reach min_count —
    so the candidate set is a GUARANTEED superset (never probabilistic:
    the verify pass depends on it). Per-partition emission is bounded
    by partition_rows / local_bar, i.e. at most rows·P/min_count
    candidates globally — small whenever min_count is a meaningful
    heavy-hitter threshold.

    Pass 2 (exact verify, candidate-sized): the corpus semi-joins the
    broadcast candidate set — map-side pruned, no shuffle of
    non-candidate rows — and one groupBy over surviving rows computes
    EXACT counts, filtered to >= min_count. Output is exact (the
    candidate pass only prunes), so it hash-matches the plain
    GROUP BY / HAVING oracle.

    100 TB shape: a power-law key column has billions of distinct
    keys but few heavy ones; the full groupBy (skew_report) shuffles
    one row per DISTINCT key, while this shuffles one row per
    candidate OCCURRENCE — candidates are the rare keys that are
    locally dense somewhere. Degenerate uniform data emits many
    candidates; correctness never depends on the distribution."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    keys = df.select(key_col)
    # the superset guarantee needs bar <= ceil(s / P_actual): take the
    # partition count from the EXACT frame the kernel will map over
    # (a map-only stage — no exchange, so AQE cannot re-split it, and
    # an overestimate of P only lowers the bar, which stays safe)
    n_parts = keys.rdd.getNumPartitions() or 1
    local_bar = max(1, -(-min_count // n_parts))  # ceil division
    key_type = dict(df.dtypes)[key_col]

    def _local_candidates(batches):
        import pandas as pd

        acc: dict = {}
        for pdf in batches:
            vc = pdf[key_col].value_counts(dropna=True)
            for k, c in vc.items():
                acc[k] = acc.get(k, 0) + int(c)
        yield pd.DataFrame(
            {key_col: [k for k, c in acc.items() if c >= local_bar]}
        )

    candidates = (
        keys.mapInPandas(_local_candidates, schema=f"{key_col} {key_type}")
        .distinct()
    )
    return (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), F.asc(key_col))
    )
