"""Retrieval-quality evaluation: recall@k, MRR, nDCG@k over ranked
result lists vs graded relevance judgments.

The reference ships retrievers with no way to measure them (no eval
path anywhere in src/ — the closest thing is the ad-hoc cosine
printout in clip/test_search.py). A pipeline that maintains ANN
indexes, BM25 postings, rerankers, and hybrid fusion needs the metric
layer to compare them; this is it, computed as one declarative plan.

Scale shape: `results` is ranked retriever output (n_queries × k rows)
and `qrels` a relevance set (n_queries × judged docs) — both bounded
by the EVAL set, never the corpus, so every join here is
eval-set-sized regardless of corpus size; one query_key shuffle ranks
the ideal ordering. The expensive part of evaluation is producing
`results`, which is the retrievers' own partition-pruned serving path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_key: str = "query_id",
    doc_key: str = "vec_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query retrieval metrics at cutoff k.

    - recall_k: |relevant ∩ retrieved@k| / |relevant| (0 when the
      query has no relevant docs).
    - mrr: 1 / rank of the first relevant hit in the top-k (0 when
      none) — reciprocal rank at the same cutoff as the others.
    - ndcg_k: Σ rel/log2(rank+1) over retrieved@k, normalized by the
      ideal DCG of the query's top-k judgments (graded `rel` supported;
      0 when the query has no positive judgments).

    `results` carries (query_key, doc_key, rank_col) with rank 1-based
    and dense per query (the contract every retriever here emits);
    `qrels` carries (query_key, doc_key, rel_col ≥ 0). Unjudged
    retrieved docs count as rel 0 (the TREC convention). Metrics are
    rounded 6dp so a SQL oracle agrees despite float-sum order.

    Returns one row per query in `results`: (query_key, recall_k, mrr,
    ndcg_k), ordered by query_key."""
    res = results.filter(F.col(rank_col) <= k).select(
        query_key, doc_key, rank_col
    )
    pos = qrels.filter(F.col(rel_col) > 0)
    # per-query totals over the judgments (denominators)
    totals = pos.groupBy(query_key).agg(
        F.count(F.lit(1)).alias("__n_rel")
    )
    w_ideal = Window.partitionBy(query_key).orderBy(
        F.col(rel_col).desc(), F.col(doc_key).asc()
    )
    ideal = (
        pos.withColumn("__irank", F.row_number().over(w_ideal))
        .filter(F.col("__irank") <= k)
        .groupBy(query_key)
        .agg(
            F.sum(
                F.col(rel_col) / F.log2(F.col("__irank") + F.lit(1.0))
            ).alias("__idcg")
        )
    )
    hit = res.join(pos, [query_key, doc_key], "left").select(
        query_key,
        rank_col,
        F.coalesce(F.col(rel_col).cast("double"), F.lit(0.0)).alias("__rel"),
    )
    per_q = hit.groupBy(query_key).agg(
        F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0)).alias("__n_hit"),
        F.min(F.when(F.col("__rel") > 0, F.col(rank_col))).alias(
            "__first_rel"
        ),
        F.sum(
            F.col("__rel") / F.log2(F.col(rank_col) + F.lit(1.0))
        ).alias("__dcg"),
    )
    out = (
        per_q.join(totals, query_key, "left")
        .join(ideal, query_key, "left")
        .select(
            query_key,
            F.round(
                F.when(
                    F.col("__n_rel").isNull() | (F.col("__n_rel") == 0),
                    F.lit(0.0),
                ).otherwise(F.col("__n_hit") / F.col("__n_rel")),
                6,
            ).alias("recall_k"),
            F.round(
                F.when(F.col("__first_rel").isNull(), F.lit(0.0)).otherwise(
                    F.lit(1.0) / F.col("__first_rel")
                ),
                6,
            ).alias("mrr"),
            F.round(
                F.when(
                    F.col("__idcg").isNull() | (F.col("__idcg") == 0.0),
                    F.lit(0.0),
                ).otherwise(F.col("__dcg") / F.col("__idcg")),
                6,
            ).alias("ndcg_k"),
        )
        .orderBy(query_key)
    )
    return out


def embedding_drift_report(
    reference: DataFrame,
    current: DataFrame,
    vec_col: str = "embedding",
    z_alert: float = 3.0,
) -> DataFrame:
    """Per-dimension distribution drift between two embedding corpus
    snapshots — the monitoring gate an embedding pipeline needs before
    an index rebuild or a model swap silently shifts the space (a
    drifted dimension breaks every persisted IVF/HNSW/MRL layout that
    was trained/ordered on the old distribution; the reference has no
    monitoring surface at all).

    Per dimension: reference vs current mean and sample stddev, the
    mean shift in reference-stddev units
    (shift_z = |Δmean| / (ref_std + eps) · sqrt(n_cur) — the two-sided
    z statistic of the current mean under the reference distribution),
    the spread ratio, and a drifted flag at `z_alert`.

    100 TB shape: ONE posexplode + ONE dim-keyed partial-agg shuffle
    per side — the shuffle carries dim × 4 doubles per map task, not
    rows; the final join is dim-sized (64 rows). No Python, no
    collect."""
    eps = 1e-12

    def stats(df: DataFrame, side: str) -> DataFrame:
        return (
            df.filter(F.col(vec_col).isNotNull())
            .select(
                F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                    "dim", "__x"
                )
            )
            .groupBy("dim")
            .agg(
                F.count(F.lit(1)).alias(f"{side}_n"),
                F.avg("__x").alias(f"{side}_mean"),
                F.stddev_samp("__x").alias(f"{side}_std"),
            )
        )

    ref, cur = stats(reference, "ref"), stats(current, "cur")
    shift_z = (
        F.abs(F.col("cur_mean") - F.col("ref_mean"))
        / (F.col("ref_std") + F.lit(eps))
        * F.sqrt(F.col("cur_n"))
    )
    return (
        ref.join(cur, "dim")
        .select(
            "dim",
            F.round("ref_mean", 6).alias("ref_mean"),
            F.round("cur_mean", 6).alias("cur_mean"),
            F.round("ref_std", 6).alias("ref_std"),
            F.round("cur_std", 6).alias("cur_std"),
            F.round(shift_z, 4).alias("shift_z"),
            F.round(
                F.col("cur_std") / (F.col("ref_std") + F.lit(eps)), 4
            ).alias("std_ratio"),
            (shift_z > F.lit(float(z_alert))).alias("drifted"),
        )
        .orderBy("dim")
    )


def expect_columns(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One-pass column expectations (Great-Expectations shape): each
    rule is a boolean Column that every row must satisfy; returns
    (rule, violations, passed) per rule from a SINGLE aggregation scan
    — at 100 TB you get the whole audit for the price of one pass,
    never one job per rule. NULL rule results count as violations
    (a row that cannot prove the expectation fails it).
    """
    if not rules:
        raise ValueError("expect_columns: rules must be non-empty")
    # positional aliases + typed-Column unpivot: rule names are
    # user-supplied strings and must only ever appear as F.lit values,
    # never interpolated into SQL or resolved as column identifiers
    aggs = [
        F.sum(
            F.when(F.coalesce(rule, F.lit(False)), 0).otherwise(1)
        ).alias(f"__r{i}")
        for i, rule in enumerate(rules.values())
    ]
    wide = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__r{i}").cast("long").alias("violations"),
            )
            for i, name in enumerate(rules)
        ]
    )
    return wide.select(F.explode(pairs).alias("kv")).select(
        F.col("kv.rule").alias("rule"),
        F.col("kv.violations").alias("violations"),
        (F.col("kv.violations") == 0).alias("passed"),
    )


def expect_unique(df: DataFrame, cols: list[str], rule_name: str) -> DataFrame:
    """Uniqueness expectation: violations = rows participating in a
    duplicated key (total rows minus distinct keys would hide WHICH
    multiplicity; this counts every row beyond the first per key —
    the number of rows you would drop to make the key unique).
    One hash shuffle on the key."""
    dup_rows = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(
            F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("violations")
        )
    )
    return dup_rows.select(
        F.lit(rule_name).alias("rule"),
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )


def expect_foreign_key(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    rule_name: str,
) -> DataFrame:
    """Referential-integrity expectation: violations = child rows whose
    key has no parent (NULL child keys violate — declare them with a
    separate not-null rule if NULLs are legal). One anti join; the
    parent key set is broadcast when small."""
    orphans = child.join(
        parent.select(F.col(parent_col).alias(child_col)).distinct(),
        child_col,
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("violations")).select(
        F.lit(rule_name).alias("rule"),
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )


def data_quality_report(parts: list[DataFrame]) -> DataFrame:
    """Union the expectation frames into one (rule, violations,
    passed) audit table."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def volume_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    trailing: int = 24,
    z_flag: float = 2.0,
) -> DataFrame:
    """Event-volume anomaly monitor: hourly counts per type, z-score
    against the TRAILING `trailing`-hour window (excluding the current
    hour — the score must not see the point it judges), rows with
    |z| > z_flag flagged. Returns every scored hour (bucket, type, n,
    mean, z, anomaly) so dashboards can plot the band, not just the
    alerts.

    Shape: one groupBy to the |hours x types|-sized rollup, then
    windows over that tiny frame — the raw event volume is touched
    exactly once. Hours with <2 trailing buckets emit NULL z and never
    flag (no sample stddev to judge by); a ZERO-variance baseline
    emits NULL z but flags iff n deviates from the flat mean at all
    (the infinite-z spike a steady stream's first burst produces —
    exact comparison is safe because the mean of identical integer
    counts is exact in IEEE double).
    """
    hourly = events.groupBy(
        F.date_trunc("hour", F.col(ts_col)).alias("bucket"),
        F.col(type_col).alias("etype"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return score_hourly_volumes(hourly, trailing, z_flag)


def score_hourly_volumes(
    hourly: DataFrame, trailing: int = 24, z_flag: float = 2.0
) -> DataFrame:
    """The scoring stage of volume_anomalies over a pre-aggregated
    (bucket, etype, n) frame — serve it directly from a MAINTAINED
    rollup snapshot (streaming/rollup.py) so monitoring at 100 TB
    reads the tiny continuous aggregate, never the event history."""
    w = (
        Window.partitionBy("etype")
        .orderBy(F.col("bucket").cast("long"))
        .rangeBetween(-trailing * 3600, -3600)
    )
    mean = F.avg("n").over(w)
    std = F.stddev_samp("n").over(w)
    # try_divide: zero-variance trailing windows yield NULL z (never
    # flag), not an ANSI divide-by-zero error
    z = F.try_divide(F.col("n") - mean, std)
    anomaly = (
        F.when(std.isNull(), F.lit(False))
        .when(std == 0, F.col("n") != mean)
        .otherwise(F.abs(z) > z_flag)
    )
    return hourly.select(
        "bucket",
        "etype",
        "n",
        F.round(mean, 6).alias("trailing_mean"),
        F.round(z, 6).alias("z"),
        anomaly.alias("anomaly"),
    )


def grouped_trend(
    df: DataFrame,
    group_col: str,
    x_col: Column,
    y_col: str,
) -> DataFrame:
    """Per-group least-squares trend line (the monitoring question
    "is this metric drifting?" answered in closed form): slope,
    intercept and r² of y over x per group, from ONE aggregation pass
    using the covariance/variance identities — slope = cov(x,y)/var(x),
    intercept = ȳ - slope·x̄, r² = corr(x,y)². Values rounded for
    oracle-stable hashing; groups with zero x-variance or fewer than
    2 rows emit NULL slope (try_divide).

    One map-side-combinable groupBy — never a per-group fit loop; the
    output is |groups|-sized regardless of row volume.
    """
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.covar_pop(x_col, F.col(y_col)).alias("__cov"),
        F.var_pop(x_col).alias("__varx"),
        F.var_pop(y_col).alias("__vary"),
        F.avg(x_col).alias("__mx"),
        F.avg(y_col).alias("__my"),
    )
    slope = F.try_divide(F.col("__cov"), F.col("__varx"))
    # r² = cov² / (var_x · var_y) via try_divide — Spark's corr()
    # raises ANSI divide-by-zero on a flat group; DuckDB's returns
    # NULL, and NULL is the contract here
    r2 = F.try_divide(
        F.col("__cov") * F.col("__cov"), F.col("__varx") * F.col("__vary")
    )
    return agg.select(
        group_col,
        F.col("n"),
        F.round(slope, 6).alias("slope"),
        F.round(F.col("__my") - slope * F.col("__mx"), 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )
