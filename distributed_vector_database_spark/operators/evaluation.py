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

from pyspark.sql import DataFrame
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
