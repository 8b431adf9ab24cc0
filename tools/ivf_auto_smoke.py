"""Auto-tuned IVF at 1M: does ivf_build_auto (sqrt-n centroids, sampled
quantizer training, imbalance repair, matching nprobe) match or beat the
hand-tuned nprobe-8-of-64 configuration from the earlier SCALE.md rows?

Corpus: 1M x 64-d mixture-of-gaussians (the structure IVF exploits),
same generator as ivfpq_smoke. Reports build time, per-query latency and
recall@10 for (a) hand-tuned ivf_build(64)/nprobe=8, (b) auto params,
both against knn_exact ground truth, plus a FILTERED query through the
selectivity-aware over-probe path.

Usage: python tools/ivf_auto_smoke.py [n_vec]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.ann import (
    ivf_build,
    ivf_build_auto,
    ivf_search,
)
from distributed_vector_database_spark.operators.knn import knn_exact
from distributed_vector_database_spark.session import get_spark
from ivfpq_smoke import synth_clustered_embeddings

N_QUERIES = 8
K = 10


def run_queries(spark, centroids, assigned, queries, truth, nprobe, label,
                predicate=None, truth_key="plain"):
    hits, t0 = 0, time.time()
    for qid, qv in queries.items():
        got = {
            r["vec_id"]
            for r in ivf_search(
                spark, centroids, assigned, qv, k=K, nprobe=nprobe,
                predicate=predicate,
                selectivity=(0.1 if predicate is not None else None),
            ).collect()
        }
        hits += len(got & truth[(qid, truth_key)])
    t = (time.time() - t0) / len(queries)
    recall = hits / (K * len(queries))
    print(f"{label}: {t:.2f}s/query, recall@{K} {recall:.4f} "
          f"(nprobe={nprobe}/{len(centroids)})")
    return t, recall


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="dvds-ivf-auto-smoke")
    emb = (
        synth_clustered_embeddings(spark, n)
        .withColumn("label", F.pmod(F.col("vec_id"), 10).cast("int"))
        .cache()
    )
    total = emb.count()
    print(f"# corpus: {total} x 64-d clustered", file=sys.stderr)

    qrows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    queries = {r["vec_id"]: [float(v) for v in r["embedding"]] for r in qrows}
    pred = F.col("label") == 3

    truth = {}
    t0 = time.time()
    for qid, qv in queries.items():
        truth[(qid, "plain")] = {
            r["vec_id"] for r in knn_exact(emb, qv, k=K, extra_cols=()).collect()
        }
        truth[(qid, "filtered")] = {
            r["vec_id"]
            for r in knn_exact(emb, qv, k=K, predicate=pred, extra_cols=()).collect()
        }
    t_exact = (time.time() - t0) / (2 * len(queries))
    print(f"# exact baseline: {t_exact:.2f}s/query", file=sys.stderr)

    # hand-tuned configuration (the existing SCALE.md rows)
    t0 = time.time()
    centroids_h, assigned_h = ivf_build(emb, n_centroids=64)
    assigned_h = assigned_h.cache()
    assigned_h.count()
    t_build_h = time.time() - t0
    print(f"# hand build (k=64, full-corpus train): {t_build_h:.1f}s",
          file=sys.stderr)
    run_queries(spark, centroids_h, assigned_h, queries, truth, 8,
                f"ivf hand-tuned @ {total}: build {t_build_h:.1f}s")

    # auto configuration
    t0 = time.time()
    centroids_a, assigned_a, nprobe_a = ivf_build_auto(emb)
    assigned_a = assigned_a.cache()
    assigned_a.count()
    t_build_a = time.time() - t0
    print(f"# auto build (k={len(centroids_a)}, sampled train): "
          f"{t_build_a:.1f}s", file=sys.stderr)
    run_queries(spark, centroids_a, assigned_a, queries, truth, nprobe_a,
                f"ivf auto @ {total}: build {t_build_a:.1f}s")

    # filtered ANN through the auto index (10% selective label filter)
    run_queries(spark, centroids_a, assigned_a, queries, truth, nprobe_a,
                f"ivf auto filtered(10%) @ {total}", predicate=pred,
                truth_key="filtered")
    spark.stop()


if __name__ == "__main__":
    main()
