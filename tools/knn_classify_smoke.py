"""k-NN label propagation at scale: 100k unlabeled queries against a
1M labeled corpus through the use_ivf (shared-coarse-quantizer) path —
the classifier-bootstrapping shape at the size where the broadcast
path's query-side guard would refuse.

Ground truth is free: synth_clustered_embeddings draws point i from
cluster (i mod n_clusters), so the generating cluster id IS the label.
The corpus keeps its labels; queries are fresh points from the same
mixture with labels hidden. Reported: wall time, coverage (every query
classified), accuracy of the majority vote vs the generating cluster.

Usage: python tools/knn_classify_smoke.py [n_corpus] [n_queries]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.ann import knn_classify
from distributed_vector_database_spark.session import get_spark
from ivfpq_smoke import synth_clustered_embeddings

N_CLUSTERS = 256


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark(app_name="dvds-knn-classify-smoke")
    # corpus: ids [0, n) labeled by generating cluster; queries: ids
    # [n, n+nq) — same mixture (id mod 256), labels withheld
    all_rows = synth_clustered_embeddings(spark, n + nq, n_clusters=N_CLUSTERS)
    corpus = (
        all_rows.filter(F.col("vec_id") < n)
        .withColumn("label", (F.col("vec_id") % N_CLUSTERS).cast("int"))
        .localCheckpoint()
    )
    queries = (
        all_rows.filter(F.col("vec_id") >= n)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .localCheckpoint()
    )

    t0 = time.time()
    pred = knn_classify(
        queries,
        corpus,
        k=5,
        use_ivf=True,
        target_cluster_rows=4096,
        nprobe=2,
    ).localCheckpoint()
    n_pred = pred.count()
    el = time.time() - t0
    acc_row = (
        pred.withColumn(
            "truth", (F.col("query_id") % N_CLUSTERS).cast("int")
        )
        .agg(
            F.avg((F.col("pred_label") == F.col("truth")).cast("double")).alias("acc"),
            F.avg("confidence").alias("mean_conf"),
        )
        .first()
    )
    print(
        f"knn_classify use_ivf: {nq} queries x {n} labeled corpus in "
        f"{el:.1f}s; coverage {n_pred}/{nq}; accuracy vs generating "
        f"cluster {acc_row['acc']:.4f}; mean confidence "
        f"{acc_row['mean_conf']:.3f}"
    )
    assert n_pred == nq, "every query must receive a label"
    assert acc_row["acc"] > 0.95, "cluster structure should be recoverable"
    spark.stop()
    print("KNN CLASSIFY SMOKE PASS")


if __name__ == "__main__":
    main()
