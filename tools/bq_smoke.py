"""Binary quantization at 1M vectors: Hamming candidate generation
over 1-bit codes (2 bigint words per 64-d row = 32x compression),
exact refine of the pool — flat and IVF-composed.

Reported per config: build time (means + codegen encode), serve time
per query, recall@10 vs knn_exact. The flat tier ranks the WHOLE
corpus by Hamming (codes-only scan, still no float reads); the IVF
tier prunes to nprobe cells first — the 100 TB serving shape.

Usage: python tools/bq_smoke.py [n] [shape]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.ann import ivf_build
from distributed_vector_database_spark.operators.knn import knn_exact
from distributed_vector_database_spark.operators.quantization import (
    bq_encode,
    bq_search,
    bq_train,
    ivf_bq_search,
)
from distributed_vector_database_spark.session import get_spark
from ivfpq_smoke import synth_clustered_embeddings
from scale_smoke import synth_gaussian_embeddings

K = 10
N_QUERIES = 6


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    shape = sys.argv[2] if len(sys.argv) > 2 else "clustered"
    spark = get_spark(app_name="dvds-bq-smoke")
    gen = (
        synth_clustered_embeddings
        if shape == "clustered"
        else synth_gaussian_embeddings
    )
    emb = gen(spark, n).cache()
    total = emb.count()

    t0 = time.time()
    means = bq_train(emb)
    centroids, assigned = ivf_build(emb, n_centroids=64)
    encoded = bq_encode(assigned, means).cache()
    encoded.count()
    t_build = time.time() - t0

    qrows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    queries = {r["vec_id"]: [float(v) for v in r["embedding"]] for r in qrows}
    truth = {}
    t0 = time.time()
    for qid, qv in queries.items():
        truth[qid] = {
            r["vec_id"]
            for r in knn_exact(emb, qv, k=K, extra_cols=()).collect()
        }
    t_exact = (time.time() - t0) / len(queries)

    for label, fn in (
        (
            "bq_search rerank=32",
            lambda qv: bq_search(encoded, means, qv, k=K, rerank=32),
        ),
        (
            "ivf_bq_search nprobe=16 rerank=32",
            lambda qv: ivf_bq_search(
                centroids, encoded, means, qv, k=K, nprobe=16, rerank=32
            ),
        ),
    ):
        hits, t0 = 0, time.time()
        for qid, qv in queries.items():
            got = {r["vec_id"] for r in fn(qv).collect()}
            hits += len(got & truth[qid])
        t_q = (time.time() - t0) / len(queries)
        recall = hits / (K * len(queries))
        print(
            f"{label} @ {total} ({shape}): build {t_build:.1f}s, "
            f"{t_q:.2f}s/query (exact {t_exact:.2f}s/query), "
            f"recall@{K} {recall:.4f} over {len(queries)} queries"
        )
    spark.stop()


if __name__ == "__main__":
    main()
