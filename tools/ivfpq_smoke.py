"""IVF-PQ at 1M+: the one ANN composition without a SCALE.md row.

Builds the full FAISS-IndexIVFPQ(+refine)-shaped plan on a 1.1M x 64-d
gaussian corpus (generated JVM-side, no files): MLlib-KMeans coarse
quantizer -> per-subspace PQ codebooks (bounded 50k-sample train) ->
pq_encode over the assigned corpus -> ivf_pq_search (probe-pruned ADC
scan + exact re-rank). Reports wall time per query and recall@10
against knn_exact ground truth on the same corpus.

Usage: python tools/ivfpq_smoke.py [n_vec]   (default 1_000_000 base
+ 100k planted twins = 1.1M rows)
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
    ivf_pq_search,
    pq_encode,
    pq_train,
)
from distributed_vector_database_spark.session import get_spark
from scale_smoke import synth_gaussian_embeddings

N_QUERIES = 8
K = 10


def synth_clustered_embeddings(spark, n, dim=64, n_clusters=256, spread=0.35):
    """Mixture-of-gaussians corpus — the structure real embedding spaces
    have (and the structure IVF exists to exploit; an isotropic gaussian
    is the known IVF-adversarial case where neighbors sit in random
    directions and recall is bounded by probe coverage). Cluster center
    components are deterministic hash-normals, points = center + spread *
    noise, all JVM-side."""
    import math

    def z(x_col, salt):
        u1 = (F.pmod(F.xxhash64(x_col, F.lit(2 * salt)), 1_000_000) + 0.5) / 1e6
        u2 = (F.pmod(F.xxhash64(x_col, F.lit(2 * salt + 1)), 1_000_000) + 0.5) / 1e6
        return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)

    cid = F.pmod(F.col("id"), n_clusters)
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                z(cid, 7000 + i) + spread * z(F.col("id") + 1_000_000_007, i)
                for i in range(dim)
            ]
        ).alias("embedding"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    shape = sys.argv[2] if len(sys.argv) > 2 else "clustered"
    spark = get_spark(app_name="dvds-ivfpq-smoke")
    gen = (
        synth_clustered_embeddings if shape == "clustered" else synth_gaussian_embeddings
    )
    emb = gen(spark, n).cache()
    total = emb.count()
    print(f"# corpus: {total} x 64-d ({shape})", file=sys.stderr)

    t0 = time.time()
    centroids, assigned = ivf_build(emb, n_centroids=64)
    books = pq_train(assigned, m=8, k_codebook=64)
    encoded = assigned.select("vec_id", "embedding", "centroid_id")
    encoded = pq_encode(encoded, books).cache()
    encoded.count()
    t_build = time.time() - t0
    print(f"# build (kmeans + codebooks + encode): {t_build:.1f}s", file=sys.stderr)

    qrows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    queries = {r["vec_id"]: [float(v) for v in r["embedding"]] for r in qrows}

    truth = {}
    t0 = time.time()
    for qid, qv in queries.items():
        truth[qid] = {
            r["vec_id"] for r in knn_exact(emb, qv, k=K, extra_cols=()).collect()
        }
    t_exact = (time.time() - t0) / len(queries)

    for nprobe in (8, 16):
        hits, t0 = 0, time.time()
        for qid, qv in queries.items():
            got = {
                r["vec_id"]
                for r in ivf_pq_search(
                    centroids, encoded, books, qv, k=K, nprobe=nprobe, rerank=16
                ).collect()
            }
            hits += len(got & truth[qid])
        t_approx = (time.time() - t0) / len(queries)
        recall = hits / (K * len(queries))
        print(
            f"ivf_pq_search @ {total} ({shape}): build {t_build:.1f}s, "
            f"{t_approx:.2f}s/query (exact {t_exact:.2f}s/query), "
            f"recall@{K} {recall:.4f} over {len(queries)} queries "
            f"(nprobe={nprobe}/64, m=8, k*=64, rerank=16)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
