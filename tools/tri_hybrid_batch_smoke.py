"""Batched tri-hybrid retrieval at 2M docs x 64 queries (VERDICT r9
#7): the fused batch stack — bm25_batch_search + sparse_dot_batch_
search (one postings layout) + ivf_batch_search (one IVF layout) +
hybrid_rrf_batch — served as THREE pruned scans + one fusion plan,
regardless of Q.

The single-query served stack smokes at ~6.3 s per probe
(tools/tri_hybrid_smoke.py); the batch claim is amortization: 64
queries must cost far less than 64 probes, because each leg pays one
scan open + one prune for the whole batch (postings pruned to the
UNION of the batch's terms, IVF to the union of probe cells), with
per-query membership applied after the shared slice.

Usage: python tools/tri_hybrid_batch_smoke.py [n_docs] [n_queries]
       (defaults 2_000_000, 64)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.ann import (
    ivf_batch_search,
    ivf_build_auto,
)
from distributed_vector_database_spark.operators.lexical import (
    bm25_batch_search,
    hybrid_rrf_batch,
    postings_write,
    sparse_dot_batch_search,
)
from distributed_vector_database_spark.session import get_spark
from scale_smoke import synth_docs, synth_embeddings


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="dvds-tri-hybrid-batch-smoke")

    docs = synth_docs(spark, n).cache()
    docs.count()
    emb = synth_embeddings(spark, n, dim=32).cache()
    emb.count()

    tmp = tempfile.mkdtemp(prefix="dvdb_trihybrid_batch_")
    t0 = time.time()
    postings_write(docs, f"{tmp}/postings", n_buckets=64)
    t_postings = time.time() - t0
    t0 = time.time()
    centroids, assigned, nprobe = ivf_build_auto(emb)
    assigned = assigned.localCheckpoint()
    t_ivf = time.time() - t0
    docs.unpersist()

    # 64 distinct 3-term lexical queries + 3-term weighted sparse
    # queries over the synthetic vocab, and 64 dense query vectors
    # drawn from the corpus itself
    terms = {
        f"q{i:02d}": [f"tok{31 + 7 * i}", f"tok{415 - 3 * i}", f"tok{92 + i}"]
        for i in range(n_q)
    }
    sparse = {
        qid: {t: w for t, w in zip(ts, (1.0, 0.7, 0.4))}
        for qid, ts in terms.items()
    }
    qdf = (
        emb.filter(F.col("vec_id") < n_q)
        .select(
            F.concat(
                F.lit("q"), F.lpad(F.col("vec_id").cast("string"), 2, "0")
            ).alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .localCheckpoint()
    )
    emb.unpersist()

    def probe() -> int:
        lex = bm25_batch_search(spark, f"{tmp}/postings", terms, k=30)
        sp = sparse_dot_batch_search(spark, f"{tmp}/postings", sparse, k=30)
        dense = ivf_batch_search(
            spark, centroids, assigned, qdf, k=30, nprobe=nprobe
        ).withColumnRenamed("vec_id", "doc_id")
        return hybrid_rrf_batch([lex, dense, sp], k=10).count()

    best = None
    for _ in range(3):
        t0 = time.time()
        rows = probe()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    per_q = best / n_q
    print(
        f"n={n} Q={n_q} postings_build {t_postings:.1f}s ivf_build "
        f"{t_ivf:.1f}s ({len(centroids)} cells, nprobe {nprobe}); "
        f"tri_hybrid_batch probe best-of-3 {best:.2f}s "
        f"({per_q * 1000:.0f} ms/query, {rows} fused rows)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
