"""Served tri-hybrid retrieval at 2M docs (VERDICT r8 #4).

The three legs individually smoked in earlier rounds fuse here as the
full serving stack, everything answered from PERSISTED layouts:
- lexical: BM25 from the bucketed postings index (partition-pruned to
  the query terms' buckets),
- learned-sparse: sparse dot product from the SAME postings layout,
- dense: IVF probe over the centroid-partitioned layout with its
  persisted quantizer,
fused with one N-way reciprocal-rank fusion. The corpus is never
scanned at query time; per-probe cost is posting-bucket reads +
nprobe cell reads + bounded-row fusion windows.

Usage: python tools/tri_hybrid_smoke.py [n_docs]   (default 2_000_000)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from distributed_vector_database_spark.operators.ann import (
    ivf_build_auto,
    ivf_read_search,
    ivf_write,
)
from distributed_vector_database_spark.operators.lexical import (
    bm25_postings_search,
    hybrid_rrf_multi,
    postings_write,
    sparse_dot_search,
)
from distributed_vector_database_spark.session import get_spark
from scale_smoke import synth_docs, synth_embeddings


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(app_name="dvds-tri-hybrid-smoke")

    docs = synth_docs(spark, n).cache()
    docs.count()
    emb = synth_embeddings(spark, n, dim=32).cache()
    emb.count()
    qvec = [
        float(x)
        for x in emb.filter("vec_id = 7").select("embedding").first()[0]
    ]

    tmp = tempfile.mkdtemp(prefix="dvdb_trihybrid_")
    t0 = time.time()
    postings_write(docs, f"{tmp}/postings", n_buckets=64)
    t_postings = time.time() - t0
    t0 = time.time()
    centroids, assigned, nprobe = ivf_build_auto(emb)
    ivf_write(assigned, f"{tmp}/ivf", centroids=centroids)
    t_ivf = time.time() - t0
    docs.unpersist()
    emb.unpersist()

    terms = ["tok31", "tok415", "tok92"]
    sparse_qw = {"tok31": 1.0, "tok415": 0.7, "tok92": 0.4}

    def probe() -> int:
        lex = bm25_postings_search(spark, f"{tmp}/postings", terms, k=30)
        sp = sparse_dot_search(spark, f"{tmp}/postings", sparse_qw, k=30)
        vec = ivf_read_search(
            spark, f"{tmp}/ivf", qvec, k=30, nprobe=nprobe
        ).withColumnRenamed("vec_id", "doc_id")
        return hybrid_rrf_multi(
            [(lex, False), (vec, True), (sp, False)], k=10
        ).count()

    best = None
    for _ in range(3):
        t0 = time.time()
        rows = probe()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(
        f"n={n} postings_build {t_postings:.1f}s ivf_build {t_ivf:.1f}s "
        f"({len(centroids)} cells, nprobe {nprobe}); "
        f"tri_hybrid_served_probe best-of-3 {best:.2f}s rows={rows}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
