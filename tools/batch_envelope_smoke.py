"""Batch-serving envelope: plan-size growth vs batch size (VERDICT r8 #3).

Two batched servers, two growth regimes:

- bm25_batch_search: per-query membership can enter the plan as
  LITERALS (create_map of term -> [query ids] + isin(all_terms)) or as
  a broadcast (term, query_id) JOIN. The literal plan grows with
  total memberships, and Catalyst analysis cost follows plan size —
  this smoke measures where the knee is and that the join path stays
  flat. Both paths' results are parity-pinned in tests.

- ivf_batch_search: membership never enters the plan — probe sets ride
  in the mapInPandas closure; the only plan literal is the UNION of
  probe cells, bounded by n_centroids regardless of Q. This smoke
  demonstrates Q=1024 runs with the same plan shape as Q=16.

Usage: python tools/batch_envelope_smoke.py [n_docs]   (default 200_000)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from distributed_vector_database_spark.operators.ann import (
    ivf_batch_search,
    ivf_build_auto,
)
from distributed_vector_database_spark.operators.lexical import (
    bm25_batch_search,
    postings_write,
)
from distributed_vector_database_spark.session import get_spark
from scale_smoke import synth_docs, synth_embeddings


def _queries(nq: int, vocab: int = 1000, terms_per_q: int = 3) -> dict:
    # deterministic spread over the zipf-ish synthetic vocab
    return {
        f"q{i}": [
            f"tok{(i * 7 + j * 131) % vocab}" for j in range(terms_per_q)
        ]
        for i in range(nq)
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="dvds-batch-envelope-smoke")

    docs = synth_docs(spark, n).cache()
    docs.count()
    idx = tempfile.mkdtemp(prefix="dvdb_envelope_idx_")
    postings_write(docs, idx, n_buckets=64)

    print(f"== bm25_batch_search over {n} docs ==")
    for nq in (16, 256, 1024):
        batch = _queries(nq)
        for mode in ("literal", "join"):
            t0 = time.time()
            df = bm25_batch_search(spark, idx, batch, k=10, membership=mode)
            t_plan = time.time() - t0
            t0 = time.time()
            rows = df.count()
            t_exec = time.time() - t0
            print(
                f"  Q={nq:5d} {mode:7s}: plan {t_plan:6.2f}s "
                f"exec {t_exec:6.2f}s rows {rows}"
            )

    emb = synth_embeddings(spark, n, dim=32).cache()
    emb.count()
    centroids, assigned, nprobe = ivf_build_auto(emb)
    assigned = assigned.cache()
    assigned.count()
    qdf_all = emb.selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    ).limit(1024).cache()
    qdf_all.count()

    print(f"== ivf_batch_search over {n} vectors "
          f"({len(centroids)} cells, nprobe {nprobe}) ==")
    for nq in (16, 256, 1024):
        qdf = qdf_all.limit(nq)
        t0 = time.time()
        df = ivf_batch_search(
            spark, centroids, assigned, qdf, k=5, nprobe=nprobe
        )
        t_plan = time.time() - t0
        t0 = time.time()
        rows = df.count()
        t_exec = time.time() - t0
        print(
            f"  Q={nq:5d} closure : plan {t_plan:6.2f}s "
            f"exec {t_exec:6.2f}s rows {rows}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
