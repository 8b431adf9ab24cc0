"""Numpy-HNSW at scale: shard-parallel graph build + beam search over a
200k x 64-d clustered corpus (same generator as the IVF/PQ smokes),
recall@10 vs knn_exact ground truth.

What this measures: the distributed shape (one graph per shard, built
in parallel inside mapInPandas, ≤2k candidate rows leaving each shard)
and the algorithm's recall. The per-row build constant of the pure-
Python kernel (~1.8 ms/row) is interpreter-bound — hnswlib's native
build is ~30x faster per row — so the wall number here prices the
sandbox stand-in, not the algorithm; on a cluster with hnswlib the
kernel body swaps out and the plan/shuffle shape (what this repo owns)
is unchanged.

Usage: python tools/hnsw_smoke.py [n_vec] [n_shards]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from distributed_vector_database_spark.operators.hnsw import hnsw_partition_topk
from distributed_vector_database_spark.operators.knn import knn_exact
from distributed_vector_database_spark.session import get_spark
from ivfpq_smoke import synth_clustered_embeddings

K = 10
N_QUERIES = 4


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(app_name="dvds-hnsw-smoke")
    emb = synth_clustered_embeddings(spark, n).cache()
    emb.count()

    queries = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in emb.filter((emb.vec_id % (n // N_QUERIES)) == 17).limit(N_QUERIES).collect()
    }

    truth, t0 = {}, time.time()
    for qid, qv in queries.items():
        truth[qid] = {
            r["vec_id"] for r in knn_exact(emb, qv, k=K, extra_cols=()).collect()
        }
    exact_per_q = (time.time() - t0) / len(queries)
    print(f"# knn_exact: {exact_per_q:.2f} s/query", file=sys.stderr)

    hits, t0 = 0, time.time()
    for qid, qv in queries.items():
        got = {
            r["vec_id"]
            for r in hnsw_partition_topk(
                emb, qv, k=K, m=16, ef=64, num_shards=shards
            ).collect()
        }
        hits += len(got & truth[qid])
    per_q = (time.time() - t0) / len(queries)
    recall = hits / (K * len(queries))
    print(
        f"hnsw_partition_topk n={n} shards={shards}: {per_q:.1f} s/query "
        f"(build+search, graphs rebuilt per call), recall@{K}={recall:.3f}; "
        f"exact scan {exact_per_q:.2f} s/query"
    )

    # build ONCE, serve many — the reference's actual lifecycle
    import tempfile

    from distributed_vector_database_spark.operators.hnsw import (
        hnsw_knn_join,
        hnsw_read_search,
        hnsw_write,
    )

    path = tempfile.mkdtemp(prefix="hnsw_idx_") + "/idx"
    t0 = time.time()
    hnsw_write(emb, path, num_shards=shards, m=16)
    build_s = time.time() - t0
    hits, t0 = 0, time.time()
    for qid, qv in queries.items():
        got = {
            r["vec_id"]
            for r in hnsw_read_search(spark, path, qv, k=K, ef=64).collect()
        }
        hits += len(got & truth[qid])
    serve_q = (time.time() - t0) / len(queries)
    print(
        f"hnsw_write+read_search n={n} shards={shards}: build-once {build_s:.1f} s, "
        f"then {serve_q:.2f} s/query served from the persisted graph, "
        f"recall@{K}={hits / (K * len(queries)):.3f}"
    )

    # incremental insert: a 10k batch joins the existing 200k graph —
    # O(affected shards) rewrite, no rebuild
    from distributed_vector_database_spark.operators.hnsw import hnsw_append

    batch = synth_clustered_embeddings(spark, 10_000).selectExpr(
        "vec_id + 1000000000 AS vec_id", "embedding"
    )
    t0 = time.time()
    hnsw_append(spark, path, batch)
    append_s = time.time() - t0
    hits, t0 = 0, time.time()
    for qid, qv in queries.items():
        got = {
            r["vec_id"]
            for r in hnsw_read_search(spark, path, qv, k=K, ef=64).collect()
        }
        hits += len(got & truth[qid])
    print(
        f"hnsw_append 10k into {n}: {append_s:.1f} s; post-append serving "
        f"{(time.time() - t0) / len(queries):.2f} s/query, "
        f"recall@{K}={hits / (K * len(queries)):.3f}"
    )

    # ANN k-NN JOIN: graph built once per shard, every query reuses it
    nq = 64
    qdf = (
        emb.filter((emb.vec_id % 997) == 1)
        .limit(nq)
        .selectExpr("vec_id AS query_id", "embedding AS query_vec")
        .cache()
    )
    nq = qdf.count()
    t0 = time.time()
    n_res = hnsw_knn_join(qdf, emb, k=K, ef=64, num_shards=shards).count()
    join_s = time.time() - t0
    print(
        f"hnsw_knn_join {nq} queries x {n}: {join_s:.1f} s total "
        f"({join_s / nq:.2f} s/query amortized), {n_res} result rows"
    )

    # same join served from the persisted graphs: zero construction
    t0 = time.time()
    n_res = hnsw_knn_join(qdf, k=K, ef=64, index_path=path).count()
    served_s = time.time() - t0
    print(
        f"hnsw_knn_join (index_path) {nq} queries: {served_s:.1f} s total "
        f"({served_s / nq:.2f} s/query, construction already paid), "
        f"{n_res} result rows"
    )


if __name__ == "__main__":
    main()
