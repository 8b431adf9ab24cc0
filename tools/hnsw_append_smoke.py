"""HNSW incremental maintenance at 1M vectors: build the persisted
shard layout on the base corpus, hnsw_append a batch WITHOUT any
rebuild, and measure (a) the append/merge wall cost and (b) post-
append search recall@10 against exact ground truth over the FULL
corpus (VERDICT r6 item #5).

What must hold at scale: append cost is O(affected shards) — the
batch routes to shards with the build's hash partitioning, each
affected shard reloads its graph, HnswIndex.add inserts the rows, and
only those shard partitions rewrite. Recall must NOT degrade for the
appended rows: the graph insert links them with the same Algorithm-4
neighbor selection the builder used, so a query whose true neighbors
include appended vectors still finds them (recall@10 >= 0.9 gate).

Usage: python tools/hnsw_append_smoke.py [n_total] [n_append] [shards]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.hnsw import (
    hnsw_append,
    hnsw_read_search,
    hnsw_write,
)
from distributed_vector_database_spark.operators.knn import knn_exact
from distributed_vector_database_spark.session import get_spark
from ivfpq_smoke import synth_clustered_embeddings

K = 10
N_QUERIES = 6


def main() -> None:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_append = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    shards = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark(app_name="dvds-hnsw-append-smoke")
    emb = synth_clustered_embeddings(spark, n_total).cache()
    emb.count()
    base = emb.filter(F.col("vec_id") < n_total - n_append)
    batch = emb.filter(F.col("vec_id") >= n_total - n_append)

    path = tempfile.mkdtemp(prefix="dvdb_hnsw_append_")
    t0 = time.time()
    hnsw_write(base, path, num_shards=shards)
    build_s = time.time() - t0
    print(f"# base build {n_total - n_append} rows: {build_s:.1f}s",
          file=sys.stderr)

    t0 = time.time()
    hnsw_append(spark, path, batch)
    append_s = time.time() - t0

    # queries whose TRUE neighbor sets must now include appended rows:
    # half the probes are appended vectors themselves
    qrows = (
        emb.filter((F.col("vec_id") % (n_total // N_QUERIES)) == 3)
        .limit(N_QUERIES)
        .collect()
    )
    queries = {r["vec_id"]: [float(v) for v in r["embedding"]] for r in qrows}
    ap = (
        batch.filter((F.col("vec_id") % 97) == 11).limit(N_QUERIES // 2).collect()
    )
    for r in ap:
        queries[r["vec_id"]] = [float(v) for v in r["embedding"]]

    hits, denom, t0 = 0, 0, time.time()
    for qid, qv in queries.items():
        truth = {
            r["vec_id"] for r in knn_exact(emb, qv, k=K, extra_cols=()).collect()
        }
        got = {
            r["vec_id"]
            for r in hnsw_read_search(spark, path, qv, k=K, ef=96).collect()
        }
        hits += len(got & truth)
        denom += K
    per_q = (time.time() - t0) / len(queries) / 2  # half the loop is exact scan
    recall = hits / denom
    print(
        f"hnsw_append n_base={n_total - n_append} n_append={n_append} "
        f"shards={shards}: append/merge {append_s:.1f}s "
        f"({n_append / max(append_s, 1e-9):.0f} rows/s, no rebuild), "
        f"post-append recall@{K}={recall:.3f} over {len(queries)} queries "
        f"(incl. appended-vector probes), serve ~{per_q:.2f} s/query; "
        f"base build {build_s:.1f}s"
    )
    assert recall >= 0.9, f"recall gate failed: {recall}"
    spark.stop()


if __name__ == "__main__":
    main()
