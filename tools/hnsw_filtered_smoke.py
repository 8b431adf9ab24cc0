"""Filtered HNSW serving at 200k vectors: build the persisted shard
layout with a metadata column, serve label-filtered queries, and
measure (a) filtered-probe cost vs the unfiltered probe and (b)
recall@10 against exact filtered brute force.

What must hold at scale: the predicate masks nodes INSIDE each shard
(the graph keeps its adjacency; Catalyst evaluates the predicate in
the scan, the kernel only sees a boolean) and the beam fetch widens by
the shard's masked count — so a selectivity-s filter costs about the
unfiltered probe plus the wider beam, never a rebuild or a
filter-after-search recall loss.

Usage: python tools/hnsw_filtered_smoke.py [n] [shards] [n_labels]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.hnsw import (
    hnsw_read_search,
    hnsw_write,
)
from distributed_vector_database_spark.operators.knn import knn_exact
from distributed_vector_database_spark.session import get_spark
from ivfpq_smoke import synth_clustered_embeddings

K = 10
N_QUERIES = 6


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_labels = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark(app_name="dvds-hnsw-filtered-smoke")
    emb = (
        synth_clustered_embeddings(spark, n)
        .withColumn("label", (F.col("vec_id") % n_labels).cast("int"))
        .cache()
    )
    emb.count()

    path = tempfile.mkdtemp(prefix="dvdb_hnsw_filt_")
    t0 = time.time()
    hnsw_write(emb, path, num_shards=shards, extra_cols=("label",))
    build_s = time.time() - t0
    print(f"# build {n} rows / {shards} shards (+label): {build_s:.1f}s",
          file=sys.stderr)

    qrows = emb.filter((F.col("vec_id") % 33331) == 7).limit(N_QUERIES).collect()
    pred = F.col("label") == 2
    filtered = emb.filter(pred).cache()
    filtered.count()

    hits = denom = 0
    t_filt = t_unfilt = 0.0
    for r in qrows:
        qv = [float(v) for v in r["embedding"]]
        t0 = time.time()
        got = {
            x["vec_id"]
            for x in hnsw_read_search(
                spark, path, qv, k=K, ef=96, predicate=pred
            ).collect()
        }
        t_filt += time.time() - t0
        t0 = time.time()
        hnsw_read_search(spark, path, qv, k=K, ef=96).collect()
        t_unfilt += time.time() - t0
        truth = {
            x["vec_id"]
            for x in knn_exact(filtered, qv, k=K, extra_cols=()).collect()
        }
        hits += len(got & truth)
        denom += K
    recall = hits / denom
    print(
        f"hnsw_filtered n={n} shards={shards} selectivity=1/{n_labels}: "
        f"filtered probe {t_filt / N_QUERIES:.2f} s/query vs unfiltered "
        f"{t_unfilt / N_QUERIES:.2f} s/query, recall@{K}={recall:.3f} vs "
        f"exact filtered brute force; build {build_s:.1f}s"
    )
    assert recall >= 0.9, f"recall gate failed: {recall}"
    spark.stop()


if __name__ == "__main__":
    main()
