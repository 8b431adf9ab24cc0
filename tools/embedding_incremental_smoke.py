"""Incremental embedding near-dup at scale: a 1M-vector corpus is
clustered ONCE (model + persisted assignments), then a 50k batch with
planted twins of corpus rows is checked via
embedding_near_dup_incremental — the continual-ingest SemDeDup shape.

What must hold: per-batch cost is O(batch x cluster density), far
below the full at-scale recompute over corpus ∪ batch, while catching
every planted corpus-twin; the corpus is never re-clustered or
self-compared.

Usage: python tools/embedding_incremental_smoke.py [n_corpus] [n_batch]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.dedup import (
    embedding_cluster_assign,
    embedding_cluster_model,
    embedding_near_dup_at_scale,
    embedding_near_dup_incremental,
)
from distributed_vector_database_spark.session import get_spark
from scale_smoke import synth_gaussian_embeddings

THRESH = 0.9


def main() -> None:
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark(app_name="dvds-emb-incr-smoke")
    # base corpus without twins (twin_every larger than n disables them)
    corpus = (
        synth_gaussian_embeddings(spark, n_corpus, twin_every=n_corpus + 1)
        .cache()
    )
    corpus.count()

    t0 = time.time()
    model = embedding_cluster_model(corpus, target_cluster_rows=4096)
    assigned = embedding_cluster_assign(corpus, model, probe=2).cache()
    n_assigned = assigned.count()
    setup_s = time.time() - t0
    print(f"# model+assign {n_corpus} rows ({n_assigned} assignments): "
          f"{setup_s:.1f}s", file=sys.stderr)

    # batch: fresh vectors + planted twins of every 20th corpus row
    n_twins = n_batch // 5
    fresh = (
        synth_gaussian_embeddings(spark, n_batch - n_twins,
                                  twin_every=n_batch + 1)
        .select((F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")
    )
    twins = (
        corpus.filter(F.col("vec_id") % 20 == 7)
        .limit(n_twins)
        .select(
            (F.col("vec_id") + 20_000_000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.lit(0.02) * (F.rand(5) - 0.5)
            ).alias("embedding"),
        )
    )
    batch = fresh.unionByName(twins).cache()
    batch.count()

    t0 = time.time()
    pairs = embedding_near_dup_incremental(
        batch, assigned, model, threshold=THRESH, probe=2
    ).cache()
    n_pairs = pairs.count()
    incr_s = time.time() - t0
    planted_found = pairs.filter(
        (F.col("id_b") >= 20_000_000)
        & (F.col("id_a") == F.col("id_b") - 20_000_000)
    ).count()

    # the comparison point: what one full recompute over the union costs
    t0 = time.time()
    full = embedding_near_dup_at_scale(
        corpus.unionByName(batch), threshold=THRESH, target_cluster_rows=4096
    )
    full_pairs = full.count()
    full_s = time.time() - t0

    print(
        f"embedding_near_dup_incremental corpus={n_corpus} batch={n_batch}: "
        f"batch pass {incr_s:.1f}s ({n_pairs} pairs, planted recall "
        f"{planted_found}/{n_twins} = {planted_found / n_twins:.4f}) vs full "
        f"union recompute {full_s:.1f}s ({full_pairs} pairs incl. "
        f"corpus-corpus); one-time model+assign {setup_s:.1f}s"
    )
    assert planted_found / n_twins >= 0.98, "planted twin recall gate"
    spark.stop()


if __name__ == "__main__":
    main()
