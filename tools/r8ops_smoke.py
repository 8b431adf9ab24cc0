"""Scale smokes for the late round-8 operators, JVM-synthesized inputs
(pattern: tools/roundops_smoke.py):

- weighted_sample: 10M rows, zipf-ish weights -> one TakeOrdered pass
- length_grouped_batches: 2M docs -> prefix-sum enumeration + one agg
- topic_keywords: 2M docs x 16 topics -> one corpus explode, then
  vocab-bounded windows
- event_percentiles (grouped_percentiles): 10M rows x 8 groups
- hard_negatives: 64 anchors x 1M labeled vectors (kernel = knn_join's)

Usage: python tools/r8ops_smoke.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from distributed_vector_database_spark.session import get_spark
from ivfpq_smoke import synth_clustered_embeddings
from scale_smoke import synth_docs


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.1f}s {out}")


def main() -> None:
    spark = get_spark(app_name="dvds-r8ops-smoke")

    rows = spark.range(10_000_000).select(
        F.col("id").alias("doc_id"),
        (1.0 + F.pmod(F.xxhash64("id"), 1000).cast("double")).alias("w"),
    )
    from distributed_vector_database_spark.operators.sampling import (
        weighted_sample,
    )

    timed(
        "weighted_sample 10M -> 100k",
        lambda: f"rows={weighted_sample(rows, 'w', 100_000, key_col='doc_id').count()}",
    )

    docs = synth_docs(spark, 2_000_000).localCheckpoint()
    from distributed_vector_database_spark.operators.textops import (
        length_grouped_batches,
        topic_keywords,
    )

    timed(
        "length_grouped_batches 2M (B=1024)",
        lambda: f"batches={length_grouped_batches(docs, batch_size=1024).count()}",
    )

    assign = docs.select(
        "doc_id", F.pmod(F.xxhash64("doc_id"), 16).cast("int").alias("topic")
    )
    timed(
        "topic_keywords 2M x 16 topics",
        lambda: f"rows={topic_keywords(docs, assign, n_terms=10).count()}",
    )

    events = spark.range(10_000_000).select(
        F.pmod(F.col("id"), 8).cast("string").alias("event_type"),
        (F.pmod(F.xxhash64("id"), 100_000) / 100.0).alias("value"),
    )
    from distributed_vector_database_spark.operators.relational import (
        grouped_percentiles,
    )

    timed(
        "grouped_percentiles 10M x 8 groups",
        lambda: f"rows={grouped_percentiles(events, 'event_type', 'value').count()}",
    )

    emb = synth_clustered_embeddings(spark, 1_000_000).select(
        "vec_id", "embedding",
        F.pmod(F.col("vec_id"), 256).cast("int").alias("label"),
    ).localCheckpoint()
    from distributed_vector_database_spark.operators.knn import hard_negatives

    anchors = emb.filter(F.col("vec_id") < 64)
    timed(
        "hard_negatives 64 anchors x 1M (k=10)",
        lambda: f"rows={hard_negatives(emb, anchors, k=10).count()}",
    )
    spark.stop()


if __name__ == "__main__":
    main()
