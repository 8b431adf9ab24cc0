"""Streaming maintenance of the persisted HNSW graph index.

The reference inserts every put into its live hnswlib graph
(src/datanode/handler.py:253-261); the streaming analog folds each
arriving micro-batch of vectors into the hnsw_write layout via
hnsw_append: readStream over an arriving-vectors directory →
foreachBatch → per-shard graph insert. Only the shards a batch's keys
hash to are rewritten.

Replay safety under foreachBatch's at-least-once delivery: hnsw_append
records each applied batch_id as a marker and skips replays; the one
crash window (shards rewritten, marker unwritten) can duplicate a
batch's nodes in storage, but serving dedups to the best row per key —
duplicate nodes carry identical vectors, so results are unchanged and
the next rebuild drops the extra rows.

Caller contract: arriving keys should be new or re-puts; deletes flow
through the store's changelog, not the index (the live-state semi-join
in store.hnsw_search drops them at serve time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from distributed_vector_database_spark.operators.hnsw import hnsw_append

VECS_SCHEMA = "vec_id long, embedding array<double>"


def run_hnsw_stream(
    spark: SparkSession,
    vecs_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: str = VECS_SCHEMA,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int | None = None,
):
    """Continuously insert arriving vectors into an existing hnsw_write
    layout. Returns the StreamingQuery."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        hnsw_append(
            spark, index_dir, batch, key_col=key_col, vec_col=vec_col,
            batch_id=batch_id,
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(vecs_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
