"""Streaming maintenance of the BM25 term-stats table.

The batch half lives in operators/lexical.py: term_stats is additive and
merge_term_stats folds a batch into the stored table at O(vocabulary).
This module is the live leg: readStream over an arriving-documents
directory, and foreachBatch merges each micro-batch's stats into a
versioned snapshot — the same versioned-fold shape as
streaming/compaction.py, with exactly-once from the streaming
checkpointLocation.

After (or during) ingest, bm25_search(stats=read_latest_stats(...))
serves queries with ONE corpus scan and a tiny stats read — the
index-maintenance story a lexical engine needs at 100 TB: stats stay
current without ever rescanning the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from distributed_vector_database_spark.operators.lexical import (
    merge_term_stats,
    term_stats,
)
from distributed_vector_database_spark.streaming.compaction import latest_version

DOCS_SCHEMA = "doc_id long, text string"


def read_latest_stats(spark: SparkSession, stats_dir: str) -> DataFrame:
    """Newest maintained term-stats snapshot."""
    v = latest_version(stats_dir)
    if v < 0:
        raise FileNotFoundError(f"no stats versions under {stats_dir}")
    return spark.read.parquet(f"{stats_dir}/v={v}")


def run_term_stats_stream(
    spark: SparkSession,
    docs_dir: str,
    stats_dir: str,
    checkpoint_dir: str,
    schema: str = DOCS_SCHEMA,
    text_col: str = "text",
    max_files_per_trigger: int | None = None,
):
    """Continuously fold arriving documents' term statistics into a
    versioned stats snapshot. Returns the StreamingQuery.

    `max_files_per_trigger` bounds micro-batch size (and lets tests force
    the multi-batch merge path); default lets availableNow drain freely."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark_ = batch.sparkSession
        fresh = term_stats(batch, text_col=text_col)
        v = latest_version(stats_dir)
        if v >= 0:
            base = spark_.read.parquet(f"{stats_dir}/v={v}")
            fresh = merge_term_stats(base, fresh)
        fresh.write.mode("overwrite").parquet(f"{stats_dir}/v={v + 1}")

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(docs_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
