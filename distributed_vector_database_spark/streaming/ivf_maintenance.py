"""Streaming maintenance of the persisted IVF layout — the put/delete
changelog replay hnsw_maintenance.py provides for the graph index,
for the partition-pruned IVF one (the reference's WAL-to-index path,
src/datanode/handler.py:253-261, applied to a quantizer layout the
reference doesn't have).

Semantics per micro-batch: newest op per key wins (changelog
compaction); puts upsert via ivf_append (assign against the existing
quantizer, append files into affected cells only — re-put keys
physically replaced), deletes remove rows physically via ivf_delete
(partition-local rewrite; no tombstones, no serve-time filtering, no
compaction debt — IVF's advantage over the graph index).

Replay safety: ivf_append's upsert pre-delete makes the put leg
idempotent even across its crash window (appended files without a
marker are replaced on replay); ivf_delete of already-removed keys
removes nothing. The quantizer is FROZEN at build time — the standard
IVF practice; drift in the data distribution degrades cell balance,
not correctness (every vector still lands in exactly one cell), and
the repair path is an ivf_build_auto rebuild."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.ann import (
    ivf_append,
    ivf_delete,
)

CHANGELOG_SCHEMA = "seq long, op string, vec_id long, embedding array<double>"


def build_ivf_changelog_fold(
    index_dir: str,
    centroids: list,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    op_col: str = "op",
    seq_col: str = "seq",
):
    """foreachBatch body replaying a put/delete changelog into the
    persisted IVF layout."""
    from pyspark.sql.window import Window

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark_ = batch.sparkSession
        w = Window.partitionBy(key_col).orderBy(F.desc(seq_col))
        last = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # a malformed put carrying a null vector would crash
        # ivf_assign's np.stack executor-side and kill the stream —
        # drop it here (the HNSW twin filters inside hnsw_append)
        puts = (
            last.filter(F.col(op_col) == "put")
            .filter(F.col(vec_col).isNotNull())
            .drop(op_col, seq_col)
        )
        dels = [
            r[key_col]
            for r in last.filter(F.col(op_col) == "delete")
            .select(key_col)
            .collect()
        ]
        if puts.limit(1).count() > 0:
            ivf_append(
                spark_, index_dir, puts, centroids,
                key_col=key_col, vec_col=vec_col, batch_id=batch_id,
            )
        if dels:
            ivf_delete(spark_, index_dir, dels, key_col=key_col)

    return fold


def run_ivf_changelog_stream(
    spark: SparkSession,
    changelog_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    centroids: list,
    schema: str = CHANGELOG_SCHEMA,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int | None = None,
):
    """Continuously replay an arriving put/delete changelog into an
    existing ivf_write layout. Returns the StreamingQuery."""
    fold = build_ivf_changelog_fold(
        index_dir, centroids, key_col=key_col, vec_col=vec_col
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(changelog_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
