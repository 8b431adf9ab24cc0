"""Reference-format WAL ingestion: read the JSON-lines write-ahead log
the reference engine writes on disk, as a change-log DataFrame.

The reference's WAL entry is one JSON object per line —
`{op_type, key, vector, metadata, timestamp, node_id}` with epoch-millis
timestamps (src/utils/wal_manager.py:90-105, rolling 10 MB files) — and
recovery replays files in name order with last-op-per-key-wins
(src/utils/wal_manager.py:116-182). A user migrating from the reference
points this reader at their `wal/` directory and gets the same state
via operators.changelog.compact.

Scale shape: spark.read.json with an EXPLICIT schema — never schema
inference, which is a full extra pass over 100 TB of logs. One file =
one-or-more partitions, embarrassingly parallel; the downstream
compaction is the usual single hash shuffle on key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# src/utils/wal_manager.py:91-98 — field-for-field
WAL_SCHEMA = T.StructType(
    [
        T.StructField("op_type", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("vector", T.ArrayType(T.DoubleType())),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("timestamp", T.LongType()),
        T.StructField("node_id", T.StringType()),
    ]
)


def read_wal_json(spark: SparkSession, path: str) -> DataFrame:
    """Read reference WAL JSON-lines file(s)/dir into the engine's
    change-log shape: (op, key, vector, metadata, ts, seq).

    `ts` is the entry's epoch-millis as a TIMESTAMP; `seq` is a
    within-log monotone tiebreaker reproducing the reference's
    line-order replay semantics (later line wins on equal timestamps —
    its replay overwrites a dict in read order,
    src/utils/wal_manager.py:131-151). monotonically_increasing_id is
    (partition << 33) + row-in-partition, so it orders lines within a
    file split exactly and across splits by file order — the same
    guarantee the reference has (per-node log files replayed in name
    order)."""
    raw = spark.read.schema(WAL_SCHEMA).json(path)
    return raw.select(
        F.col("op_type").alias("op"),
        "key",
        "vector",
        "metadata",
        F.timestamp_millis(F.col("timestamp")).alias("ts"),
        F.monotonically_increasing_id().alias("seq"),
    )


def write_wal_json(log: DataFrame, path: str) -> None:
    """Write a change-log DataFrame back out in the reference's WAL
    JSON-lines format (the reverse migration / interop path). One JSON
    object per line, reference field names, epoch-millis timestamps."""
    log.select(
        F.col("op").alias("op_type"),
        "key",
        "vector",
        "metadata",
        F.unix_millis(F.col("ts")).alias("timestamp"),
        F.lit("spark").alias("node_id"),
    ).write.mode("overwrite").json(path)
