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

from pyspark.sql import DataFrame, SparkSession, Window
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

    `ts` is the entry's epoch-millis as a TIMESTAMP; `seq` totally
    orders entries by (file name asc, byte offset within file) —
    exactly the reference's replay order (files replayed in sorted name
    order, lines replayed top-to-bottom, dict overwrite so the last
    line wins; src/utils/wal_manager.py:116-182).

    seq construction (no shuffle of the log itself): Spark packs input
    files into partitions by SIZE descending, so partition numbering —
    and therefore bare monotonically_increasing_id — does NOT follow
    file-name order when the log has several rolled ~10 MB files. We
    instead rank each (file_path, block_start) split via the _metadata
    column (a tiny distinct list, broadcast back), and combine
    `split_rank << 33 | row-within-partition`: rows of one split are
    contiguous within their scan partition, so the low 33 bits of
    monotonically_increasing_id strictly increase in line order inside
    the split, and the rank orders splits across files/blocks.

    Divergence note (deliberate): downstream `compact` resolves
    last-write-wins by (ts, seq) — timestamp FIRST — whereas the
    reference ignores timestamps entirely and keeps the last line
    replayed. For WAL entries whose timestamps are consistent with
    append order (the reference always stamps now(), so in practice
    they are) the two agree; an explicitly BACKDATED later entry wins
    in the reference but loses here. For bit-exact reference replay
    order, compact on seq alone: `compact(log, key_col="key",
    ts_col="seq", seq_col="seq")` — seq fully encodes the reference's
    file+line order."""
    raw = (
        spark.read.schema(WAL_SCHEMA)
        .json(path)
        .select(
            "*",
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.file_block_start").alias("_bs"),
            F.monotonically_increasing_id().alias("_rid"),
        )
    )
    # one row per scan split; ranking this driver-size list is the only
    # single-partition step, then it broadcasts back onto the log scan
    splits = raw.select("_fp", "_bs").distinct()
    ranked = splits.select(
        "_fp",
        "_bs",
        (F.row_number().over(Window.orderBy("_fp", "_bs")) - 1).alias(
            "_split_rank"
        ),
    )
    return (
        raw.join(F.broadcast(ranked), ["_fp", "_bs"])
        .select(
            F.col("op_type").alias("op"),
            "key",
            "vector",
            "metadata",
            F.timestamp_millis(F.col("timestamp")).alias("ts"),
            (
                F.shiftleft(F.col("_split_rank").cast("long"), 33)
                + F.col("_rid").bitwiseAND(F.lit((1 << 33) - 1))
            ).alias("seq"),
        )
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
