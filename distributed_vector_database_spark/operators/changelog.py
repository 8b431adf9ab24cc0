"""Change-log state semantics: upsert / delete / compaction / recovery.

The reference mutates per-node state in place (HNSW insert + LevelDB put
+ soft-delete set + WAL append, src/datanode/handler.py:222-342) and
recovers by replaying the WAL with last-op-per-key-wins
(src/utils/wal_manager.py:116-246). In an immutable engine every
mutation becomes a row in an append-only change-log and "current state"
is a pure expression over it:

- upsert (O1, src/datanode/handler.py:222-320)  -> PUT row, newer ts wins
- delete (O2, src/datanode/handler.py:323-342)  -> DELETE tombstone row
- WAL full replay (O11, src/utils/wal_manager.py:116-182) -> compact()
- WAL incremental replay (O12, :185-246)        -> compact(since_ts=...)
- checkpoint save/load (O13, src/datanode/handler.py:156-219)
                                                -> snapshot parquet write
- index rebuild / tombstone GC (O14, :91-120)   -> the same compaction,
  rewriting the base without deleted rows

Scale notes: compaction is one hash shuffle on `key` + a window — the
canonical log-compaction plan. At 100 TB the change-log is tiny relative
to the base snapshot, so `apply_changelog` shuffles only the log and
left-anti/unions against the base; partial aggregation and AQE handle
skewed keys. No driver-side state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

OP_PUT = "PUT"
OP_DELETE = "DELETE"


def latest_per_key(
    log: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    seq_col: str | None = None,
) -> DataFrame:
    """Last op per key (the WAL-replay dedup,
    src/utils/wal_manager.py:131-151, where later entries overwrite
    earlier ones in a dict). Ties on ts broken by `seq_col` when given,
    else arbitrary-but-deterministic via ts only."""
    order = [F.desc(ts_col)]
    if seq_col is not None:
        order.append(F.desc(seq_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def compact(
    log: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    op_col: str = "op",
    seq_col: str | None = None,
    since_ts=None,
) -> DataFrame:
    """Fold a change-log into current state: last-op-per-key, then drop
    keys whose last op is a DELETE (O11). `since_ts` restricts to
    entries strictly after a checkpoint timestamp (O12,
    src/utils/wal_manager.py:213-215)."""
    if since_ts is not None:
        log = log.filter(F.col(ts_col) > since_ts)
    last = latest_per_key(log, key_col, ts_col, seq_col)
    return last.filter(F.col(op_col) != OP_DELETE).drop(op_col)


def apply_changelog(
    base: DataFrame,
    log: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Apply a change-log onto a base snapshot (recovery =
    checkpoint + incremental replay, src/datanode/handler.py:181-219).

    Changed keys take their compacted log value (PUT) or disappear
    (DELETE tombstone); unchanged base rows pass through via a left-anti
    join — the base (the 100 TB side) is never window-sorted, only the
    log is."""
    changed_keys = log.select(key_col).distinct()
    untouched = base.join(changed_keys, key_col, "left_anti")
    value_cols = [c for c in base.columns]
    resolved = compact(log, key_col, ts_col, op_col, seq_col).select(*value_cols)
    return untouched.unionByName(resolved)


def upsert(
    base: DataFrame,
    changes: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
) -> DataFrame:
    """Last-write-wins upsert of plain rows (no op column): the
    reference's put-overwrites semantics (src/datanode/handler.py:253-261)
    as changes-win-over-base per key."""
    tagged = changes.withColumn("__src", F.lit(1)).unionByName(
        base.withColumn("__src", F.lit(0))
    )
    w = Window.partitionBy(key_col).orderBy(F.desc(ts_col), F.desc("__src"))
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def delete_keys(base: DataFrame, keys: DataFrame, key_col: str = "key") -> DataFrame:
    """Tombstone application as a left-anti join (O2)."""
    return base.join(keys.select(key_col).distinct(), key_col, "left_anti")


def lookup(state: DataFrame, key, key_col: str = "key") -> DataFrame:
    """Point lookup (O3, src/datanode/handler.py:411-428): a pushed-down
    key-equality predicate on the parquet scan replaces the LevelDB get;
    get-after-delete naturally returns 0 rows because compaction removed
    the key."""
    return state.filter(F.col(key_col) == key)


def snapshot(state: DataFrame, path: str, partition_by: str | None = None) -> None:
    """Checkpoint (O13): persist compacted state as parquet. At scale,
    partition/bucket by key-hash so recovery reads are pruned."""
    w = state.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)
