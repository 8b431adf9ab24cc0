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
    until_ts=None,
) -> DataFrame:
    """Fold a change-log into current state: last-op-per-key, then drop
    keys whose last op is a DELETE (O11). `since_ts` restricts to
    entries strictly after a checkpoint timestamp (O12,
    src/utils/wal_manager.py:213-215). `until_ts` (inclusive) is the
    time-travel read: compact(until_ts=T) reconstructs the table state
    AS OF T from the same log scan — the single-cutoff form of
    snapshot_diff's two-cutoff replay, and the query a WAL-backed
    store answers by replaying entries up to a timestamp."""
    if since_ts is not None:
        log = log.filter(F.col(ts_col) > since_ts)
    if until_ts is not None:
        log = log.filter(F.col(ts_col) <= until_ts)
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


def scd2_history(
    log: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    op_col: str = "op",
    seq_col: str | None = None,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from the change-log:
    one row per PUT version with its validity interval. The WAL the
    reference keeps for replay (src/utils/wal_manager.py:80-113)
    already records every version of every key; this materializes that
    history as queryable intervals instead of collapsing it to the
    latest state (compact) or diffing two cutoffs (snapshot_diff):

    - ``valid_from`` = the PUT's own timestamp
    - ``valid_to``   = the NEXT entry's timestamp for the key (PUT
      overwrite or DELETE both close the version); NULL = still open
    - ``is_current`` = open interval (the row `compact` would return)

    A DELETE closes the preceding version and emits no row of its own,
    so point-in-time lookup is `valid_from <= t AND (valid_to IS NULL
    OR t < valid_to)` — deleted spans simply have no covering row.

    Scale: ONE hash shuffle on key + one window over the log (never
    the base snapshot); the same cost as compact. Ties on ts broken by
    `seq_col`, mirroring latest_per_key."""
    if value_cols is None:
        reserved = {key_col, ts_col, op_col, seq_col}
        value_cols = [c for c in log.columns if c not in reserved]
    order = [F.asc(ts_col)] + ([F.asc(seq_col)] if seq_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    hist = log.withColumn("__valid_to", F.lead(ts_col).over(w))
    return hist.filter(F.col(op_col) == OP_PUT).select(
        key_col,
        *value_cols,
        F.col(ts_col).alias("valid_from"),
        F.col("__valid_to").alias("valid_to"),
        F.col("__valid_to").isNull().alias("is_current"),
    )


def snapshot_diff(
    log: DataFrame,
    ts_a,
    ts_b,
    key_col: str = "key",
    ts_col: str = "ts",
    op_col: str = "op",
    seq_col: str | None = None,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Time-travel diff: what changed between the state as-of ts_a and
    the state as-of ts_b (both inclusive)? Emits one row per changed
    key with change_type in ('added', 'deleted', 'updated') plus
    old_<col>/new_<col> for every value column; unchanged keys emit
    nothing. The audit query a WAL-backed store answers with two full
    replays (src/utils/wal_manager.py:116-182 run twice) — here both
    as-of states come from ONE scan and ONE shuffle: per key, a
    max_by over entries <= each cutoff picks that cutoff's winning op,
    so the log is never window-sorted twice.

    At 100 TB the log is the small side by construction (the base
    snapshot never enters this plan at all), and the aggregation is
    partial-agg friendly: each map task emits at most one candidate
    struct per (key, cutoff)."""
    if value_cols is None:
        reserved = {key_col, ts_col, op_col, seq_col}
        value_cols = [c for c in log.columns if c not in reserved]
    ord_cols = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    payload = F.struct(F.col(op_col).alias("op"), *[F.col(c).alias(c) for c in value_cols])

    def as_of(cutoff, name):
        # no explicit cast: Spark coerces a string literal against a
        # timestamp column, and numeric ts columns compare natively
        cond = F.col(ts_col) <= F.lit(cutoff)
        return F.max_by(
            F.when(cond, payload), F.when(cond, F.struct(*ord_cols))
        ).alias(name)

    both = log.groupBy(key_col).agg(as_of(ts_a, "__a"), as_of(ts_b, "__b"))
    present_a = F.col("__a").isNotNull() & (F.col("__a.op") != F.lit(OP_DELETE))
    present_b = F.col("__b").isNotNull() & (F.col("__b.op") != F.lit(OP_DELETE))
    changed = (
        F.when(~present_a & present_b, F.lit("added"))
        .when(present_a & ~present_b, F.lit("deleted"))
        .when(
            present_a
            & present_b
            & ~F.struct(*[F.col(f"__a.{c}") for c in value_cols]).eqNullSafe(
                F.struct(*[F.col(f"__b.{c}") for c in value_cols])
            ),
            F.lit("updated"),
        )
    )
    out = both.withColumn("change_type", changed).filter(
        F.col("change_type").isNotNull()
    )
    olds = [
        F.when(present_a, F.col(f"__a.{c}")).alias(f"old_{c}") for c in value_cols
    ]
    news = [
        F.when(present_b, F.col(f"__b.{c}")).alias(f"new_{c}") for c in value_cols
    ]
    return out.select(key_col, "change_type", *olds, *news)


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key_col: str,
    when_matched_update: dict | None = None,
    when_matched_delete=None,
    when_not_matched_insert: dict | None = None,
) -> DataFrame:
    """Multi-arm MERGE (ANSI MERGE INTO semantics) over immutable
    frames — the batch-CDC superset of `upsert`/`delete_keys`:

    - matched + when_matched_delete true  -> row dropped
    - matched otherwise                   -> when_matched_update
      expressions applied (columns not listed pass through from the
      target); expressions may reference both sides via the `t` / `s`
      aliases (e.g. F.col("t.balance") + F.col("s.delta"))
    - source-only key                     -> when_not_matched_insert
      expressions build the new row (missing target columns default to
      the same-named source column when present, else NULL)
    - target-only key                     -> unchanged pass-through

    Duplicate source keys are the caller's contract to resolve first
    (latest_per_key) — ANSI MERGE raises on them; here each duplicate
    would emit a row, so we document rather than shuffle-check.

    100 TB shape: the big (target) side is touched by exactly one
    anti join for pass-through and one inner join for the matched arms
    — both on the same key, so one co-partitioning serves both under
    AQE; the source (batch) side is typically broadcast-sized. No
    window over the target, no full-outer join materializing both
    sides wide.
    """
    t = target.alias("t")
    s = source.alias("s")
    cond = F.col(f"t.{key_col}") == F.col(f"s.{key_col}")

    untouched = t.join(s, cond, "left_anti").select(
        *[F.col(f"t.{c}").alias(c) for c in target.columns]
    )

    matched = t.join(s, cond, "inner")
    if when_matched_delete is not None:
        # null-safe: a NULL delete predicate means NOT deleted (ANSI
        # MERGE semantics) — filter(~NULL) would silently drop the row
        matched = matched.filter(
            ~F.coalesce(when_matched_delete, F.lit(False))
        )
    upd = when_matched_update or {}
    updated = matched.select(
        *[(upd[c] if c in upd else F.col(f"t.{c}")).alias(c) for c in target.columns]
    )

    ins = when_not_matched_insert or {}
    source_only = s.join(t, cond, "left_anti")
    ins_cols = []
    for c in target.columns:
        if c in ins:
            ins_cols.append(ins[c].alias(c))
        elif c in source.columns:
            ins_cols.append(F.col(f"s.{c}").alias(c))
        else:
            ins_cols.append(F.lit(None).alias(c))
    inserted = source_only.select(*ins_cols)

    return untouched.unionByName(updated).unionByName(inserted)
