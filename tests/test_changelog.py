"""Change-log state semantics pinned from reference behavior
(SURVEY §5.3: upsert replaces, get-after-delete fails, last-op-per-key
replay, incremental strictly after checkpoint ts)."""

from distributed_vector_database_spark.operators.changelog import (
    OP_DELETE,
    OP_PUT,
    apply_changelog,
    compact,
    delete_keys,
    latest_per_key,
    lookup,
    upsert,
)

LOG_SCHEMA = "op string, key string, value double, ts long, seq long"


def _log(spark, rows):
    return spark.createDataFrame(rows, LOG_SCHEMA)


def test_compact_last_op_per_key_wins(spark):
    # replay applies only the final op per key (src/utils/wal_manager.py:147-149)
    log = _log(
        spark,
        [
            (OP_PUT, "a", 1.0, 10, 1),
            (OP_PUT, "a", 2.0, 20, 2),
            (OP_PUT, "b", 9.0, 5, 3),
        ],
    )
    state = {r["key"]: r["value"] for r in compact(log).collect()}
    assert state == {"a": 2.0, "b": 9.0}


def test_compact_delete_tombstone(spark):
    # get-after-delete fails (src/datanode/handler.py:418-421)
    log = _log(
        spark,
        [
            (OP_PUT, "a", 1.0, 10, 1),
            (OP_DELETE, "a", None, 20, 2),
            (OP_PUT, "b", 3.0, 30, 3),
        ],
    )
    state = compact(log)
    assert lookup(state, "a").count() == 0
    assert lookup(state, "b").count() == 1


def test_delete_then_put_resurrects(spark):
    # a later PUT after a DELETE wins (dict-overwrite order,
    # src/utils/wal_manager.py:131-151)
    log = _log(
        spark,
        [
            (OP_PUT, "a", 1.0, 10, 1),
            (OP_DELETE, "a", None, 20, 2),
            (OP_PUT, "a", 7.0, 30, 3),
        ],
    )
    assert compact(log).collect()[0]["value"] == 7.0


def test_compact_ts_tie_broken_by_seq(spark):
    log = _log(
        spark,
        [
            (OP_PUT, "a", 1.0, 10, 1),
            (OP_PUT, "a", 2.0, 10, 2),
        ],
    )
    assert compact(log, seq_col="seq").collect()[0]["value"] == 2.0


def test_incremental_strictly_after_checkpoint(spark):
    # entries at exactly the checkpoint ts are skipped
    # (src/utils/wal_manager.py:213-215: ts > checkpoint)
    log = _log(
        spark,
        [
            (OP_PUT, "a", 1.0, 10, 1),
            (OP_PUT, "b", 2.0, 20, 2),
            (OP_PUT, "c", 3.0, 30, 3),
        ],
    )
    keys = {r["key"] for r in compact(log, since_ts=20).collect()}
    assert keys == {"c"}


def test_upsert_replaces(spark):
    # put on an existing key replaces it (src/datanode/handler.py:253-261)
    base = spark.createDataFrame(
        [("a", 1.0, 10), ("b", 2.0, 10)], "key string, value double, ts long"
    )
    changes = spark.createDataFrame([("a", 99.0, 20)], "key string, value double, ts long")
    state = {r["key"]: r["value"] for r in upsert(base, changes).collect()}
    assert state == {"a": 99.0, "b": 2.0}


def test_delete_keys_anti_join(spark):
    base = spark.createDataFrame(
        [("a", 1.0, 1), ("b", 2.0, 1)], "key string, value double, ts long"
    )
    dels = spark.createDataFrame([("a",)], "key string")
    assert [r["key"] for r in delete_keys(base, dels).collect()] == ["b"]


def test_apply_changelog_recovery(spark):
    # snapshot + incremental replay == full replay (SURVEY §3.4)
    base = spark.createDataFrame(
        [("a", 1.0, 10, 1), ("b", 2.0, 10, 2)],
        "key string, value double, ts long, seq long",
    )
    log = _log(
        spark,
        [
            (OP_PUT, "b", 5.0, 20, 3),
            (OP_DELETE, "a", None, 21, 4),
            (OP_PUT, "c", 7.0, 22, 5),
        ],
    )
    state = {
        r["key"]: r["value"]
        for r in apply_changelog(base, log, seq_col="seq").collect()
    }
    assert state == {"b": 5.0, "c": 7.0}


def test_latest_per_key(spark):
    log = _log(spark, [(OP_PUT, "a", 1.0, 10, 1), (OP_PUT, "a", 2.0, 30, 2)])
    assert latest_per_key(log).collect()[0]["value"] == 2.0


def test_snapshot_diff_classifies_changes(spark):
    from distributed_vector_database_spark.operators.changelog import snapshot_diff

    log = _log(
        spark,
        [
            (OP_PUT, "stay", 1.0, 10, 1),      # unchanged -> no row
            (OP_PUT, "upd", 1.0, 10, 2),
            (OP_PUT, "upd", 2.0, 30, 3),       # updated after A
            (OP_PUT, "gone", 9.0, 10, 4),
            (OP_DELETE, "gone", None, 30, 5),  # deleted after A
            (OP_PUT, "new", 4.0, 30, 6),       # added after A
            (OP_DELETE, "ghost", None, 5, 7),  # dead at both cutoffs -> no row
            (OP_PUT, "tie", 1.0, 20, 8),
            (OP_PUT, "tie", 2.0, 20, 9),       # same ts: seq breaks the tie
        ],
    )
    out = {
        r["key"]: (r["change_type"], r["old_value"], r["new_value"])
        for r in snapshot_diff(
            log, 20, 40, seq_col="seq", value_cols=["value"]
        ).collect()
    }
    assert out == {
        "upd": ("updated", 1.0, 2.0),
        "gone": ("deleted", 9.0, None),
        "new": ("added", None, 4.0),
    }
    # 'tie' resolves to seq 9's value at BOTH cutoffs -> unchanged
    assert "tie" not in out and "stay" not in out and "ghost" not in out


def test_compact_until_ts_is_time_travel(spark):
    """compact(until_ts=T) == the state a full replay reaches at T:
    a later PUT is invisible, a later DELETE hasn't happened yet, and
    the cutoff is inclusive."""
    log = _log(
        spark,
        [
            (OP_PUT, "a", 1.0, 10, 1),
            (OP_PUT, "a", 2.0, 30, 2),      # after the cutoff
            (OP_PUT, "b", 3.0, 20, 3),      # exactly at the cutoff
            (OP_DELETE, "b", None, 40, 4),  # future delete: not yet
            (OP_PUT, "c", 5.0, 50, 5),      # created after the cutoff
        ],
    )
    asof = {
        r["key"]: r["value"]
        for r in compact(log, until_ts=20).collect()
    }
    assert asof == {"a": 1.0, "b": 3.0}
    # and the present-time state differs on every count
    now = {r["key"]: r["value"] for r in compact(log).collect()}
    assert now == {"a": 2.0, "c": 5.0}
    # since+until compose to a half-open window replay
    window = {
        r["key"]: r["value"]
        for r in compact(log, since_ts=10, until_ts=30).collect()
    }
    assert window == {"a": 2.0, "b": 3.0}
