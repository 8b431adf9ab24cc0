"""Reference-format WAL JSON-lines ingestion (sources/wal.py)."""

from __future__ import annotations

import json

from distributed_vector_database_spark.operators.changelog import compact
from distributed_vector_database_spark.sources.wal import (
    read_wal_json,
    write_wal_json,
)

ENTRIES = [
    {"op_type": "PUT", "key": "a", "vector": [1.0, 2.0], "metadata": {"t": "x"},
     "timestamp": 1000, "node_id": "n1"},
    {"op_type": "PUT", "key": "b", "vector": [3.0, 4.0], "metadata": None,
     "timestamp": 2000, "node_id": "n1"},
    {"op_type": "DELETE", "key": "a", "vector": None, "metadata": None,
     "timestamp": 3000, "node_id": "n1"},
    {"op_type": "PUT", "key": "a", "vector": [9.0, 9.0], "metadata": {"t": "y"},
     "timestamp": 3000, "node_id": "n1"},  # same ts as DELETE: line order wins
    {"op_type": "PUT", "key": "c", "vector": [5.0, 5.0], "metadata": None,
     "timestamp": 1500, "node_id": "n1"},
    {"op_type": "DELETE", "key": "c", "vector": None, "metadata": None,
     "timestamp": 4000, "node_id": "n1"},
]


def _write_wal(tmp_path):
    p = tmp_path / "wal_000001.log"
    p.write_text("".join(json.dumps(e) + "\n" for e in ENTRIES))
    return str(tmp_path)


def test_read_wal_schema_and_values(spark, tmp_path):
    log = read_wal_json(spark, _write_wal(tmp_path))
    assert [f for f, _ in log.dtypes] == ["op", "key", "vector", "metadata", "ts", "seq"]
    rows = {(r["key"], r["op"], r["ts"].isoformat()) for r in log.collect()}
    assert ("a", "DELETE", "1970-01-01T00:00:03") in rows
    assert len(rows) == 6


def test_replay_matches_reference_semantics(spark, tmp_path):
    """Last-op-per-key with line order breaking timestamp ties — the
    reference's dict-overwrite replay (src/utils/wal_manager.py:131-151):
    key a's same-ts PUT follows the DELETE, so a survives."""
    log = read_wal_json(spark, _write_wal(tmp_path))
    state = {r["key"]: r["vector"] for r in compact(log, seq_col="seq").collect()}
    assert state == {"a": [9.0, 9.0], "b": [3.0, 4.0]}  # c deleted


def test_wal_round_trip(spark, tmp_path):
    src_dir = _write_wal(tmp_path)
    log = read_wal_json(spark, src_dir)
    out = str(tmp_path / "out_wal")
    write_wal_json(log, out)
    back = read_wal_json(spark, out)
    orig = {(r["key"], r["op"], r["ts"], tuple(r["vector"] or []))
            for r in log.collect()}
    rt = {(r["key"], r["op"], r["ts"], tuple(r["vector"] or []))
          for r in back.collect()}
    assert rt == orig


def _entry(op, key, vec, ts):
    return {"op_type": op, "key": key, "vector": vec, "metadata": None,
            "timestamp": ts, "node_id": "n1"}


def test_multi_file_replay_follows_file_name_order(spark, tmp_path):
    """Spark packs input files into scan partitions by SIZE descending,
    so partition order disagrees with file-name order whenever a later
    WAL file is larger. The reference replays files in sorted-name
    order (src/utils/wal_manager.py:116-130); seq must encode that.

    wal_000001.log (tiny) writes k=old; wal_000002.log (much larger)
    ends with k=new at the SAME timestamp. Bare
    monotonically_increasing_id would give the larger file the lower
    partition id — resolving k to the earlier file's value."""
    (tmp_path / "wal_000001.log").write_text(
        json.dumps(_entry("PUT", "k", [1.0, 1.0], 5000)) + "\n"
    )
    pad = [_entry("PUT", f"pad{i}", [0.0, float(i)], 10) for i in range(2000)]
    lines = pad + [_entry("PUT", "k", [2.0, 2.0], 5000)]
    (tmp_path / "wal_000002.log").write_text(
        "".join(json.dumps(e) + "\n" for e in lines)
    )
    log = read_wal_json(spark, str(tmp_path))
    # seq must rank file 2's row above file 1's
    rows = sorted(log.filter("key = 'k'").collect(), key=lambda r: r["seq"])
    assert [list(r["vector"]) for r in rows] == [[1.0, 1.0], [2.0, 2.0]]
    state = {r["key"]: list(r["vector"])
             for r in compact(log, seq_col="seq").collect()}
    assert state["k"] == [2.0, 2.0]


def test_seq_only_compact_reproduces_backdated_reference_replay(spark, tmp_path):
    """The documented parity escape hatch: the reference keeps the LAST
    LINE regardless of timestamp; ts-first compaction keeps the newest
    ts. compact(..., ts_col='seq') reproduces the reference bit-exactly
    even for a backdated later entry."""
    entries = [
        _entry("PUT", "x", [1.0, 0.0], 9000),
        _entry("PUT", "x", [2.0, 0.0], 100),  # backdated, but last line
    ]
    (tmp_path / "wal_000001.log").write_text(
        "".join(json.dumps(e) + "\n" for e in entries)
    )
    log = read_wal_json(spark, str(tmp_path))
    ts_first = {r["key"]: list(r["vector"]) for r in compact(log, seq_col="seq").collect()}
    assert ts_first["x"] == [1.0, 0.0]  # newest ts wins in engine order
    ref_order = {
        r["key"]: list(r["vector"])
        for r in compact(log, ts_col="seq", seq_col="seq").collect()
    }
    assert ref_order["x"] == [2.0, 0.0]  # reference: last line wins


def test_store_import_wal_serves_replayed_state(spark, tmp_path):
    from distributed_vector_database_spark.store import VectorStore

    store = VectorStore(spark, str(tmp_path / "store"), dim=2)
    n = store.import_wal(_write_wal(tmp_path))
    assert n == 6
    assert store.get("b")["vector"] == [3.0, 4.0]
    assert store.get("a")["vector"] == [9.0, 9.0]  # same-ts PUT beats DELETE
    assert store.get("c") is None  # tombstoned
    # a live write after import must win over any historical WAL entry
    store.put("a", [7.0, 7.0])
    assert store.get("a")["vector"] == [7.0, 7.0]


def test_store_import_wal_same_millisecond_live_write_wins(
    spark, tmp_path, monkeypatch
):
    """Importing from a still-ACTIVE reference node: the newest WAL
    entries can share the current millisecond with the store's next
    live put. The live put must still win — import_wal bumps the live
    seq counter past the largest imported seq so the (ts, seq)
    tie-break favors the local write."""
    import time as _time

    from distributed_vector_database_spark.store import VectorStore

    now_ms = 1_700_000_000_000
    (tmp_path / "wal_000001.log").write_text(
        json.dumps(_entry("PUT", "k", [1.0, 1.0], now_ms)) + "\n"
    )
    store = VectorStore(spark, str(tmp_path / "store"), dim=2)
    store.import_wal(str(tmp_path))
    monkeypatch.setattr(_time, "time", lambda: now_ms / 1000.0)
    store.put("k", [2.0, 2.0])  # same millisecond as the imported entry
    assert store.get("k")["vector"] == [2.0, 2.0]


def test_store_import_wal_rejects_dim_mismatch(spark, tmp_path):
    import pytest as _pytest

    from distributed_vector_database_spark.store import (
        DimensionMismatch,
        VectorStore,
    )

    store = VectorStore(spark, str(tmp_path / "store"), dim=3)
    with _pytest.raises(DimensionMismatch):
        store.import_wal(_write_wal(tmp_path))
