"""Tests for the maintained co-occurrence graph fold
(streaming/graph_maintenance.py): batch/stream equivalence under
complete-basket delivery, replay safety, read-time frequent-item
pruning (the late-crossing case a batch prune-then-join cannot do
incrementally), the raw-size skew cap, and parity with the batch
operator where the cap never binds."""

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.graph import (
    cooccurrence_edges,
)
from distributed_vector_database_spark.streaming.graph_maintenance import (
    build_graph_fold,
    compact_graph_state,
    read_cooccurrence_graph,
)

ROWS = [
    # pair (1,2) in baskets 10,11,12 ; (1,3)/(2,3) in 10,12 ;
    # (3,4) in 13,14 ; item 9 appears once (infrequent at support 2)
    (10, 1), (10, 2), (10, 3), (10, 9),
    (11, 1), (11, 2),
    (12, 1), (12, 2), (12, 3),
    (13, 3), (13, 4),
    (14, 3), (14, 4),
]


def _baskets(spark, rows=ROWS):
    return spark.createDataFrame(rows, "basket long, item long")


def _edges(spark, state, min_support=2):
    return sorted(
        map(tuple, read_cooccurrence_graph(spark, state, min_support).collect())
    )


def test_fold_in_batches_equals_one_shot(spark, tmp_path):
    one = str(tmp_path / "one")
    fold1 = build_graph_fold(one, "basket", "item")
    fold1(_baskets(spark), 0)

    split = str(tmp_path / "split")
    fold2 = build_graph_fold(split, "basket", "item")
    df = _baskets(spark)
    # complete-basket split: baskets 10-11 then 12-14
    fold2(df.filter(F.col("basket") <= 11), 0)
    fold2(df.filter(F.col("basket") >= 12), 1)

    assert _edges(spark, one) == _edges(spark, split)
    assert _edges(spark, one)  # non-vacuous


def test_fold_matches_batch_operator_when_cap_unbound(spark, tmp_path):
    state = str(tmp_path / "g")
    fold = build_graph_fold(state, "basket", "item")
    df = _baskets(spark)
    fold(df.filter(F.col("basket") % 2 == 0), 0)
    fold(df.filter(F.col("basket") % 2 == 1), 1)
    served = sorted(
        (r["src"], r["dst"])
        for r in read_cooccurrence_graph(
            spark, state, min_support=2, symmetric=True
        ).collect()
    )
    direct = sorted(
        map(tuple, cooccurrence_edges(df, "basket", "item", 2).collect())
    )
    assert served == direct and served


def test_replayed_batch_is_skipped(spark, tmp_path):
    state = str(tmp_path / "re")
    fold = build_graph_fold(state, "basket", "item")
    df = _baskets(spark)
    fold(df, 7)
    before = _edges(spark, state)
    fold(df, 7)  # at-least-once redelivery must not double supports
    assert _edges(spark, state) == before
    sup = {
        (r["src"], r["dst"]): r["sup"]
        for r in read_cooccurrence_graph(spark, state, 2).collect()
    }
    assert sup[(1, 2)] == 3  # not 6


def test_late_frequency_crossing_brings_historical_pairs(spark, tmp_path):
    """Item 7 appears once in batch 0 (infrequent) and once in batch
    1: at support 2 its batch-0 pair must surface — read-time pruning
    sees the accumulated item support, where prune-then-join inside
    each batch would have dropped the batch-0 co-occurrence forever."""
    state = str(tmp_path / "late")
    fold = build_graph_fold(state, "basket", "item")
    fold(_baskets(spark, [(1, 7), (1, 8)]), 0)
    fold(_baskets(spark, [(2, 7), (2, 8)]), 1)
    assert _edges(spark, state, min_support=2) == [(7, 8, 2)]


def test_raw_size_cap_drops_skewed_basket_at_ingest(spark, tmp_path):
    state = str(tmp_path / "cap")
    fold = build_graph_fold(state, "basket", "item", max_basket=5)
    rows = [(1, i) for i in range(10)] + [(2, i) for i in range(10)]
    fold(_baskets(spark, rows), 0)
    # both baskets exceed the cap -> state publishes but serves empty
    assert _edges(spark, state, min_support=2) == []
    # a small basket in the same fold still contributes
    state2 = str(tmp_path / "cap2")
    fold2 = build_graph_fold(state2, "basket", "item", max_basket=5)
    fold2(_baskets(spark, rows + [(3, 100), (3, 101), (4, 100), (4, 101)]), 0)
    assert _edges(spark, state2, min_support=2) == [(100, 101, 2)]


def test_read_requires_published_state(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_cooccurrence_graph(spark, str(tmp_path / "missing"))


def test_compaction_preserves_served_graph(spark, tmp_path):
    """compact -> one base segment, same served edges; folds AFTER a
    compaction keep accumulating on top of it."""
    import os

    state = str(tmp_path / "cpt")
    fold = build_graph_fold(state, "basket", "item")
    df = _baskets(spark)
    fold(df.filter(F.col("basket") <= 11), 0)
    fold(df.filter(F.col("basket") == 12), 1)
    before = _edges(spark, state)
    absorbed = compact_graph_state(spark, state)
    assert absorbed == 2
    assert _edges(spark, state) == before
    # superseded delta segments are GC'd, one compacted segment lives
    assert len(os.listdir(os.path.join(state, "pairs"))) == 1
    # ingest continues on top of the compacted base
    fold(df.filter(F.col("basket") >= 13), 2)
    one_shot = str(tmp_path / "oneshot")
    fold1 = build_graph_fold(one_shot, "basket", "item")
    fold1(df, 0)
    assert _edges(spark, state) == _edges(spark, one_shot)
    # idempotent: nothing new to absorb after a fresh compact
    compact_graph_state(spark, state)
    assert compact_graph_state(spark, state) == 0


def test_replay_skipped_even_after_compaction(spark, tmp_path):
    """The batch ledger outlives compaction: a redelivery of a batch
    whose delta segment was already absorbed must still be skipped."""
    state = str(tmp_path / "replaycpt")
    fold = build_graph_fold(state, "basket", "item")
    df = _baskets(spark)
    fold(df, 3)
    compact_graph_state(spark, state)
    fold(df, 3)  # replay after its segment no longer exists
    sup = {
        (r["src"], r["dst"]): r["sup"]
        for r in read_cooccurrence_graph(spark, state, 2).collect()
    }
    assert sup[(1, 2)] == 3  # not 6


def test_publish_manifest_is_check_and_fail(tmp_path):
    # two writers racing to the same version: exactly one wins, and
    # the published content is the winner's, never a clobber
    from distributed_vector_database_spark.streaming.graph_maintenance import (
        _latest_manifest,
        _publish_manifest,
    )

    state = str(tmp_path / "race")
    assert _publish_manifest(state, 0, ["b0"]) is True
    assert _publish_manifest(state, 1, ["b0", "b1"]) is True
    # the loser's attempt at an existing version fails cleanly
    assert _publish_manifest(state, 1, ["b0", "COMPACT-CLOBBER"]) is False
    assert _latest_manifest(state) == (1, ["b0", "b1"])


def test_compaction_losing_publish_race_keeps_folded_segment(
    spark, tmp_path, monkeypatch
):
    """A micro-batch folds WHILE compaction runs: the compactor loses
    the version race, retries, and must carry the concurrent fold's
    segment forward — the silent-drop scenario the check-and-fail
    publish exists for."""
    import distributed_vector_database_spark.streaming.graph_maintenance as gm

    state = str(tmp_path / "cc")
    fold = build_graph_fold(state, "basket", "item")
    df = _baskets(spark)
    fold(df.filter(F.col("basket") <= 12), 0)
    before = _edges(spark, state)

    real_publish = gm._publish_manifest
    raced = {"done": False}

    def racing_publish(sd, version, segments):
        # first publish attempt from the compactor: a concurrent
        # micro-batch lands first (baskets 13-14 as segment b1)
        if not raced["done"]:
            raced["done"] = True
            monkeypatch.setattr(gm, "_publish_manifest", real_publish)
            fold(df.filter(F.col("basket") >= 13), 1)
        return real_publish(sd, version, segments)

    monkeypatch.setattr(gm, "_publish_manifest", racing_publish)
    absorbed = compact_graph_state(spark, state)
    assert absorbed == 1
    v, live = gm._latest_manifest(state)
    assert any(s.startswith("c") for s in live)
    assert "b1" in live  # the concurrent fold survived
    # served graph = one-shot fold over ALL baskets
    one = str(tmp_path / "one")
    build_graph_fold(one, "basket", "item")(df, 0)
    assert _edges(spark, state) == _edges(spark, one)
    assert _edges(spark, state) != before  # non-vacuous: b1 added pairs


def test_fresh_checkpoint_identity_is_not_a_replay(spark, tmp_path):
    """Batch ids restart at 0 when a stream gets a new checkpoint dir;
    the ledger must fold them as new data (matching identities still
    skip true replays)."""
    state = str(tmp_path / "ident")
    df = _baskets(spark)
    fold_a = build_graph_fold(state, "basket", "item", run_id="ckpt-A")
    fold_a(df.filter(F.col("basket") <= 12), 0)
    partial = _edges(spark, state)
    # true replay, same identity: skipped
    fold_a(df.filter(F.col("basket") <= 12), 0)
    assert _edges(spark, state) == partial
    # new stream identity, restarted batch id 0: folded, not skipped
    fold_b = build_graph_fold(state, "basket", "item", run_id="ckpt-B")
    fold_b(df.filter(F.col("basket") >= 13), 0)
    one = str(tmp_path / "one")
    build_graph_fold(one, "basket", "item")(df, 0)
    assert _edges(spark, state) == _edges(spark, one)
    # and B's batch 0 replay is now skipped too
    fold_b(df.filter(F.col("basket") >= 13), 0)
    assert _edges(spark, state) == _edges(spark, one)


def test_legacy_marker_without_run_matches_any_identity(spark, tmp_path):
    """Pre-identity markers (no 'run' field) must be honored as true
    replays by identity-tagged folds: on upgrade, a replayed legacy
    batch would otherwise re-fold under a new tagged segment name next
    to the still-live untagged one and double-count its supports."""
    state = str(tmp_path / "legacy")
    df = _baskets(spark)
    # legacy layout: fold with no identity (markers carry no run)
    build_graph_fold(state, "basket", "item")(df, 0)
    before = _edges(spark, state)
    # upgraded code, same checkpoint lineage: replay of batch 0 must
    # be SKIPPED even though the fold now carries an identity
    build_graph_fold(state, "basket", "item", run_id="ckpt-A")(df, 0)
    assert _edges(spark, state) == before
