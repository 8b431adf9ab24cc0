"""Tests for the persisted graph layout (graph_write / graph_read /
graph_update / graph_meta): derive-once-serve-many for the graph
family, write-audit-publish discipline, versioned edge-delta folds,
and degree-reuse in the iterative operators (VERDICT r11 #2/#3)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.graph import (
    cooccurrence_edges,
    graph_meta,
    graph_read,
    graph_update,
    graph_write,
    pagerank,
    personalized_pagerank,
)


def _sym(spark, und_pairs):
    """Symmetric edge DataFrame from one-directional (a, b) pairs."""
    df = spark.createDataFrame(und_pairs, "src long, dst long")
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


TRIANGLE_PLUS_TAIL = [(1, 2), (1, 3), (2, 3), (3, 4)]


def test_graph_write_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "g")
    meta = graph_write(_sym(spark, TRIANGLE_PLUS_TAIL), path)
    assert meta == {"version": 0, "n_nodes": 4, "n_edges": 4}
    adj = graph_read(spark, path)
    assert set(adj.columns) == {"src", "dst", "deg"}
    rows = {(r["src"], r["dst"]): r["deg"] for r in adj.collect()}
    # symmetric: every edge present both ways
    assert len(rows) == 8
    for (s, d) in TRIANGLE_PLUS_TAIL:
        assert (s, d) in rows and (d, s) in rows
    # deg is the node's undirected degree, denormalized per edge
    assert rows[(3, 4)] == 3 and rows[(4, 3)] == 1
    assert graph_meta(path) == meta


def test_graph_read_requires_published_marker(spark, tmp_path):
    path = str(tmp_path / "empty")
    with pytest.raises(FileNotFoundError):
        graph_read(spark, path)
    with pytest.raises(FileNotFoundError):
        graph_meta(path)


def test_graph_write_audit_rejects_asymmetric(spark, tmp_path):
    path = str(tmp_path / "bad")
    one_way = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(ValueError, match="audit failed"):
        graph_write(one_way, path)
    # the failed attempt must not be readable
    with pytest.raises(FileNotFoundError):
        graph_read(spark, path)


def test_graph_write_audit_rejects_self_loops(spark, tmp_path):
    path = str(tmp_path / "loops")
    loops = _sym(spark, [(1, 2)]).union(
        spark.createDataFrame([(3, 3), (3, 3)], "src long, dst long")
    )
    with pytest.raises(ValueError, match="audit failed"):
        graph_write(loops, path)


def test_graph_update_add_and_remove(spark, tmp_path):
    path = str(tmp_path / "upd")
    graph_write(_sym(spark, TRIANGLE_PLUS_TAIL), path)
    # add one edge (given one-directional, reversed order) and an
    # already-present duplicate; remove the tail edge
    adds = spark.createDataFrame([(5, 4), (2, 1)], "src long, dst long")
    removes = spark.createDataFrame([(4, 3)], "src long, dst long")
    meta = graph_update(spark, path, add_edges=adds, remove_edges=removes)
    assert meta["version"] == 1
    assert meta["n_edges"] == 4  # 4 - 1 removed + 1 added (dup deduped)
    assert meta["n_nodes"] == 5
    und = {
        (r["src"], r["dst"])
        for r in graph_read(spark, path)
        .filter(F.col("src") < F.col("dst"))
        .collect()
    }
    assert und == {(1, 2), (1, 3), (2, 3), (4, 5)}
    # update == rebuild: the folded layout serves the same graph a
    # one-shot write of the final edge set produces
    fresh = str(tmp_path / "fresh")
    graph_write(_sym(spark, [(1, 2), (1, 3), (2, 3), (4, 5)]), fresh)
    assert sorted(
        map(tuple, graph_read(spark, fresh).collect())
    ) == sorted(map(tuple, graph_read(spark, path).collect()))


def test_graph_update_publish_is_versioned(spark, tmp_path):
    path = str(tmp_path / "ver")
    graph_write(_sym(spark, [(1, 2)]), path)
    graph_update(
        spark,
        path,
        add_edges=spark.createDataFrame([(2, 3)], "src long, dst long"),
    )
    markers = sorted(os.listdir(os.path.join(path, "applied")))
    assert markers == ["v0.json", "v1.json"]
    with open(os.path.join(path, "applied", "v1.json")) as f:
        assert json.load(f)["n_edges"] == 2
    # latest version wins; v0 stays on disk for readers mid-swap
    assert graph_meta(path)["version"] == 1


def test_graph_update_gc_keeps_newest_versions(spark, tmp_path):
    path = str(tmp_path / "gc")
    graph_write(_sym(spark, [(1, 2)]), path)
    for i in range(2):
        graph_update(
            spark,
            path,
            add_edges=spark.createDataFrame(
                [(10 + i, 20 + i)], "src long, dst long"
            ),
        )
    # default keep_versions=2: v0 (marker + data) GC'd, v1/v2 kept
    assert sorted(os.listdir(os.path.join(path, "applied"))) == [
        "v1.json", "v2.json",
    ]
    assert sorted(os.listdir(os.path.join(path, "adj"))) == ["v1", "v2"]
    assert graph_meta(path)["version"] == 2
    assert graph_read(spark, path).count() == 6  # 3 und-edges symmetric


def test_graph_update_to_empty_publishes_honest_zeros(spark, tmp_path):
    """Removing the last edge must publish an audited EMPTY version
    (n_edges 0, not None from NULL sums) — the graph being empty is a
    valid state; a vacuously-passed audit with null meta is not."""
    path = str(tmp_path / "toempty")
    graph_write(_sym(spark, [(1, 2)]), path)
    meta = graph_update(
        spark,
        path,
        remove_edges=spark.createDataFrame([(1, 2)], "src long, dst long"),
    )
    assert meta == {"version": 1, "n_nodes": 0, "n_edges": 0}
    assert graph_read(spark, path).count() == 0


def test_pagerank_reuses_layout_degrees(spark, tmp_path):
    """pagerank over graph_read (deg pre-attached) must equal pagerank
    over the bare symmetric edges (deg computed in-query)."""
    path = str(tmp_path / "pr")
    edges = _sym(spark, TRIANGLE_PLUS_TAIL)
    graph_write(edges, path)
    from_layout = {
        r["node"]: r["rank_rel"]
        for r in pagerank(
            graph_read(spark, path), iterations=3, use_deg_col=True
        ).collect()
    }
    from_edges = {
        r["node"]: r["rank_rel"]
        for r in pagerank(edges, iterations=3).collect()
    }
    assert from_layout == from_edges


def test_ppr_reuses_layout_degrees(spark, tmp_path):
    path = str(tmp_path / "ppr")
    edges = _sym(spark, TRIANGLE_PLUS_TAIL)
    graph_write(edges, path)
    seeds = spark.createDataFrame([(1,)], "node long")
    a = {
        r["node"]: r["rank_rel"]
        for r in personalized_pagerank(
            graph_read(spark, path), seeds, iterations=3, use_deg_col=True
        ).collect()
    }
    b = {
        r["node"]: r["rank_rel"]
        for r in personalized_pagerank(edges, seeds, iterations=3).collect()
    }
    assert a == b


def test_graph_read_time_travel(spark, tmp_path):
    path = str(tmp_path / "tt")
    graph_write(_sym(spark, [(1, 2)]), path)
    graph_update(
        spark, path,
        add_edges=spark.createDataFrame([(2, 3)], "src long, dst long"),
    )
    assert graph_read(spark, path).count() == 4  # latest: 2 und-edges
    assert graph_read(spark, path, version=0).count() == 2
    with pytest.raises(FileNotFoundError, match="not published"):
        graph_read(spark, path, version=5)


def test_pagerank_weighted_numpy_parity(spark):
    """Weighted walk vs a dense numpy power iteration on a small
    weighted graph (path 1-2-3 with weights 3 and 1)."""
    import numpy as np

    rows = [(1, 2, 3.0), (2, 3, 1.0)]
    und = spark.createDataFrame(rows, "src long, dst long, w double")
    edges = und.union(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    got = {
        r["node"]: r["rank_rel"]
        for r in pagerank(edges, iterations=4, weight_col="w").collect()
    }
    nodes = [1, 2, 3]
    W = np.zeros((3, 3))
    for s, d, w in rows:
        W[nodes.index(s), nodes.index(d)] = w
        W[nodes.index(d), nodes.index(s)] = w
    P = W / W.sum(axis=1, keepdims=True)  # row-stochastic
    r = np.full(3, 1 / 3)
    for _ in range(4):
        r = (1 - 0.85) / 3 + 0.85 * (P.T @ r)
    expected = {n: round(v * 3, 6) for n, v in zip(nodes, r)}
    assert got == pytest.approx(expected)


def test_pagerank_weighted_uniform_weights_equal_unweighted(spark):
    edges = _sym(spark, TRIANGLE_PLUS_TAIL).withColumn("w", F.lit(2.5))
    weighted = {
        r["node"]: r["rank_rel"]
        for r in pagerank(edges, iterations=3, weight_col="w").collect()
    }
    plain = {
        r["node"]: r["rank_rel"]
        for r in pagerank(
            edges.select("src", "dst"), iterations=3
        ).collect()
    }
    assert weighted == pytest.approx(plain)


def test_cooccurrence_layout_matches_direct(spark, tmp_path):
    """graph_write(cooccurrence_edges(...)) then graph_read serves the
    exact edge set the direct derivation produces."""
    rows = [
        (10, 1), (10, 2), (10, 3),
        (11, 1), (11, 2),
        (12, 1), (12, 2), (12, 3),
        (13, 3), (13, 4),
        (14, 3), (14, 4),
    ]
    baskets = spark.createDataFrame(rows, "basket long, item long")
    edges = cooccurrence_edges(baskets, "basket", "item", min_support=2)
    path = str(tmp_path / "co")
    graph_write(edges, path)
    served = sorted(
        (r["src"], r["dst"])
        for r in graph_read(spark, path).select("src", "dst").collect()
    )
    direct = sorted((r["src"], r["dst"]) for r in edges.collect())
    assert served == direct and served  # non-vacuous


def test_stale_deg_fast_path_is_opt_in(spark, tmp_path):
    """A filtered subgraph of graph_read output carries stale
    denormalized degrees; the default (use_deg_col off) recomputes
    degrees from the edge set as passed, so ranks stay correct."""
    path = str(tmp_path / "stale")
    graph_write(_sym(spark, TRIANGLE_PLUS_TAIL), path)
    # peel node 4: its edges go, but surviving rows keep old deg values
    sub = graph_read(spark, path).filter("src != 4 and dst != 4")
    fresh = _sym(spark, [(1, 2), (1, 3), (2, 3)])
    want = {r["node"]: r["rank_rel"] for r in pagerank(fresh, 3).collect()}
    got = {r["node"]: r["rank_rel"] for r in pagerank(sub, 3).collect()}
    assert got == want
    # the opt-in fast path on the same stale input is the documented
    # wrong answer — proving the default guards against exactly this
    stale = {
        r["node"]: r["rank_rel"]
        for r in pagerank(sub, 3, use_deg_col=True).collect()
    }
    assert stale != want


def test_reliable_checkpoint_survives_block_loss(spark, tmp_path):
    """reliable=True materializes iterative state to checkpoint FILES:
    after every executor-local block is dropped (simulated executor
    loss), the result is still readable — while the executor-local
    default (reliable=False) loses its blocks unrecoverably, which is
    the module-header caveat this flag exists for."""
    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    edges = _sym(spark, TRIANGLE_PLUS_TAIL)
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    fragile = pagerank(edges, iterations=2, reliable=False)
    durable = pagerank(edges, iterations=2, reliable=True)
    want = sorted(map(tuple, durable.collect()))
    assert sorted(map(tuple, fragile.collect())) == want
    # simulate executor loss: drop every block this test created
    master = sc._jvm.org.apache.spark.SparkEnv.get().blockManager().master()
    for rid in sc._jsc.getPersistentRDDs().keySet().toArray():
        if rid not in before:
            master.removeRdd(int(rid), True)
    # durable state recomputes from the checkpoint files on disk
    assert sorted(map(tuple, durable.collect())) == want
    # the executor-local blocks are gone for good
    with pytest.raises(Exception, match="[Cc]heckpoint"):
        fragile.collect()
