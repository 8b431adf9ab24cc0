"""Tests for the round-10 mining/graph/bloom/merge/edit-distance batch."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.bloom import (
    bloom_bitset,
    bloom_might_contain,
    bloom_semi_join,
)
from distributed_vector_database_spark.operators.changelog import merge_into
from distributed_vector_database_spark.operators.dedup import edit_distance_dedup
from distributed_vector_database_spark.operators.graph import (
    cooccurrence_edges,
    pagerank,
)
from distributed_vector_database_spark.operators.mining import (
    event_transitions,
    frequent_pairs,
    skyline,
)


# ---------------------------------------------------------------- mining
def _baskets(spark):
    rows = [
        # pair (1,2) in baskets 10,11,12 ; item 3 with 1 in 10,12 ;
        # item 9 appears once (infrequent -> apriori-pruned)
        (10, 1), (10, 2), (10, 3), (10, 9),
        (11, 1), (11, 2),
        (12, 1), (12, 2), (12, 3),
        (13, 3), (13, 4),
        (14, 3), (14, 4),
    ]
    return spark.createDataFrame(rows, "basket long, item long")


def test_frequent_pairs_counts_and_pruning(spark):
    out = frequent_pairs(
        _baskets(spark), "basket", "item", min_support=2, top_n=10
    ).collect()
    got = {(r.item_a, r.item_b): r.pair_support for r in out}
    assert got == {(1, 2): 3, (1, 3): 2, (2, 3): 2, (3, 4): 2}


def test_frequent_pairs_broadcast_guard_paths_agree(spark):
    """The three broadcast-guard modes — static hint (None), probe
    that admits the hint (large threshold), probe that DROPS the hint
    (threshold below the frequent-item count, the unbounded-vocabulary
    degradation at 100x) — must return identical pairs."""
    expected = {(1, 2): 3, (1, 3): 2, (2, 3): 2, (3, 4): 2}
    for mbi in (None, 1000, 1):
        out = frequent_pairs(
            _baskets(spark), "basket", "item", min_support=2, top_n=10,
            max_broadcast_items=mbi,
        ).collect()
        got = {(r.item_a, r.item_b): r.pair_support for r in out}
        assert got == expected, f"max_broadcast_items={mbi}"


def test_association_rules_guard_threaded(spark):
    from distributed_vector_database_spark.operators.mining import (
        association_rules,
    )

    base = association_rules(
        _baskets(spark), "basket", "item", min_support=2
    ).collect()
    guarded = association_rules(
        _baskets(spark), "basket", "item", min_support=2,
        max_broadcast_items=1,
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, guarded))
    assert base  # non-vacuous


def test_frequent_pairs_basket_cap_drops_skewed_basket(spark):
    rows = [(1, i) for i in range(10)] + [(2, i) for i in range(10)]
    df = spark.createDataFrame(rows, "basket long, item long")
    # cap below the basket size -> no pairs at all
    out = frequent_pairs(df, "basket", "item", min_support=2, max_basket=5)
    assert out.count() == 0


def test_skyline_exact_small(spark):
    rows = [
        Row(id=1, x=1.0, y=5.0),
        Row(id=2, x=2.0, y=2.0),
        Row(id=3, x=5.0, y=1.0),
        Row(id=4, x=3.0, y=3.0),   # dominated by 2
        Row(id=5, x=2.0, y=2.0),   # duplicate of 2 — both survive
        Row(id=6, x=1.0, y=6.0),   # dominated by 1
    ]
    out = skyline(spark.createDataFrame(rows), ["x", "y"], "id")
    assert {r.id for r in out.collect()} == {1, 2, 3, 5}


def test_skyline_matches_bruteforce(spark, tables):
    part = tables["part"].select("p_partkey", "p_retailprice", "p_size")
    got = {
        r.p_partkey
        for r in skyline(part, ["p_retailprice", "p_size"], "p_partkey").collect()
    }
    rows = part.collect()
    expect = set()
    for a in rows:
        dom = any(
            b.p_retailprice <= a.p_retailprice
            and b.p_size <= a.p_size
            and (b.p_retailprice < a.p_retailprice or b.p_size < a.p_size)
            for b in rows
        )
        if not dom:
            expect.add(a.p_partkey)
    assert got == expect


def test_event_transitions_counts_and_probabilities(spark):
    # user 100: a->b->a->c ; user 200: a->b
    # counts: (a,b)=2 (a,c)=1 (b,a)=1 ; a-row total=3, b-row total=1
    rows = [
        (1, 100, "a"), (2, 100, "b"), (3, 100, "a"), (4, 100, "c"),
        (5, 200, "a"), (6, 200, "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    out = event_transitions(df).collect()
    got = {(r.prev_type, r.next_type): (r.transitions, r.prob) for r in out}
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "c"): (1, round(1 / 3, 6)),
        ("b", "a"): (1, 1.0),
    }


def test_event_transitions_no_cross_user_step(spark):
    # boundary between users must not create a transition
    rows = [(1, 1, "a"), (2, 2, "b")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    assert event_transitions(df).count() == 0


# ---------------------------------------------------------------- bloom
def test_bloom_no_false_negatives_and_exact_semi_join(spark, tables):
    dim = tables["customer"].filter(F.col("c_acctbal") > 9000).select("c_custkey")
    fact = tables["orders"]
    got = bloom_semi_join(fact, dim, "o_custkey", "c_custkey")
    expect = fact.join(
        dim.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_semi"
    )
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_bloom_bitset_membership(spark):
    dim = spark.createDataFrame([(i,) for i in range(50)], "k long")
    words = bloom_bitset(dim, "k")
    probe = spark.createDataFrame([(i,) for i in range(200)], "k long")
    hits = probe.filter(bloom_might_contain(F.col("k"), words)).collect()
    got = {r.k for r in hits}
    # no false negatives; false positives possible but bounded
    assert set(range(50)) <= got
    assert len(got) < 120


def test_bloom_unconfirmed_is_superset(spark, tables):
    dim = tables["customer"].filter(F.col("c_acctbal") > 9000).select("c_custkey")
    fact = tables["orders"]
    approx = bloom_semi_join(fact, dim, "o_custkey", "c_custkey", confirm=False)
    exact = bloom_semi_join(fact, dim, "o_custkey", "c_custkey")
    assert exact.exceptAll(approx.select(*exact.columns)).count() == 0


# ---------------------------------------------------------------- merge
def test_merge_into_all_four_arms(spark):
    target = spark.createDataFrame(
        [(1, 10.0, "keep"), (2, 20.0, "upd"), (3, 30.0, "del")],
        "k long, bal double, tag string",
    )
    source = spark.createDataFrame(
        [(2, 5.0, False), (3, 0.0, True), (4, 40.0, False)],
        "k long, delta double, is_del boolean",
    )
    out = merge_into(
        target,
        source,
        "k",
        when_matched_update={"bal": F.col("t.bal") + F.col("s.delta")},
        when_matched_delete=F.col("s.is_del"),
        when_not_matched_insert={
            "bal": F.col("s.delta"),
            "tag": F.lit("new"),
        },
    )
    got = {r.k: (r.bal, r.tag) for r in out.collect()}
    assert got == {
        1: (10.0, "keep"),   # target-only pass-through
        2: (25.0, "upd"),    # matched update
        4: (40.0, "new"),    # insert
    }                        # 3 deleted


def test_merge_into_default_insert_uses_source_columns(spark):
    target = spark.createDataFrame([(1, 1.0)], "k long, v double")
    source = spark.createDataFrame([(2, 2.0)], "k long, v double")
    out = merge_into(target, source, "k").collect()
    got = {r.k: r.v for r in out}
    assert got == {1: 1.0, 2: 2.0}


# --------------------------------------------------------- edit distance
def test_edit_distance_dedup_finds_planted_pair(spark):
    rows = [
        (1, "the quick brown fox", "en", "web", 19),
        (2, "the quick brown fax", "en", "web", 19),   # dist 1
        (3, "completely different text!", "en", "web", 26),
        (4, "the quick brown fox", "fr", "web", 19),   # other block
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = edit_distance_dedup(df, band_width=32, max_dist=3).collect()
    assert {(r.id_a, r.id_b, r.dist) for r in out} == {(1, 2, 1)}


def test_edit_distance_finds_band_straddling_pair(spark):
    # lengths 31 and 33 land in bands 0 and 1 — the two-bucket
    # replication must still pair them (single-band blocking misses it)
    t1 = "a" * 31
    t2 = "a" * 33
    rows = [(1, t1, "en", "web", 31), (2, t2, "en", "web", 33)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = edit_distance_dedup(df, band_width=32, max_dist=3).collect()
    assert {(r.id_a, r.id_b, r.dist) for r in out} == {(1, 2, 2)}


def test_edit_distance_equal_band_pair_emitted_once(spark):
    rows = [
        (1, "same text here", "en", "web", 14),
        (2, "same text hera", "en", "web", 14),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = edit_distance_dedup(df, band_width=32, max_dist=3).collect()
    assert len(out) == 1 and (out[0].id_a, out[0].id_b, out[0].dist) == (1, 2, 1)


def test_edit_distance_respects_length_prefilter(spark):
    rows = [
        (1, "aaaa", "en", "web", 4),
        (2, "aaaabbbbbbbbbb", "en", "web", 14),  # same band (32) but |Δlen|>3
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert edit_distance_dedup(df, band_width=32, max_dist=3).count() == 0


# ---------------------------------------------------------------- graph
def test_cooccurrence_edges_symmetric(spark):
    edges = cooccurrence_edges(
        _baskets(spark), "basket", "item", min_support=2
    ).collect()
    got = {(r.src, r.dst) for r in edges}
    assert got == {
        (1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2), (3, 4), (4, 3)
    }


def test_pagerank_uniform_on_regular_graph(spark):
    # a 4-cycle is 2-regular: PageRank must stay uniform -> rank_rel=1
    und = [(1, 2), (2, 3), (3, 4), (4, 1)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    out = pagerank(edges, iterations=3).collect()
    assert {r.node for r in out} == {1, 2, 3, 4}
    assert all(abs(r.rank_rel - 1.0) < 1e-9 for r in out)


def test_pagerank_mass_conserved_and_hub_ranked_highest(spark):
    # star with center 0 and leaves 1..4 (symmetric edges)
    und = [(0, i) for i in range(1, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    rows = pagerank(edges, iterations=5).collect()
    ranks = {r.node: r.rank_rel for r in rows}
    assert max(ranks, key=ranks.get) == 0
    # rank_rel sums to N (mass conservation, scaled)
    assert abs(sum(ranks.values()) - 5.0) < 1e-4


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    und = [(1, 2), (2, 3), (1, 3), (3, 4)]
    pairs = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    nodes = sorted({a for a, _ in pairs})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, _ in pairs:
        deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        nxt = np.full(n, 0.15 / n)
        for a, b in pairs:
            nxt[idx[b]] += 0.85 * r[idx[a]] / deg[idx[a]]
        r = nxt
    got = {row.node: row.rank_rel for row in pagerank(edges, 5).collect()}
    for node, i in idx.items():
        assert got[node] == pytest.approx(r[i] * n, abs=2e-6)


def test_association_rules_confidence_and_lift(spark):
    from distributed_vector_database_spark.operators.mining import (
        association_rules,
    )

    out = association_rules(
        _baskets(spark), "basket", "item", min_support=2
    ).collect()
    got = {(r.ant, r.cons): (r.support, r.confidence, r.lift) for r in out}
    # item 1 in baskets {10,11,12}; item 2 in {10,11,12}; pair in 3
    # baskets; 5 baskets total: conf(1->2)=1.0, lift=1/(3/5)
    assert got[(1, 2)] == (3, 1.0, round(1.0 / (3 / 5), 6))
    # 1->3: pair {10,12} support 2, conf 2/3, P(3)=4/5 (item 3 in
    # baskets 10,12,13,14), lift=(2/3)/(4/5)
    assert got[(1, 3)] == (2, round(2 / 3, 6), round((2 / 3) / (4 / 5), 6))
    # rules are directed: 3->1 has conf 2/4
    assert got[(3, 1)] == (2, 0.5, round(0.5 / (3 / 5), 6))


def test_session_paths_counts_and_gap_split(spark):
    import datetime

    from distributed_vector_database_spark.operators.mining import session_paths

    base = datetime.datetime(2024, 1, 1)

    def ev(i, user, minutes, t):
        return (i, base + datetime.timedelta(minutes=minutes), user, t, 0.0)

    rows = [
        ev(1, 1, 0, "a"), ev(2, 1, 5, "b"), ev(3, 1, 10, "c"),
        ev(4, 1, 100, "d"), ev(5, 1, 105, "e"),   # gap > 30 min: new session
        ev(6, 2, 0, "a"), ev(7, 2, 5, "b"), ev(8, 2, 10, "c"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r.path: r.sessions for r in session_paths(df).collect()}
    assert got == {"a>b>c": 2, "d>e": 1}


def test_session_paths_truncates_to_max_len(spark):
    import datetime

    from distributed_vector_database_spark.operators.mining import session_paths

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1, t, 0.0)
        for i, t in enumerate(["a", "b", "c", "d", "e"])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r.path for r in session_paths(df, max_len=3).collect()}
    assert got == {"a>b>c"}


def _sym(spark, und):
    return spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )


def test_triangle_count_triangle_plus_tail(spark):
    from distributed_vector_database_spark.operators.graph import triangle_count

    row = triangle_count(_sym(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])).collect()[0]
    assert (row.nodes, row.edges, row.triangles) == (4, 4, 1)


def test_triangle_count_star_has_none(spark):
    from distributed_vector_database_spark.operators.graph import triangle_count

    row = triangle_count(_sym(spark, [(0, i) for i in range(1, 6)])).collect()[0]
    assert (row.nodes, row.edges, row.triangles) == (6, 5, 0)


def test_triangle_count_4_clique(spark):
    from distributed_vector_database_spark.operators.graph import triangle_count

    und = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    row = triangle_count(_sym(spark, und)).collect()[0]
    assert (row.nodes, row.edges, row.triangles) == (4, 6, 4)


def test_merge_into_null_delete_predicate_means_not_deleted(spark):
    target = spark.createDataFrame([(1, 10.0)], "k long, bal double")
    source = spark.createDataFrame(
        [(1, 2.0, None)], "k long, delta double, is_del boolean"
    )
    out = merge_into(
        target,
        source,
        "k",
        when_matched_update={"bal": F.col("t.bal") + F.col("s.delta")},
        when_matched_delete=F.col("s.is_del"),
    ).collect()
    # NULL is_del = NOT deleted (ANSI MERGE): the row must survive, updated
    assert [(r.k, r.bal) for r in out] == [(1, 12.0)]


def test_frequent_pairs_shuffle_fallback_above_broadcast_bound(spark):
    # force the bounded-broadcast probe over its threshold: the hint
    # is dropped and the shuffle semi join must produce identical rows
    from distributed_vector_database_spark.operators.mining import (
        _frequent_basket_items,
    )

    df = _baskets(spark)
    via_broadcast = _frequent_basket_items(
        df, "basket", "item", 2, 256
    ).collect()
    via_shuffle = _frequent_basket_items(
        df, "basket", "item", 2, 256, max_broadcast_items=1
    ).collect()
    key = lambda r: (r.basket, r.item)  # noqa: E731
    assert sorted(via_broadcast, key=key) == sorted(via_shuffle, key=key)
    out = frequent_pairs(df, "basket", "item", min_support=2, top_n=10)
    got = {(r.item_a, r.item_b): r.pair_support for r in out.collect()}
    assert got == {(1, 2): 3, (1, 3): 2, (2, 3): 2, (3, 4): 2}


def test_skyline_incremental_front_matches_concat(spark):
    # many tiny Arrow batches through one partition: the incremental
    # fold must equal the brute-force front
    import random

    rnd = random.Random(5)
    rows = [
        (i, float(rnd.randint(0, 20)), float(rnd.randint(0, 20)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double").coalesce(1)
    got = {r.id for r in skyline(df, ["x", "y"], "id").collect()}
    brute = {
        i
        for (i, x, y) in rows
        if not any(
            (x2 <= x and y2 <= y and (x2 < x or y2 < y))
            for (_, x2, y2) in rows
        )
    }
    assert got == brute


def test_bloom_null_keys_never_pass_probe(spark):
    from distributed_vector_database_spark.operators.bloom import (
        bloom_semi_join,
    )

    fact = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c"), (None, "d")], "k int, v string"
    )
    dim = spark.createDataFrame([(1,), (None,)], "k int")
    # NULL fact keys must not survive even the unconfirmed superset,
    # and NULL dim keys must not set bits
    sup = bloom_semi_join(fact, dim, "k", "k", confirm=False).collect()
    assert all(r.k is not None for r in sup)
    exact = {r.v for r in bloom_semi_join(fact, dim, "k", "k").collect()}
    assert exact == {"a"}


def test_pagerank_releases_edge_cache(spark):
    # the edge-sized adj cache must be unpersisted before return; the
    # only storage a call may leave behind is the node-sized
    # localCheckpoint of the returned result (ContextCleaner-collected
    # once the caller drops the DataFrame)
    edges = cooccurrence_edges(_baskets(spark), "basket", "item", 2)
    sc = spark.sparkContext._jsc.sc()
    before = len(sc.getRDDStorageInfo())
    out = pagerank(edges, iterations=2)
    out.collect()
    after = len(sc.getRDDStorageInfo())
    assert after <= before + 1


def test_grouped_skyline_matches_per_group_bruteforce(spark):
    import random

    rnd = random.Random(11)
    rows = [
        (i, f"g{rnd.randint(0, 3)}", float(rnd.randint(0, 12)),
         float(rnd.randint(0, 12)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, g string, x double, y double")
    got = {
        r.id
        for r in skyline(df, ["x", "y"], "id", group_by=["g"]).collect()
    }
    brute = {
        i
        for (i, g, x, y) in rows
        if not any(
            g2 == g and x2 <= x and y2 <= y and (x2 < x or y2 < y)
            for (_, g2, x2, y2) in rows
        )
    }
    assert got == brute
