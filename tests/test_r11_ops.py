"""Round-11 operator batch: k-core / label propagation / neighborhood
Jaccard (graph.py), EWMA / MAD / cumulative users / peak concurrency
(timeseries.py), explicit HLL registers (sketch.py), and n-gram
containment (dedup.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.graph import (
    kcore,
    label_propagation,
    neighborhood_jaccard,
)
from distributed_vector_database_spark.operators.sketch import (
    hll_estimate,
    hll_merge,
    hll_registers,
)
from distributed_vector_database_spark.operators.timeseries import (
    cumulative_new_users,
    ewma_smooth,
    mad_outliers,
    peak_concurrency,
)


def _sym(spark, und_pairs):
    rows = [(a, b) for a, b in und_pairs] + [(b, a) for a, b in und_pairs]
    return spark.createDataFrame(rows, "src long, dst long")


# ------------------------------------------------------------------ graph
def test_kcore_peels_tail_and_keeps_clique(spark):
    # 4-clique {1,2,3,4} plus tail 4-5-6: 2-core = the clique + nothing
    # of the tail (5,6 peel in two rounds, then 4 keeps degree 3)
    edges = _sym(
        spark,
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
    )
    got = {r.node: r.deg for r in kcore(edges, 2, rounds=4).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_converged_matches_iterative_peel_bruteforce(spark):
    import random

    rnd = random.Random(7)
    und = {
        tuple(sorted((rnd.randint(1, 30), rnd.randint(1, 30))))
        for _ in range(60)
    }
    und = [(a, b) for a, b in und if a != b]
    got = {r.node for r in kcore(_sym(spark, und), 3, rounds=30).collect()}

    # brute-force peel to fixpoint
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < 3:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    assert got == set(adj)


def test_label_propagation_converges_to_components(spark):
    # two components {1,2,3} and {10, 11}: labels become component minima
    edges = _sym(spark, [(1, 2), (2, 3), (10, 11)])
    got = {r.node: r.label for r in label_propagation(edges, 4).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_label_propagation_path_needs_iterations(spark):
    # a path 1-2-3-4-5: after 1 sync iteration node 5 has label 4;
    # after 4 iterations everything is 1
    edges = _sym(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    one = {r.node: r.label for r in label_propagation(edges, 1).collect()}
    assert one == {1: 1, 2: 1, 3: 2, 4: 3, 5: 4}
    four = {r.node: r.label for r in label_propagation(edges, 4).collect()}
    assert set(four.values()) == {1}


def test_neighborhood_jaccard_excludes_direct_edges(spark):
    # star: 1-2, 1-3, 1-4 and edge 2-3. Pairs through common neighbor 1:
    # (2,3) direct -> excluded; (2,4): common=1, deg2=2, deg4=1 -> 1/2;
    # (3,4): same 1/2
    edges = _sym(spark, [(1, 2), (1, 3), (1, 4), (2, 3)])
    got = {(r.a, r.b): (r.common, r.jaccard) for r in
           neighborhood_jaccard(edges, 10).collect()}
    assert got == {(2, 4): (1, 0.5), (3, 4): (1, 0.5)}


# ------------------------------------------------------------- timeseries
def test_ewma_matches_closed_form(spark):
    # three consecutive hours of one type: cnt 4, 2, 8; alpha=0.5 span=24
    rows = []
    eid = 0
    for h, n in [(0, 4), (1, 2), (2, 8)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, 1, "a", float(h * 3600)))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, sec double"
    ).select(
        "event_id", "user_id", "event_type",
        F.timestamp_seconds("sec").alias("ts"),
    )
    got = {r.cnt: r.ewma for r in ewma_smooth(df, alpha=0.5).collect()}
    assert got[4] == 4.0
    assert got[2] == round((2 + 0.5 * 4) / 1.5, 6)
    assert got[8] == round((8 + 0.5 * 2 + 0.25 * 4) / 1.75, 6)


def test_ewma_gap_hours_contribute_nothing(spark):
    # hours 0 and 30 (gap > span): each hour is its own window
    rows = [(1, 1, "a", 0.0), (2, 1, "a", 30 * 3600.0)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, sec double"
    ).select("event_id", "user_id", "event_type",
             F.timestamp_seconds("sec").alias("ts"))
    out = ewma_smooth(df, alpha=0.5, span=24).collect()
    assert [r.ewma for r in out] == [1.0, 1.0]


def test_mad_outliers_flags_planted_extreme(spark):
    vals = [10.0] * 5 + [11.0] * 5 + [1000.0]
    rows = [(i, 1, "t", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    # 11 values: median = the 6th = 11; absdevs [1x5, 0x5, 989] -> mad 1
    r = mad_outliers(df, k=3.5).collect()[0]
    assert r.med == 11.0 and r.mad == 1.0
    assert r.n_outliers == 1 and r.max_abs_dev == 989.0


def test_mad_outliers_robust_where_zscore_fails(spark):
    # one colossal outlier inflates stddev so badly that a 3-sigma rule
    # misses it... MAD does not care
    vals = [5.0] * 20 + [10.0**6]
    rows = [(i, 1, "t", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    r = mad_outliers(df, k=3.5).collect()[0]
    assert r.n_outliers >= 1  # mad = 0 -> any deviation flags


def test_cumulative_new_users_counts_first_seen_only(spark):
    rows = [
        (1, 100, 0.0), (2, 100, 86400.0),          # user 100: day0 only
        (3, 200, 86400.0), (4, 300, 86400.0),      # 200, 300 new day1
        (5, 200, 2 * 86400.0),                     # returning -> day2
    ]                                              # gets a 0-new row
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec double"
    ).select("event_id", "user_id", F.timestamp_seconds("sec").alias("ts"))
    out = cumulative_new_users(df).collect()
    assert [(r.new_users, r.cum_users) for r in out] == [
        (1, 1), (2, 3), (0, 3),
    ]


def test_peak_concurrency_sweep_line(spark):
    # day 0: u1 [0, 100], u2 [50, 150], u3 [200, 300]
    # peak = 2 (u1 and u2 overlap); interval ending exactly when
    # another starts does NOT overlap (u1 ends 100 < u2 still active)
    rows = [
        (1, 1, 0.0), (2, 1, 100.0),
        (3, 2, 50.0), (4, 2, 150.0),
        (5, 3, 200.0), (6, 3, 300.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec double"
    ).select("event_id", "user_id", F.timestamp_seconds("sec").alias("ts"))
    out = peak_concurrency(df).collect()
    assert len(out) == 1 and out[0].peak == 2 and out[0].n_users == 3


def test_peak_concurrency_touching_intervals_do_not_overlap(spark):
    # u1 [0, 100], u2 [100, 200]: the -1 sorts before the +1 at t=100
    rows = [(1, 1, 0.0), (2, 1, 100.0), (3, 2, 100.0), (4, 2, 200.0)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec double"
    ).select("event_id", "user_id", F.timestamp_seconds("sec").alias("ts"))
    assert peak_concurrency(df).collect()[0].peak == 1


# ----------------------------------------------------------------- sketch
def test_hll_registers_deterministic_and_bounded(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    regs = hll_registers(df, "k", p=6).collect()
    assert len(regs) <= 64
    assert all(1 <= r.register <= 55 for r in regs)
    again = hll_registers(df, "k", p=6).collect()
    assert sorted(map(tuple, regs)) == sorted(map(tuple, again))


def test_hll_merge_equals_union_sketch(spark):
    a = spark.createDataFrame([(i,) for i in range(300)], "k long")
    b = spark.createDataFrame([(i,) for i in range(200, 600)], "k long")
    u = spark.createDataFrame([(i,) for i in range(600)], "k long")
    merged = hll_merge(
        hll_registers(a, "k"), hll_registers(b, "k")
    ).collect()
    direct = hll_registers(u, "k").collect()
    assert sorted(map(tuple, merged)) == sorted(map(tuple, direct))


def test_hll_estimate_within_theoretical_error(spark):
    n = 5000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "k string")
    r = hll_estimate(df, "k", p=6).collect()[0]
    assert r.exact == n
    # sigma = 1.04/sqrt(64) ~ 13%; allow 4 sigma
    assert abs(r.est - n) / n < 4 * 1.04 / math.sqrt(64)


def test_hll_estimate_small_range_linear_counting(spark):
    df = spark.createDataFrame([(f"u{i}",) for i in range(10)], "k string")
    r = hll_estimate(df, "k", p=6).collect()[0]
    assert r.exact == 10
    assert abs(r.est - 10) / 10 < 0.4


# ------------------------------------------------------------ containment
def test_containment_finds_subset_jaccard_misses(spark):
    from distributed_vector_database_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "totally unrelated content here")],
        "doc_id long, text string",
    )
    out = {
        (r.id_a, r.id_b): (r.containment, r.jaccard)
        for r in ngram_containment_pairs(df, threshold=0.9).collect()
    }
    assert (1, 2) in out
    c, j = out[(1, 2)]
    assert c == 1.0 and j < 0.5  # the asymmetric measure sees what J cannot


def test_personalized_pagerank_matches_numpy(spark):
    import numpy as np

    from distributed_vector_database_spark.operators.graph import (
        personalized_pagerank,
    )

    und = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (4, 5)]
    edges = _sym(spark, und)
    seeds = spark.createDataFrame([(1,), (2,)], "node long")
    got = {
        r.node: r.rank_rel
        for r in personalized_pagerank(edges, seeds, iterations=4).collect()
    }

    nodes = sorted({x for e in und for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, b in und:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    r = np.zeros(n)
    s = [idx[1], idx[2]]
    r[s] = 1 / len(s)
    d = 0.85
    for _ in range(4):
        nxt = np.zeros(n)
        nxt[s] += (1 - d) / len(s)
        for a, b in und:
            nxt[idx[b]] += d * r[idx[a]] / deg[idx[a]]
            nxt[idx[a]] += d * r[idx[b]] / deg[idx[b]]
        r = nxt
    expect = {v: round(r[idx[v]] * n, 6) for v in nodes}
    assert set(got) == set(expect)
    for v in nodes:
        assert abs(got[v] - expect[v]) < 1e-6
    # restart mass concentrates near the seeds
    assert got[1] > got[5] and got[2] > got[5]


def test_personalized_pagerank_conserves_mass(spark):
    from distributed_vector_database_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = _sym(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    seeds = spark.createDataFrame([(1,)], "node long")
    out = personalized_pagerank(edges, seeds, iterations=6).collect()
    total = sum(r.rank_rel for r in out)  # ranks scaled by n: sum = n
    assert abs(total - 4.0) < 1e-4


def test_personalized_pagerank_rejects_disjoint_seeds(spark):
    from distributed_vector_database_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = _sym(spark, [(1, 2)])
    seeds = spark.createDataFrame([(99,)], "node long")
    with pytest.raises(ValueError):
        personalized_pagerank(edges, seeds)
