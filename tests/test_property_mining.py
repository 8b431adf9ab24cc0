"""Property-based tests (hypothesis) for the round-10 mining/graph/
merge operators: each must agree with a plain-Python brute force for
ANY small input — the semantics as invariants, not examples."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=15,
)


@given(points)
@settings(**_SETTINGS)
def test_skyline_equals_bruteforce(spark, pts):
    from distributed_vector_database_spark.operators.mining import skyline

    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r.id for r in skyline(df, ["x", "y"], "id").collect()}
    expect = set()
    for i, (xi, yi) in enumerate(pts):
        dominated = any(
            (xj <= xi and yj <= yi and (xj < xi or yj < yi))
            for j, (xj, yj) in enumerate(pts)
        )
        if not dominated:
            expect.add(i)
    assert got == expect


und_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=16,
)


@given(und_edges)
@settings(**_SETTINGS)
def test_triangle_count_equals_bruteforce(spark, raw):
    from itertools import combinations

    from distributed_vector_database_spark.operators.graph import triangle_count

    und = {(min(a, b), max(a, b)) for a, b in raw}
    sym = list(und) + [(b, a) for a, b in und]
    df = spark.createDataFrame(sym, "src long, dst long")
    row = triangle_count(df).collect()[0]
    nodes = {n for e in und for n in e}
    tris = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )
    assert (row.nodes, row.edges, row.triangles) == (len(nodes), len(und), tris)


baskets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # basket
        st.integers(min_value=0, max_value=6),   # item
    ),
    min_size=1,
    max_size=30,
)


@given(baskets, st.integers(min_value=1, max_value=3))
@settings(**_SETTINGS)
def test_frequent_pairs_equals_bruteforce(spark, bi, min_support):
    from itertools import combinations

    from distributed_vector_database_spark.operators.mining import frequent_pairs

    df = spark.createDataFrame(bi, "basket long, item long")
    got = {
        (r.item_a, r.item_b): r.pair_support
        for r in frequent_pairs(
            df, "basket", "item", min_support=min_support, top_n=1000
        ).collect()
    }
    distinct = {(b, i) for b, i in bi}
    item_support = Counter(i for _, i in distinct)
    freq = {i for i, c in item_support.items() if c >= min_support}
    by_basket: dict[int, set] = {}
    for b, i in distinct:
        if i in freq:
            by_basket.setdefault(b, set()).add(i)
    pair_support: Counter = Counter()
    for items in by_basket.values():
        if len(items) > 256:
            continue
        for a, c in combinations(sorted(items), 2):
            pair_support[(a, c)] += 1
    expect = {p: c for p, c in pair_support.items() if c >= min_support}
    assert got == expect


merge_targets = st.lists(
    st.tuples(st.integers(0, 6), st.floats(-5, 5, allow_nan=False, width=16)),
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],
)
merge_sources = st.lists(
    st.tuples(
        st.integers(0, 9),
        st.floats(-5, 5, allow_nan=False, width=16),
        st.booleans(),
    ),
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],
)


@given(merge_targets, merge_sources)
@settings(**_SETTINGS)
def test_merge_into_equals_dict_merge(spark, tgt, src):
    from distributed_vector_database_spark.operators.changelog import merge_into

    target = spark.createDataFrame(tgt, "k long, bal double")
    source = spark.createDataFrame(src, "k long, delta double, is_del boolean")
    out = merge_into(
        target,
        source,
        "k",
        when_matched_update={"bal": F.col("t.bal") + F.col("s.delta")},
        when_matched_delete=F.col("s.is_del"),
        when_not_matched_insert={"bal": F.col("s.delta")},
    ).collect()
    got = {r.k: r.bal for r in out}
    state = {k: b for k, b in tgt}
    for k, delta, is_del in src:
        if k in state:
            if is_del:
                del state[k]
            else:
                state[k] += delta
        else:
            state[k] = delta
    assert set(got) == set(state)
    for k in state:
        assert abs(got[k] - state[k]) < 1e-9


transitions_seqs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # user
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=0,
    max_size=20,
)


@given(transitions_seqs)
@settings(**_SETTINGS)
def test_event_transitions_equals_bruteforce(spark, seq):
    from distributed_vector_database_spark.operators.mining import (
        event_transitions,
    )

    rows = [
        (i, u, t)
        for i, (u, t) in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    got = {
        (r.prev_type, r.next_type): (r.transitions, r.prob)
        for r in event_transitions(df).collect()
    }
    per_user: dict[int, list] = {}
    for i, (u, t) in enumerate(seq):
        per_user.setdefault(u, []).append(t)
    counts: Counter = Counter()
    for types in per_user.values():
        for a, b in zip(types, types[1:]):
            counts[(a, b)] += 1
    row_tot: Counter = Counter()
    for (a, _), c in counts.items():
        row_tot[a] += c
    expect = {
        p: (c, round(c / row_tot[p[0]], 6)) for p, c in counts.items()
    }
    assert got == expect
