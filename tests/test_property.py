"""Property-based tests (hypothesis): the change-log fold must agree
with a plain dict replay for ANY op sequence — the reference's WAL
semantics (last-op-per-key, delete folds, resurrect-after-delete;
src/utils/wal_manager.py:116-182) as an invariant, not an example."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_vector_database_spark.operators.changelog import compact

KEYS = ["a", "b", "c", "d"]

ops = st.lists(
    st.tuples(
        st.sampled_from(["PUT", "DELETE"]),
        st.sampled_from(KEYS),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
    ),
    min_size=0,
    max_size=25,
)


vectors = st.lists(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=4,
        max_size=4,
    ),
    min_size=1,
    max_size=12,
)


@given(vectors, st.integers(min_value=1, max_value=6))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_knn_matches_numpy_oracle(spark, vecs, k):
    """knn_exact == numpy argsort on rounded squared-L2 with id
    tie-break, for arbitrary small corpora."""
    import numpy as np

    from distributed_vector_database_spark.operators.knn import knn_exact

    q = vecs[0]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = [
        (r["vec_id"], r["score"])
        for r in knn_exact(df, q, k=k, extra_cols=()).collect()
    ]
    arr = np.asarray(vecs, dtype=np.float64)
    d = np.round(((arr - np.asarray(q, dtype=np.float64)) ** 2).sum(axis=1), 6)
    order = sorted(range(len(vecs)), key=lambda i: (d[i], i))[:k]
    assert got == [(i, d[i]) for i in order]


texts = st.lists(
    st.text(alphabet="ab cd", min_size=1, max_size=40),
    min_size=2,
    max_size=8,
)


@given(texts)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_jaccard_pairs_invariants(spark, docs_txt):
    """Jaccard is within [0,1], symmetric-by-construction (id_a<id_b),
    and identical texts always score 1.0."""
    from distributed_vector_database_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rows = [(i, t) for i, t in enumerate(docs_txt)] + [
        (len(docs_txt), docs_txt[0])  # guaranteed exact duplicate of doc 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, threshold=0.0).collect()
    assert all(0.0 <= p["jaccard"] <= 1.0 for p in pairs)
    assert all(p["id_a"] < p["id_b"] for p in pairs)
    dup = [p for p in pairs if p["id_a"] == 0 and p["id_b"] == len(docs_txt)]
    assert dup and dup[0]["jaccard"] == 1.0


@given(ops)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_compact_equals_dict_replay(spark, op_seq):
    # seq index doubles as both timestamp and tie-break
    rows = [
        (op, key, float(val), i, i) for i, (op, key, val) in enumerate(op_seq)
    ]
    # dict oracle: replay in order, last op wins
    state: dict[str, float] = {}
    for op, key, val, _, _ in rows:
        if op == "PUT":
            state[key] = val
        else:
            state.pop(key, None)

    if not rows:
        return
    log = spark.createDataFrame(
        rows, "op string, key string, value double, ts long, seq long"
    )
    got = {r["key"]: r["value"] for r in compact(log, seq_col="seq").collect()}
    assert got == state


def _winnow_py(text, k=5, window=4):
    """Independent pure-Python mirror of winnowing (MOSS) for the
    property check — validates the Spark expression against a third
    implementation, not just the DuckDB oracle."""
    import hashlib
    import re

    t = re.sub(r"\s+", " ", text.lower()).strip()
    if len(t) < k:
        return set()
    grams = [
        int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(len(t) - k + 1)
    ]
    nwin = max(len(grams) - window + 1, 1)
    return {min(grams[j : j + window]) for j in range(nwin)}


texts = st.lists(
    st.text(alphabet="abcdef gh\t\n", min_size=0, max_size=60),
    min_size=1,
    max_size=6,
)


@given(texts)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_winnow_fingerprints_match_python_mirror(spark, batch):
    from distributed_vector_database_spark.operators.textops import doc_fingerprints

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    got = {}
    for r in doc_fingerprints(df, k=5, window=4).collect():
        got.setdefault(r["id"], set()).add(r["fp"])
    want = {i: _winnow_py(t) for i, t in enumerate(batch) if _winnow_py(t)}
    assert got == want


word_texts = st.lists(
    st.lists(
        st.sampled_from(["ab", "cd", "ef", "gh", "ij"]),
        min_size=0,
        max_size=12,
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


@given(word_texts)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_collapse_repetitions_matches_python_and_is_idempotent(spark, batch):
    """collapse == itertools.groupby key sequence, and collapsing an
    already-collapsed corpus is the identity."""
    from itertools import groupby

    from distributed_vector_database_spark.operators.textops import (
        collapse_repetitions,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    out = collapse_repetitions(df)
    got = {r["doc_id"]: r["clean_text"] for r in out.collect()}
    for i, t in enumerate(batch):
        toks = t.lower().split()
        want = " ".join(k for k, _ in groupby(toks))
        assert got[i] == want, (t, got[i], want)
    # idempotence
    again = collapse_repetitions(
        out.withColumnRenamed("clean_text", "text")
    )
    got2 = {r["doc_id"]: r["clean_text"] for r in again.collect()}
    assert got2 == got


@given(word_texts, st.integers(min_value=1, max_value=4))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_decontaminate_invariants(spark, batch, n):
    """Self-decontamination kills every doc with >= n tokens (every
    gram overlaps itself); survivors are exactly the gramless docs.
    And decontaminating against an empty eval set is the identity."""
    from distributed_vector_database_spark.operators.decontam import (
        decontaminate,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    self_clean = {
        r["doc_id"] for r in decontaminate(df, df, n=n).collect()
    }
    want = {i for i, t in enumerate(batch) if len(t.split()) < n}
    assert self_clean == want
    empty = df.limit(0)
    assert {
        r["doc_id"] for r in decontaminate(df, empty, n=n).collect()
    } == set(range(len(batch)))


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=1, allow_nan=False),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=300),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_token_budget_monotone_and_exact(spark, rows, budget):
    """Budget selection == the Python greedy prefix; and a larger
    budget selects a superset."""
    from distributed_vector_database_spark.operators.sampling import (
        select_by_token_budget,
    )

    df = spark.createDataFrame(
        [(i, float(q), int(t)) for i, (q, t) in enumerate(rows)],
        "doc_id long, quality double, n_tokens int",
    )
    got = {
        r["doc_id"]
        for r in select_by_token_budget(df, budget, partitions=3).collect()
    }
    order = sorted(
        ((i, q, t) for i, (q, t) in enumerate(rows)),
        key=lambda x: (-x[1], x[0]),
    )
    cum, want = 0, set()
    for i, _, t in order:
        if cum + t > budget:
            break
        cum += t
        want.add(i)
    assert got == want
    bigger = {
        r["doc_id"]
        for r in select_by_token_budget(
            df, budget + 60, partitions=2
        ).collect()
    }
    assert got <= bigger


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),            # group id
            st.floats(min_value=0, max_value=1, allow_nan=False),
            st.integers(min_value=1, max_value=40),           # tokens
        ),
        min_size=1,
        max_size=14,
    ),
    st.integers(min_value=0, max_value=200),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_grouped_budget_equals_per_group_python_greedy(spark, rows, cap):
    """The grouped cap == running the Python greedy prefix per group
    independently; each group's running total never exceeds its cap,
    and other groups' contents never affect a group's selection."""
    from distributed_vector_database_spark.operators.sampling import (
        select_by_token_budget_grouped,
    )

    df = spark.createDataFrame(
        [
            (i, f"g{g}", float(q), int(t))
            for i, (g, q, t) in enumerate(rows)
        ],
        "doc_id long, source string, quality double, n_tokens int",
    )
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in select_by_token_budget_grouped(
            df, cap, partitions=3
        ).collect()
    }
    want = {}
    for g in {r[0] for r in rows}:
        order = sorted(
            ((i, q, t) for i, (gg, q, t) in enumerate(rows) if gg == g),
            key=lambda x: (-x[1], x[0]),
        )
        cum = 0
        for i, _, t in order:
            if cum + t > cap:
                break
            cum += t
            want[i] = cum
    assert got == want


@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=0,
        max_size=16,
    ),
    st.integers(min_value=1, max_value=5),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_curriculum_positions_bijective_and_stage_monotone(
    spark, scores, n_stages
):
    """curriculum_order is a bijection onto 1..n, stage never
    decreases along positions, and stage respects the score order
    (a lower-staged doc never has a strictly higher 6dp score)."""
    from distributed_vector_database_spark.operators.sampling import (
        curriculum_order,
    )

    df = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(scores)],
        "doc_id long, difficulty double",
    )
    got = sorted(
        curriculum_order(
            df, "difficulty", n_stages=n_stages, seed="p", partitions=3
        ).collect(),
        key=lambda r: r["curriculum_pos"],
    )
    assert [r["curriculum_pos"] for r in got] == list(
        range(1, len(scores) + 1)
    )
    stages = [r["stage"] for r in got]
    assert stages == sorted(stages)
    by_id = {r["doc_id"]: r["stage"] for r in got}
    for i, si in enumerate(scores):
        for j, sj in enumerate(scores):
            if round(si, 6) < round(sj, 6):
                assert by_id[i] <= by_id[j], (i, j, si, sj)


keysets = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
    min_size=0,
    max_size=60,
)


@given(keysets, st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=16))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_heavy_hitters_equals_plain_counter(spark, keys, s, parts):
    """heavy_hitters == collections.Counter thresholding for ANY
    multiset, threshold, and physical partitioning — the candidate
    bar is a guaranteed superset, so no layout may change the
    answer."""
    from collections import Counter

    from distributed_vector_database_spark.operators.skew import (
        heavy_hitters,
    )

    if not keys:
        return
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "i long, k string"
    ).repartition(parts)
    got = [(r["k"], r["n"]) for r in heavy_hitters(df, "k", s).collect()]
    want = sorted(
        ((k, c) for k, c in Counter(keys).items() if c >= s),
        key=lambda t: (-t[1], t[0]),
    )
    assert got == want
