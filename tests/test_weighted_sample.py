"""Efraimidis–Spirakis weighted sampling: exact parity with a local
replication of the hash formula, invariants, and the
weight-proportionality of the A-ES key construction itself."""

from __future__ import annotations

import hashlib
import math


def _h32(key, seed):
    return int(hashlib.md5(f"{key}|{seed}".encode()).hexdigest()[:8], 16)


def _es_key(key, w, seed):
    u = (_h32(key, seed) + 0.5) / 2**32
    return -math.log(u) / w


def test_weighted_sample_matches_local_replication(spark):
    from distributed_vector_database_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, float(1 + (i % 5))) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r["doc_id"] for r in weighted_sample(
        df, "w", n=10, seed=3
    ).orderBy("doc_id").collect()]
    expect = sorted(
        (d for d, _ in rows), key=lambda d: (_es_key(d, 1 + d % 5, 3), d)
    )[:10]
    assert got == sorted(expect)


def test_weighted_sample_invariants(spark):
    from distributed_vector_database_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, 2.0), (5, 1.0)],
        "doc_id long, w double",
    )
    got = [r["doc_id"] for r in weighted_sample(df, "w", n=10).collect()]
    # zero/negative weights never win; no duplicates; n caps at eligible
    assert sorted(got) == [1, 4, 5]
    # different seeds draw different samples over a larger corpus
    big = spark.createDataFrame(
        [(i, 1.0) for i in range(200)], "doc_id long, w double"
    )
    a = {r["doc_id"] for r in weighted_sample(big, "w", 20, seed=1).collect()}
    b = {r["doc_id"] for r in weighted_sample(big, "w", 20, seed=2).collect()}
    assert a != b and len(a) == len(b) == 20


def test_es_key_formula_is_weight_proportional():
    """Pure-python check of the A-ES construction the operator uses:
    over many seeds, a weight-10 item is selected into a 1-of-2 draw
    against a weight-1 item ~10/11 of the time."""
    wins = sum(
        _es_key("heavy", 10.0, s) < _es_key("light", 1.0, s)
        for s in range(2000)
    )
    assert abs(wins / 2000 - 10 / 11) < 0.03


def test_weighted_sample_grouped_matches_local_replication(spark):
    """Per-group A-ES draw == a local per-group sort by the replicated
    exponential keys, for every group — and the two-stage top-n must
    be invariant to the physical partitioning (the stage-1 prune is a
    superset of each group's global winners by construction)."""
    from distributed_vector_database_spark.operators.sampling import (
        weighted_sample_grouped,
    )

    rows = [
        (i, ["en", "de", "fr"][i % 3], float(1 + (i % 7)))
        for i in range(120)
    ] + [(200, "zz", 0.0), (201, "zz", -1.0)]  # non-positive: excluded
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")

    def local_expect(k):
        by_group: dict = {}
        for i, g, w in rows:
            if w > 0:
                by_group.setdefault(g, []).append(
                    (_es_key(i, w, 5), i)
                )
        out = set()
        for g, ks in by_group.items():
            for _, i in sorted(ks)[:k]:
                out.add((i, g))
        return out

    for parts in (1, 13):
        got = {
            (r["doc_id"], r["lang"])
            for r in weighted_sample_grouped(
                df.repartition(parts),
                "w",
                n_per_group=8,
                group_col="lang",
                key_col="doc_id",
                seed=5,
            ).collect()
        }
        assert got == local_expect(8), parts

    # n larger than any group returns every positive-weight row
    all_got = weighted_sample_grouped(
        df, "w", n_per_group=1000, group_col="lang", key_col="doc_id", seed=5
    ).count()
    assert all_got == 120

    import pytest as _pt

    with _pt.raises(ValueError):
        weighted_sample_grouped(df, "w", 0)
