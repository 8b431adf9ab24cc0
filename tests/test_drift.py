"""Embedding drift monitor: a planted mean shift in one dimension must
flag exactly that dimension; identical snapshots flag nothing."""

from __future__ import annotations

import numpy as np


def _corpus(spark, n=300, dim=4, seed=3, shift_dim=None, shift=2.0):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim))
    if shift_dim is not None:
        mat[:, shift_dim] += shift
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_drift_flags_only_the_shifted_dimension(spark):
    from distributed_vector_database_spark.operators.evaluation import (
        embedding_drift_report,
    )

    ref = _corpus(spark, seed=3)
    cur = _corpus(spark, seed=4, shift_dim=2, shift=2.0)
    rows = {r["dim"]: r for r in embedding_drift_report(ref, cur).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[2]["drifted"] and rows[2]["shift_z"] > 10
    for d in (0, 1, 3):
        assert not rows[d]["drifted"], (d, rows[d]["shift_z"])
    # spread untouched: std_ratio ~ 1 everywhere
    assert all(0.8 < rows[d]["std_ratio"] < 1.25 for d in rows)


def test_drift_identical_snapshots_all_clean(spark):
    from distributed_vector_database_spark.operators.evaluation import (
        embedding_drift_report,
    )

    ref = _corpus(spark, seed=5)
    rows = embedding_drift_report(ref, ref).collect()
    assert all(not r["drifted"] and r["shift_z"] == 0.0 for r in rows)
    assert all(r["ref_mean"] == r["cur_mean"] for r in rows)


def test_drift_null_vectors_ignored(spark):
    from distributed_vector_database_spark.operators.evaluation import (
        embedding_drift_report,
    )

    ref = _corpus(spark, n=50, dim=2, seed=6)
    cur = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, None), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    rows = embedding_drift_report(ref, cur).collect()
    assert {r["dim"] for r in rows} == {0, 1}
    assert all(r["cur_std"] is not None for r in rows)
