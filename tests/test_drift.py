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


def test_drift_report_before_first_batch_returns_empty(spark, tmp_path):
    """drift_state_init seeds an empty current ledger, so a standalone
    drift_report() before any micro-batch returns an EMPTY report
    instead of dying on a missing {state_dir}/current path (r8 ADVICE
    low); the first fold then accumulates into the same layout."""
    from distributed_vector_database_spark.streaming.drift import (
        drift_report,
        drift_state_init,
    )

    state = str(tmp_path / "drift_state")
    drift_state_init(_corpus(spark, n=60, dim=3, seed=8), state)
    rep = drift_report(spark, state)
    assert rep.count() == 0
    assert "shift_z" in rep.columns and "drifted" in rep.columns

    # the seed partition is a NUMERIC sentinel (batch=-1): once a fold
    # writes batch=N siblings, the discovered `batch` partition column
    # must stay integer-typed for external readers that filter or cast
    # it numerically (r9 ADVICE — a batch=init string seed pinned the
    # column to string forever)
    from pyspark.sql import functions as F

    from distributed_vector_database_spark.streaming.drift import (
        build_drift_fold,
    )

    build_drift_fold(state)(_corpus(spark, n=30, dim=3, seed=9), 0)
    cur = spark.read.parquet(f"{state}/current")
    assert dict(cur.dtypes)["batch"] in ("int", "bigint")
    assert cur.filter(F.col("batch") >= 0).count() > 0  # numeric filter works


def test_streaming_drift_matches_batch_monitor(spark, tmp_path):
    """Two micro-batches folded through run_drift_stream produce the
    same statistics as the batch monitor over the union (moment-merge
    ≡ direct aggregation, modulo float dust), and the planted shift is
    flagged in the final versioned report."""
    import json

    from distributed_vector_database_spark.operators.evaluation import (
        embedding_drift_report,
    )
    from distributed_vector_database_spark.streaming.drift import (
        drift_state_init,
        run_drift_stream,
    )

    ref = _corpus(spark, n=200, dim=4, seed=11)
    cur = _corpus(spark, n=150, dim=4, seed=12, shift_dim=1, shift=1.5)
    state = str(tmp_path / "state")
    drift_state_init(ref, state)

    rows = cur.collect()
    vecs_dir = tmp_path / "vecs_in"
    vecs_dir.mkdir()
    for b, chunk in enumerate((rows[:70], rows[70:])):
        (vecs_dir / f"b{b}.json").write_text(
            "".join(
                json.dumps({"vec_id": r["vec_id"], "embedding": r["embedding"]})
                + "\n"
                for r in chunk
            )
        )
    q = run_drift_stream(
        spark, str(vecs_dir), state, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    import glob

    reports = sorted(glob.glob(f"{state}/reports/batch=*"))
    assert len(reports) == 2
    streamed = {r["dim"]: r for r in spark.read.parquet(reports[-1]).collect()}
    batch = {r["dim"]: r for r in embedding_drift_report(ref, cur).collect()}
    for d in range(4):
        assert abs(streamed[d]["cur_mean"] - batch[d]["cur_mean"]) < 1e-5
        assert abs(streamed[d]["cur_std"] - batch[d]["cur_std"]) < 1e-5
        assert abs(streamed[d]["shift_z"] - batch[d]["shift_z"]) < 0.01
        assert streamed[d]["drifted"] == batch[d]["drifted"]
    assert streamed[1]["drifted"] and not streamed[0]["drifted"]
