"""Scale smokes for the round-10 monitoring/path operators:

- session_paths: 10M events / 100k users — truncation happens before
  collect_list, so the heaviest session costs max_len rows
- grouped_trend: 10M rows, 20 groups — one agg pass, |groups| output
- volume_anomalies: 10M events, 8 types — windows over the tiny rollup
- dq fold: 10M-row stream in 4 batches (rules + uniqueness + FK) vs
  the one-shot audit — counts must match exactly
- pca_fit + whiten-project: 1M x 64-d — moments pass + codegen project

Usage: python tools/monitor_smoke.py
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from distributed_vector_database_spark.session import get_spark


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.1f}s {out}")


def main() -> None:
    spark = get_spark(app_name="dvds-monitor-smoke")

    ev = spark.range(10_000_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 100_000).alias("user_id"),
        F.concat(F.lit("t"), F.pmod(F.xxhash64("id"), 8)).alias("event_type"),
        F.timestamp_seconds(F.col("id") / 50).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 1000) / 10.0).alias("value"),
    )
    ev.cache().count()

    from distributed_vector_database_spark.operators.mining import session_paths

    timed(
        "session_paths 10M events/100k users",
        lambda: session_paths(ev, gap_minutes=30, max_len=8, top_n=20).count(),
    )

    from distributed_vector_database_spark.operators.evaluation import (
        grouped_trend,
        volume_anomalies,
    )

    timed(
        "grouped_trend 10M rows/8 groups",
        lambda: grouped_trend(
            ev, "event_type", F.col("ts").cast("double") / 86400.0, "value"
        ).count(),
    )
    timed(
        "volume_anomalies 10M events",
        lambda: volume_anomalies(ev).count(),
    )

    # --- dq fold vs one-shot: 4 batches, planted violations
    from distributed_vector_database_spark.operators.evaluation import (
        data_quality_report,
        expect_columns,
        expect_unique,
    )
    from distributed_vector_database_spark.streaming.expectations import (
        build_dq_fold,
        read_dq_report,
    )

    rows = ev.select(
        # key space folded to plant cross-batch duplicates
        F.pmod(F.col("event_id"), 9_999_999).alias("k"),
        F.col("value").alias("v"),
    )
    rules = {"v_nonneg": F.col("v") >= 0}

    def _dq():
        d = tempfile.mkdtemp(prefix="dvdb_dq_smoke_")
        fold = build_dq_fold(d, rules, unique_cols=["k"])
        for i in range(4):
            fold(rows.filter(F.pmod(F.col("k"), 4) == i), i)
        got = {
            r.rule: r.violations
            for r in read_dq_report(
                spark, d, unique_cols=["k"], unique_rule="k_unique"
            ).collect()
        }
        expect = {
            r.rule: r.violations
            for r in data_quality_report(
                [
                    expect_columns(rows, rules),
                    expect_unique(rows, ["k"], "k_unique"),
                ]
            ).collect()
        }
        assert got == expect, (got, expect)
        return f"fold==oneshot {got}"

    timed("dq fold 10M rows x 4 batches", _dq)
    ev.unpersist()

    # --- PCA at 1M x 64-d
    from distributed_vector_database_spark.operators.pca import (
        pca_fit,
        pca_project,
    )

    emb = spark.range(1_000_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (
                F.pmod(F.xxhash64("id", i), 1000).cast("double") / 1000.0
            )
            * (1.0 + i.cast("double") / 8.0),
        ).alias("embedding"),
    )
    emb.cache().count()

    def _pca():
        model = pca_fit(emb, k=8)
        n = pca_project(emb, model, whiten=True).count()
        top = model["explained"][0]
        return f"projected={n} top_explained={top:.3f}"

    timed("pca_fit+whiten 1M x 64-d", _pca)
    emb.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
