"""Scale smoke for the round-6 analytics additions: SCD2 history,
gap-fill LOCF, the time-RANGE rolling window, and bigram-LM
perplexity scoring — synthetic JVM-generated inputs at 100-1000x the
fixture scale, per-op wall times for SCALE.md.

Checks are semantic, not just timing: SCD2 row counts reconcile with
PUT counts, the gap-fill grid is exactly series x span with gaps
carried forward (non-null LOCF), the rolling window returns one row
per event, and LM scores cover every >=2-token doc with finite values.

Usage: python tools/roundops_smoke.py [small|big]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.changelog import scd2_history
from distributed_vector_database_spark.operators.relational import (
    gapfill_locf,
    user_rolling_window,
)
from distributed_vector_database_spark.operators.textops import (
    bigram_lm_counts,
    lm_cross_entropy,
)
from distributed_vector_database_spark.session import get_spark
from tools.scale_smoke import synth_docs

SIZES = {
    "small": dict(n_log=1_000_000, n_ev=1_000_000, n_doc=200_000),
    "big": dict(n_log=10_000_000, n_ev=10_000_000, n_doc=2_000_000),
}


def synth_log(spark, n, n_keys):
    """Change-log: ~10% DELETEs, integer ts with hash jitter, seq = id."""
    return spark.range(n).select(
        F.pmod(F.xxhash64("id", F.lit(1)), n_keys).alias("key"),
        F.when(F.pmod(F.xxhash64("id", F.lit(2)), 10) == 0, "DELETE")
        .otherwise("PUT")
        .alias("op"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 1000) / 10.0).alias("value"),
        F.pmod(F.xxhash64("id", F.lit(4)), 10_000_000).alias("ts"),
        F.col("id").alias("seq"),
    )


def synth_events(spark, n, n_series, n_users, gap_pct=20):
    """Events over one year of hourly buckets; `gap_pct`% of the
    (series, hour) lattice is carved out deterministically so the
    gap-fill has real multi-bucket holes to carry values across."""
    hours_in_year = 8760
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id", F.lit(1)), n_series).alias("series_id"),
        F.pmod(F.xxhash64("id", F.lit(2)), n_users).alias("user_id"),
        F.pmod(F.xxhash64("id", F.lit(3)), hours_in_year).alias("hour_off"),
        (F.pmod(F.xxhash64("id", F.lit(4)), 1000) / 10.0).alias("value"),
    )
    # carve gaps: drop events whose (series, hour) cell hashes low
    ev = ev.filter(
        F.pmod(F.xxhash64("series_id", "hour_off", F.lit(7)), 100) >= gap_pct
    )
    return ev.select(
        "event_id",
        F.concat(F.lit("s"), F.col("series_id")).alias("event_type"),
        "user_id",
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(hours=F.col("hour_off"))
            + F.make_interval(mins=F.pmod("event_id", 60))
        ).alias("ts"),
        "value",
    )


def main() -> None:
    size = SIZES[sys.argv[1] if len(sys.argv) > 1 else "big"]
    spark = get_spark(app_name="roundops-smoke")

    # --- SCD2 history over a 10M-op log -------------------------------
    log = synth_log(spark, size["n_log"], n_keys=size["n_log"] // 10)
    t0 = time.time()
    h = scd2_history(log, seq_col="seq", value_cols=["value"])
    n_versions, n_current = h.agg(
        F.count(F.lit(1)), F.sum(F.col("is_current").cast("long"))
    ).first()
    t_scd2 = time.time() - t0
    n_puts = log.filter(F.col("op") == "PUT").count()
    assert n_versions == n_puts, (n_versions, n_puts)
    print(
        f"scd2_history: {size['n_log']:,} ops -> {n_versions:,} versions "
        f"({n_current:,} current) in {t_scd2:.1f}s"
    )

    # --- gap-fill LOCF over 10M events / 1000 series ------------------
    ev = synth_events(spark, size["n_ev"], n_series=1000, n_users=1_000_000)
    ev.cache().count()
    t0 = time.time()
    g = gapfill_locf(ev, series_col="event_type", step="hour")
    row = g.agg(
        F.count(F.lit(1)).alias("grid"),
        F.sum(F.col("is_gap").cast("long")).alias("gaps"),
        F.sum(F.col("sum_value_locf").isNull().cast("long")).alias("null_locf"),
    ).first()
    t_gap = time.time() - t0
    assert row["gaps"] > 0 and row["null_locf"] == 0, row
    print(
        f"gapfill_locf: {size['n_ev']:,} events -> {row['grid']:,} grid rows "
        f"({row['gaps']:,} gaps filled, 0 null LOCF) in {t_gap:.1f}s"
    )

    # --- trailing-7d RANGE window over the same events ----------------
    t0 = time.time()
    r = user_rolling_window(ev, days=7)
    n_rows, max_n = r.agg(F.count(F.lit(1)), F.max("n_7d")).first()
    t_roll = time.time() - t0
    assert n_rows == ev.count(), (n_rows,)
    print(
        f"user_rolling_window: {n_rows:,} events / 1M users, "
        f"max 7d frame {max_n} rows, in {t_roll:.1f}s"
    )
    ev.unpersist()

    # --- bigram-LM train + score over 2M docs -------------------------
    docs = synth_docs(spark, size["n_doc"], vocab_size=1000, doc_len=56)
    docs.cache().count()
    t0 = time.time()
    uni, bi, vocab = bigram_lm_counts(docs)
    bi.cache()
    n_bigrams = bi.count()
    t_train = time.time() - t0
    t0 = time.time()
    sc = lm_cross_entropy(docs, uni, bi, vocab, k=0.5)
    n_scored, n_bad = sc.agg(
        F.count(F.lit(1)),
        F.sum((F.isnan("cross_entropy") | F.col("cross_entropy").isNull()).cast("long")),
    ).first()
    t_score = time.time() - t0
    assert n_scored == size["n_doc"] and n_bad == 0, (n_scored, n_bad)
    print(
        f"bigram_lm: {size['n_doc']:,} docs -> {n_bigrams:,} distinct bigrams "
        f"trained in {t_train:.1f}s, scored in {t_score:.1f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
