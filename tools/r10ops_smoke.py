"""Scale smokes for the round-10 operators, JVM-synthesized inputs
(pattern: tools/r8ops_smoke.py):

- heavy_hitters: 10M rows with a power-law key column (hot keys
  planted on top of a 1M-distinct-key background) — the candidate
  pass must emit a tiny superset and the verify must return EXACTLY
  the planted + background keys over the threshold
- weighted_sample_grouped: 10M rows, 20 groups, 1k per group — the
  selection shuffle carries 3 columns, winners hydrate via semi join
- gopher_rules: 2M docs — one zero-shuffle codegen map pass
- zorder_write + rowgroup_prune_fraction: 5M rows, uncorrelated 2-d —
  pruning must hold on BOTH columns at 50x the unit-test scale
- compact(until_ts): 10M-op change-log, mid-stream cutoff — the
  time-travel read costs what one replay costs

Usage: python tools/r10ops_smoke.py
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from distributed_vector_database_spark.session import get_spark
from scale_smoke import synth_docs


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.1f}s {out}")


def main() -> None:
    spark = get_spark(app_name="dvds-r10ops-smoke")

    # --- heavy_hitters: 10M rows, 1M-distinct background (each key
    # ~10 rows) + 20 planted hot keys at ~50k rows each
    from distributed_vector_database_spark.operators.skew import heavy_hitters

    n, hot_share = 10_000_000, 10  # ~10% of rows land on hot keys
    rows = spark.range(n).select(
        F.when(
            F.pmod(F.col("id"), F.lit(hot_share)) == 0,
            # 20 distinct hot keys at ~n/(hot_share*20) rows each
            F.concat(
                F.lit("hot"),
                F.pmod((F.col("id") / hot_share).cast("long"), F.lit(20)),
            ),
        )
        .otherwise(F.concat(F.lit("k"), F.pmod(F.xxhash64("id"), F.lit(1_000_000))))
        .alias("k")
    ).localCheckpoint()

    def _hh():
        got = heavy_hitters(rows, "k", min_count=10_000).collect()
        hot = [r for r in got if r["k"].startswith("hot")]
        return f"{len(got)} keys >= 10k (hot planted: {len(hot)}/20)"

    timed("heavy_hitters 10M rows / ~1M distinct", _hh)

    # --- weighted_sample_grouped: 10M rows, 20 groups, 1000/group
    from distributed_vector_database_spark.operators.sampling import (
        weighted_sample_grouped,
    )

    g = spark.range(10_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), F.pmod(F.col("id"), F.lit(20))).alias("grp"),
        (1.0 + F.pmod(F.xxhash64("id"), 1000).cast("double")).alias("w"),
    ).localCheckpoint()

    def _ws():
        out = weighted_sample_grouped(
            g, "w", n_per_group=1000, group_col="grp", key_col="doc_id",
            seed=3,
        )
        per = out.groupBy("grp").count().collect()
        return f"{sum(r['count'] for r in per)} rows, {len(per)} groups, all==1000: {all(r['count'] == 1000 for r in per)}"

    timed("weighted_sample_grouped 10M x 20 groups", _ws)

    # --- gopher_rules: 2M docs, one map pass
    from distributed_vector_database_spark.operators.textops import gopher_rules

    docs = synth_docs(spark, 2_000_000).localCheckpoint()

    def _gr():
        out = gopher_rules(docs, min_words=30)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("keep").cast("long")).alias("kept"),
        ).first()
        # synth vocab has no English stopwords, so keep==0 by
        # construction — this leg measures the map-pass COST only
        return f"{agg['n']} docs, {agg['kept']} keep (synthetic vocab)"

    timed("gopher_rules 2M docs", _gr)

    # --- zorder at 5M: pruning holds on BOTH columns
    from distributed_vector_database_spark.operators.layout import (
        rowgroup_prune_fraction,
        zorder_write,
    )

    grid = spark.range(5_000_000).select(
        (F.col("id") % 3170).cast("double").alias("x"),
        (F.pmod(F.col("id") * 7919, 3110)).cast("double").alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = tempfile.mkdtemp(prefix="dvdb_zorder_") + "/z"

    def _zw():
        zorder_write(grid, zpath, "x", "y", partitions=64)
        fx = rowgroup_prune_fraction(zpath, "x", 100.0, 200.0)
        fy = rowgroup_prune_fraction(zpath, "y", 100.0, 200.0)
        return f"prune x={fx:.3f} y={fy:.3f} (selective range on either column)"

    timed("zorder_write 5M + footer prune check", _zw)

    # --- time travel: 10M-op log, cutoff at the midpoint
    from distributed_vector_database_spark.operators.changelog import compact

    log = spark.range(10_000_000).select(
        F.pmod(F.col("id"), F.lit(1_000_000)).alias("key"),
        F.when(F.pmod(F.col("id"), F.lit(17)) == 0, "DELETE")
        .otherwise("PUT")
        .alias("op"),
        F.col("id").cast("double").alias("value"),
        F.col("id").alias("ts"),
        F.col("id").alias("seq"),
    ).localCheckpoint()

    def _asof():
        n_asof = compact(log, seq_col="seq", until_ts=5_000_000).count()
        n_now = compact(log, seq_col="seq").count()
        return f"as-of-mid state {n_asof} keys, current {n_now} keys"

    timed("compact(until_ts) 10M-op log", _asof)

    spark.stop()


if __name__ == "__main__":
    main()
