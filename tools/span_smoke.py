"""Scale smoke for duplicate-span dedup: 2M synthetic ~40-token docs,
every 10th doc carrying a shared 12-token boilerplate tail. Ground
truth: the 5 strict 8-token windows inside the boilerplate are
corpus-duplicated, so every planted doc except the globally-first
(canonical) one loses AT LEAST those 12 tokens; windows bridging the
last 1-2 base tokens into the boilerplate also collide across planted
docs (single tokens come from a 1000-word vocabulary), adding at most
7 more stripped base tokens per planted doc. Unplanted docs must be
untouched — their 8-grams carry >= 6 hash-mixed tokens (10^18 space).

Usage: python tools/span_smoke.py [n_docs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from distributed_vector_database_spark.operators.dedup import (
    duplicate_span_report,
    remove_duplicate_spans,
    remove_duplicate_spans_incremental,
    span_gram_state,
)
from distributed_vector_database_spark.session import get_spark
from tools.scale_smoke import synth_docs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    every = 10
    spark = get_spark(app_name="span-smoke")

    boiler = " ".join(f"boiler{i}" for i in range(12))
    docs = (
        synth_docs(spark, n)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % every == 0,
                F.concat(F.col("text"), F.lit(" " + boiler)),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .persist()
    )
    docs.count()
    planted = n // every

    t0 = time.time()
    rep = (
        duplicate_span_report(docs, k=8)
        .agg(
            F.sum("n_windows").alias("wins"),
            F.sum("n_dup_windows").alias("dups"),
            F.count(F.when(F.col("n_dup_windows") > 0, 1)).alias("docs_hit"),
        )
        .collect()[0]
    )
    t_rep = time.time() - t0
    print(
        f"report: {n} docs, {rep['wins']} windows, {rep['dups']} duplicated, "
        f"{rep['docs_hit']} docs hit (planted {planted}) in {t_rep:.1f}s"
    )

    t0 = time.time()
    rem = (
        remove_duplicate_spans(docs, k=8)
        .agg(
            F.sum("n_removed_tokens").alias("removed"),
            F.count(F.when(F.col("n_removed_tokens") > 0, 1)).alias("touched"),
            F.count(
                F.when(
                    (F.col("n_removed_tokens") > 0) & (F.col("doc_id") % every != 0),
                    1,
                )
            ).alias("false_pos"),
        )
        .collect()[0]
    )
    t_rem = time.time() - t0
    lo, hi = (planted - 1) * 12, (planted - 1) * 12 + planted * 7
    print(
        f"remove: {rem['removed']} tokens stripped from {rem['touched']} docs "
        f"(planted floor {lo}, bridge ceiling {hi}; "
        f"{rem['false_pos']} unplanted docs touched) in {t_rem:.1f}s"
    )
    assert lo <= rem["removed"] <= hi, (rem["removed"], lo, hi)
    assert rem["touched"] >= planted - 1
    assert rem["false_pos"] == 0, rem["false_pos"]

    # continual ingest: a 50k batch (half of it re-posting corpus docs'
    # text verbatim) cleaned against the persisted gram state — the
    # corpus is never re-windowed
    state = span_gram_state(docs, k=8).persist()
    state.count()
    nb = 50_000
    reposts = (
        spark.range(nb // 2)
        .select((F.col("id") * 7).alias("doc_id"))
        .join(docs, "doc_id")
        .select((F.col("doc_id") + 2 * n).alias("doc_id"), "text")
    )
    from tools.scale_smoke import synth_docs as _sd

    fresh = _sd(spark, nb // 2, start=3 * n)  # novel ids -> novel texts
    batch = reposts.unionByName(fresh).persist()
    batch.count()
    t0 = time.time()
    cleaned, delta = remove_duplicate_spans_incremental(batch, state, k=8)
    got = cleaned.agg(
        F.count(F.when(F.col("n_removed_tokens") > 0, 1)).alias("hit"),
        F.count(
            F.when(
                (F.col("n_removed_tokens") > 0) & (F.col("doc_id") >= 3 * n), 1
            )
        ).alias("fresh_hit"),
    ).collect()[0]
    t_inc = time.time() - t0
    print(
        f"incremental: {nb} batch vs {n}-doc state -> {got['hit']} docs "
        f"stripped ({nb // 2} reposted; {got['fresh_hit']} fresh hit) "
        f"in {t_inc:.1f}s"
    )
    assert got["hit"] >= nb // 2  # every reposted doc fully flagged
    assert got["fresh_hit"] <= nb // 200  # fresh docs: bridge-grade noise only


if __name__ == "__main__":
    main()
